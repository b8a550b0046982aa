"""SparkSession factory tuned for this engine.

Local mode stands in for a multi-executor cluster: partitioning/shuffle
decisions are made as if there were 1000 executors (AQE, skew-join,
broadcast thresholds), and the same builder works under spark-submit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _auto_task_cpus(n_cores: int) -> str:
    """Default task.cpus: cap concurrent kernels at 16 per (local) box."""
    env = os.environ.get("SPARK_GRAFT_TASK_CPUS", "auto")
    if env != "auto":
        return env
    return "2" if n_cores >= 24 else "1"


def get_spark(
    app_name: str = "es-loaders-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    ``cores`` pins ``local[N]`` (used by the scaling benchmark at
    local[8] vs local[32]); default is ``local[*]``. ``master``
    overrides entirely — e.g. ``local-cluster[4,2,3072]`` spawns REAL
    executor JVMs (serialized task closures, real broadcasts, no
    shared-heap shortcuts), the closest a single box gets to N separate
    machines; ``cores`` then only sizes shuffle partitions.
    """
    if master is not None:
        n = cores or (os.cpu_count() or 8)
    elif cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * n, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # batch size trades Arrow throughput against per-worker peak memory
        # (N workers × batch bytes live simultaneously) — overridable for
        # wide-row workloads via env (bench/profile sweeps)
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "65536"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # sandbox corpora are small (MBs, not the 128MB-file world this is
        # designed for): split scans finer so a 100-file/200MB table still
        # fans out across all cores instead of coalescing into 2 tasks
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        # local mode = driver IS the executor: size the heap like one.
        # 8g caused GC collapse (3x slowdown) at ~1M-doc builds on this box
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # memory-bandwidth-bound Arrow-UDF kernels (posting build: lexsort/
        # factorize over token arrays) saturate ONE box's memory bus at
        # ~16 concurrent workers — beyond that, throughput REGRESSES
        # (measured: stage-C minima 20.7s @8 / 27.5s @16 / 38.0s @32 conc,
        # matching the box's numpy-sort 8→32 proc efficiency of 0.32;
        # BENCH.md round 2). task.cpus=2 halves concurrency on wide local
        # masters — the standard knob for bandwidth-bound tasks (same idea
        # as for MKL-threaded UDFs). On a real multi-executor cluster each
        # executor brings its own memory bus, so executors scale freely and
        # this stays per-executor; set SPARK_GRAFT_TASK_CPUS=1 to disable.
        .config("spark.task.cpus", _auto_task_cpus(n))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if master.startswith("local-cluster"):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        builder = (
            builder
            # executor JVMs spawn their own Python workers — they must
            # find the package without the driver's sys.path mutation
            .config("spark.executorEnv.PYTHONPATH", repo)
            # executor heap must fit inside the worker's memory budget
            # (the [n,cores,MEM] triple); leave headroom for overhead
            .config(
                "spark.executor.memory",
                os.environ.get("SPARK_EXECUTOR_MEM", "2g"),
            )
        )
    return builder.getOrCreate()
