#!/usr/bin/env python
"""Scaling-efficiency evidence: same job at N and 4N cores (north rule).

The north rule's two-cluster-size criterion (≥0.8 throughput scaling
efficiency from N to 4N executors) is evidenced in-sandbox by running
the identical build+query job at local[8] and local[32] on the same
input, each in a fresh JVM/process. Writes/updates BENCH.md.

Usage:
    python bench/scaling.py            # orchestrates both runs
    python bench/scaling.py --cores 8  # one measured run (child mode)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PAGES = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", "40000"))
# shards scale with corpus size (≈3k docs/shard), as they would at 100 TB —
# oversized per-shard pandas groups thrash worker memory
N_SHARDS = int(os.environ.get("SPARK_GRAFT_SCALING_SHARDS", str(max(64, N_PAGES // 3000))))


def run_once(cores: int, master: str | None = None) -> dict:
    import shutil
    import tempfile

    from bench import build_pipeline
    from es_loaders_spark.session import get_spark
    from es_loaders_spark.wand import topk_batch

    spark = get_spark(f"scaling-{cores}", cores=cores, master=master)
    spark.sparkContext.setLogLevel("ERROR")
    idx_dir = tempfile.mkdtemp(prefix=f"scale_idx_{cores}_")
    shutil.rmtree(idx_dir, ignore_errors=True)

    # untimed warmup build (same discipline as bench.py): JIT/codegen
    # compilation is a per-JVM constant that otherwise inflates BOTH
    # sides of the N-vs-4N comparison and compresses the measured ratio
    warm_dir = tempfile.mkdtemp(prefix=f"scale_warm_{cores}_")
    shutil.rmtree(warm_dir, ignore_errors=True)
    build_pipeline(spark, 3000, warm_dir, n_shards=8)
    shutil.rmtree(warm_dir, ignore_errors=True)

    t0 = time.time()
    build_pipeline(spark, N_PAGES, idx_dir, n_shards=N_SHARDS)
    t_build = time.time() - t0

    batch = {f"q{i}": f"spark index crawl w{i % 900:04d} the data" for i in range(100)}
    t0 = time.time()
    rows = topk_batch(spark, idx_dir, batch, k=20)
    n_rows = rows.count()
    t_query = time.time() - t0

    # determinism across cluster sizes: fingerprint of the top-k results
    sample = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in rows.filter(rows.rank <= 5).collect()
    )
    import hashlib

    fp = hashlib.md5(json.dumps(sample).encode()).hexdigest()
    shutil.rmtree(idx_dir, ignore_errors=True)
    return {
        "cores": cores,
        "n_pages": N_PAGES,
        "build_sec": round(t_build, 2),
        "build_docs_per_sec": round(N_PAGES / t_build, 2),
        "query_batch100_sec": round(t_query, 2),
        "query_per_sec": round(100 / t_query, 2),
        "topk_rows": n_rows,
        "result_fingerprint": fp,
        "master": master or f"local[{cores}]",
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument(
        "--master", default=None,
        help="master override, e.g. local-cluster[4,2,3072] for REAL "
        "executor JVMs (serialized closures, real broadcasts)",
    )
    args = ap.parse_args()
    if args.cores:
        print(json.dumps(run_once(args.cores, master=args.master)))
        return

    # interleave A/B/A/B and take per-level minima: the sandbox VM shows
    # 3x run-to-run noise (co-tenant steal + kernel memory overhead), so
    # single-shot comparisons are meaningless
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2"))
    pair = [int(c) for c in os.environ.get("SPARK_GRAFT_SCALING_CORES", "8,32").split(",")]
    lo, hi = pair[0], pair[-1]
    runs: dict[int, list[dict]] = {lo: [], hi: []}
    for _ in range(repeats):
        for cores in (lo, hi):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cores", str(cores)],
                capture_output=True,
                text=True,
                cwd=REPO,
                env={**os.environ, "PYTHONPATH": REPO},
                timeout=1800,
            )
            line = out.stdout.strip().splitlines()[-1]
            r = json.loads(line)
            runs[cores].append(r)
            print(f"local[{cores}]: {r}", file=sys.stderr)

    def best(rs: list[dict]) -> dict:
        b = dict(min(rs, key=lambda r: r["build_sec"]))
        b["build_sec_runs"] = [r["build_sec"] for r in rs]
        b["query_batch100_sec"] = min(r["query_batch100_sec"] for r in rs)
        b["query_sec_runs"] = [r["query_batch100_sec"] for r in rs]
        b["build_docs_per_sec"] = round(b["n_pages"] / b["build_sec"], 2)
        b["query_per_sec"] = round(100 / b["query_batch100_sec"], 2)
        return b

    r8, r32 = best(runs[lo]), best(runs[hi])
    factor = hi / lo
    assert all(
        r["result_fingerprint"] == r8["result_fingerprint"]
        for rs in runs.values()
        for r in rs
    ), "top-k results differ across runs/parallelism"
    eff_build = round((r8["build_sec"] / r32["build_sec"]) / factor, 3)
    eff_query = round((r8["query_batch100_sec"] / r32["query_batch100_sec"]) / factor, 3)
    identical = r8["result_fingerprint"] == r32["result_fingerprint"]
    summary = {
        "n_pages": N_PAGES,
        f"local{lo}": r8,
        f"local{hi}": r32,
        "scaling_efficiency_build": eff_build,
        "scaling_efficiency_query_batch": eff_query,
        "results_identical_across_parallelism": identical,
    }
    print(json.dumps(summary))

    md = f"""# BENCH — measured performance + scaling evidence

Generated by `python bench/scaling.py` (same job, two parallelism levels,
fresh JVM each — the in-sandbox stand-in for N vs 4N executors per the
north rule).

## Workload

Full north-star pipeline on {N_PAGES:,} synthesized Common-Crawl-style
pages: extract(html) → deterministic docIDs → sharded delta+varint
posting build ({N_SHARDS} shards) → 100-query BM25 batch (block-max WAND, k=20).

## Results (best of {len(r8['build_sec_runs'])} interleaved runs per level)

| metric | local[{lo}] | local[{hi}] | scaling efficiency (T{lo}/T{hi})/{factor:g} |
|---|---|---|---|
| index build (sec) | {r8['build_sec']} | {r32['build_sec']} | **{eff_build}** |
| index build (docs/sec) | {r8['build_docs_per_sec']} | {r32['build_docs_per_sec']} | |
| 100-query batch (sec) | {r8['query_batch100_sec']} | {r32['query_batch100_sec']} | **{eff_query}** |
| queries/sec (batched) | {r8['query_per_sec']} | {r32['query_per_sec']} | |

All build runs: local[{lo}] {r8['build_sec_runs']}, local[{hi}] {r32['build_sec_runs']} sec.
All query runs: local[{lo}] {r8['query_sec_runs']}, local[{hi}] {r32['query_sec_runs']} sec.

Top-k results identical across ALL runs and parallelism levels: **{identical}**
(md5 of all (query, rank, doc_id, score) tuples at k≤5:
`{r8['result_fingerprint']}`) — the determinism half of the north rule.

## Sandbox hardware ceiling (why the 0.8 target cannot be evidenced here)

The target is ≥ 0.8 efficiency from N to 4N **executors** (separate
machines). This sandbox is one Firecracker VM with 32 vCPUs; measured
with an embarrassingly-parallel pure-numpy microbenchmark (no Spark):

| procs | wall for fixed per-proc work | effective speedup vs 1 proc |
|---|---|---|
| 1 | 1.77 s | 1.0× |
| 8 | 2.61 s | 5.4× |
| 32 | 4.40 s | 12.9× |

i.e. the BOX delivers at most 12.9/5.4 ≈ 2.4× going 8→32 threads
(efficiency ceiling 0.6), with 3× run-to-run variance (the same 8-proc
benchmark measured 2.61 s and 7.34 s minutes apart). /proc/stat during a
16-way spin shows 28% kernel time and 5% steal. No partitioning strategy
can scale past the hardware it runs on.

Architectural scaling evidence (what WOULD scale on real executors):
- every stage's task count grows with data/shards, not with any serial
  structure: synthesis (metadata fan-out), posting build (one task per
  shard), merge (one task per term×salt group, Zipf head salted), query
  (one task per shard + TakeOrdered);
- driver-side work is O(n_shards) bookkeeping — no data rows ever
  collect to the driver;
- outputs are bit-identical at every parallelism level (fingerprint
  above), so correctness is parallelism-independent.

See BASELINE.md for the reference's knobs; the reference publishes no
throughput numbers.
"""
    out_md = os.path.join(REPO, "bench", "scaling_latest.md")
    with open(out_md, "w") as f:
        f.write(md)
    print(f"wrote {out_md} (curated cross-run evidence lives in BENCH.md)", file=sys.stderr)


if __name__ == "__main__":
    main()
