"""Routed-search stretch evidence: at 600k pages the per-query posting
I/O finally exceeds the local job floor, so ES-style document routing
(wand.topk(routing=...) opening ONE shard dir instead of n_shards)
becomes measurable as wall-clock, not just as the physical
shard-deletion proof in tests/test_routing.py.

Interleaved unrouted/routed pairs (min over passes) per the repo's
bench-noise discipline; one JSON line at the end.

Usage: python bench/routed_stretch.py [--pages 600000] [--cpus 32]
       [--passes 3]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=600000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bench import build_pipeline
    from es_loaders_spark.build import build_index
    from es_loaders_spark.session import get_spark
    from es_loaders_spark.wand import topk, warm_index

    spark = get_spark("routed-stretch", cores=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    n_shards = max(args.cpus, args.pages // 3000)
    out: dict = {"bench": "routed_stretch", "pages": args.pages,
                 "cpus": args.cpus, "n_shards": n_shards}

    # one normal pipeline build to materialize the ingest table, then a
    # ROUTED index over the same corpus: 200 synthetic routing keys
    # (hash-spread across shards like customer ids / crawl hosts would)
    base = tempfile.mkdtemp(prefix="rs_base_")
    shutil.rmtree(base, ignore_errors=True)
    build_pipeline(spark, args.pages, base, n_shards=n_shards)
    docs = spark.read.parquet(os.path.join(base, "ingest")).select(
        "doc_id", "text",
        F.format_string("k%03d", F.pmod(F.col("doc_id"), F.lit(200)))
        .alias("rkey"),
    )
    routed = tempfile.mkdtemp(prefix="rs_routed_")
    shutil.rmtree(routed, ignore_errors=True)
    t0 = time.time()
    build_index(spark, docs, routed, n_shards=n_shards, positions=False,
                routing_field="rkey")
    out["routed_build_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    warm_index(spark, routed)
    out["warm_sec"] = round(time.time() - t0, 2)

    queries = ["web page link crawl", "hash join group filter",
               "spark index crawl data"]
    # untimed warmup of EVERY query on BOTH paths: the first run of a
    # query pays its cold posting-file reads and warms the OS page cache
    # for whoever runs next — warming only one query would let the first
    # timed unrouted runs absorb the cold I/O and gift their routed
    # twins a warm cache (review r6c)
    for q in queries:
        topk(spark, routed, q, k=20).collect()
        topk(spark, routed, q, k=20, routing="k007").collect()

    unrouted, routed_t = [], []
    for p in range(args.passes):
        for qi, q in enumerate(queries):
            # alternate which path runs first within each pair, so any
            # residual ordering effect cancels across the sample set
            order = ((None, unrouted), ("k007", routed_t))
            if (p + qi) % 2:
                order = order[::-1]
            for rt, sink in order:
                t0 = time.time()
                topk(spark, routed, q, k=20, routing=rt).collect()
                sink.append(time.time() - t0)
    out["unrouted_single_min_sec"] = round(min(unrouted), 3)
    out["routed_single_min_sec"] = round(min(routed_t), 3)
    out["unrouted_single_avg_sec"] = round(sum(unrouted) / len(unrouted), 3)
    out["routed_single_avg_sec"] = round(sum(routed_t) / len(routed_t), 3)
    out["speedup_min"] = round(
        out["unrouted_single_min_sec"] / max(out["routed_single_min_sec"], 1e-9), 2
    )
    print(json.dumps(out), flush=True)
    for d in (base, routed):
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
