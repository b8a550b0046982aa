"""Serving-throughput bench (VERDICT r05 next #8): QPS at 1/4/16
concurrent clients against ONE warm index — the way ES serving is
graded, complementing bench.py's single-query latency rows.

Clients are driver threads, each issuing independent ``wand.topk``
jobs; Spark schedules concurrent jobs across the shared local[cpus]
executor pool (on a real cluster: one driver per serving replica, same
shape). Queries are distinct per client/iteration so no result is
reused; the index's _WarmIndex structures are shared — exactly the
warm-replica serving posture.

Usage: python bench/serving_qps.py [--pages 60000] [--cpus 32]
       [--queries-per-client 12]
Prints one JSON line: {"qps": {"c1": .., "c4": .., "c16": ..}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=60000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries-per-client", type=int, default=12)
    ap.add_argument("--clients", type=int, nargs="*", default=[1, 4, 16])
    args = ap.parse_args()

    from bench import build_pipeline  # bench.py's north-star build

    from es_loaders_spark.session import get_spark
    from es_loaders_spark.wand import topk, warm_index

    spark = get_spark("serving-qps", cores=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    idx = tempfile.mkdtemp(prefix="qps_idx_")
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    build_pipeline(spark, args.pages, idx, n_shards=max(args.cpus, args.pages // 3000))
    build_s = time.time() - t0
    warm_index(spark, idx)

    base_qs = [
        "spark index crawl data",
        "the fast query merge page",
        "web page link crawl",
        "hash join group filter",
        "page web the scan spark",
    ]

    def client(cid: int, n: int, errs: list) -> None:
        try:
            for i in range(n):
                q = base_qs[(cid + i) % len(base_qs)] + f" w{(cid * 131 + i * 17) % 997:04d}"
                topk(spark, idx, q, k=10).collect()
        except Exception as e:  # surface, don't hang the join
            errs.append(f"client{cid}: {e}")

    # untimed warmup pass: first-query codegen/cache build out of the way
    client(99, 3, [])

    qps = {}
    for c in args.clients:
        errs: list = []
        threads = [
            threading.Thread(target=client, args=(cid, args.queries_per_client, errs))
            for cid in range(c)
        ]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0
        if errs:
            raise SystemExit("; ".join(errs))
        total = c * args.queries_per_client
        qps[f"c{c}"] = round(total / wall, 2)

    print(json.dumps({
        "bench": "serving_qps",
        "pages": args.pages,
        "cpus": args.cpus,
        "queries_per_client": args.queries_per_client,
        "build_sec": round(build_s, 2),
        "qps": qps,
    }))
    shutil.rmtree(idx, ignore_errors=True)


if __name__ == "__main__":
    main()
