#!/usr/bin/env python
"""Scaling A/B for the near-dup pipeline (north rule, dedup operator).

Runs ``dedup.lsh_verified_pairs`` — the production MinHash-LSH +
hashed-set-verify pipeline — on the SAME synthesized corpus at two
parallelism levels, each in a fresh JVM/process, interleaved to defeat
the box's co-tenant variance. Reports docs/sec at both levels and the
scaling efficiency ((t_small/t_big)/(cores_big/cores_small)).

Usage:
    python bench/scaling_dedup.py                 # orchestrate, 2 repeats
    python bench/scaling_dedup.py --cores 8       # one measured run
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

N_DOCS = int(os.environ.get("SPARK_GRAFT_DEDUP_SCALING_DOCS", "20000"))


def run_once(cores: int) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from es_loaders_spark import dedup
    from es_loaders_spark.corpus import synthesize_web_pages
    from es_loaders_spark.extract import with_extracted_text
    from es_loaders_spark.session import get_spark

    spark = get_spark(f"scaling-dedup-{cores}", cores=cores)
    pages = synthesize_web_pages(spark, N_DOCS, seed=11)
    docs = (
        with_extracted_text(pages)
        .withColumn("doc_id", F.row_number().over(Window.orderBy("url")) - 1)
        .select("doc_id", "text")
        .repartition(cores * 2)
        .persist()
    )
    n = docs.count()  # materialize input outside the timed window
    t0 = time.monotonic()
    n_pairs = dedup.lsh_verified_pairs(docs, threshold=0.8).count()
    dt = time.monotonic() - t0
    dedup.release_dedup_caches()
    spark.stop()
    return {"cores": cores, "docs": n, "pairs": n_pairs, "sec": round(dt, 2),
            "docs_per_sec": round(n / dt, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=0)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    if args.cores:
        print("RESULT " + json.dumps(run_once(args.cores)))
        return
    levels = tuple(
        int(c) for c in os.environ.get("SPARK_GRAFT_SCALING_LEVELS", "8,32").split(",")
    )
    results: dict[int, list[dict]] = {c: [] for c in levels}
    for _ in range(args.repeats):
        for cores in levels:  # interleaved: same window for both levels
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cores", str(cores)],
                capture_output=True, text=True, cwd=REPO,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
            if not line:
                print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
                raise SystemExit(f"child --cores {cores} failed")
            results[cores].append(json.loads(line[0][7:]))
            print(line[0])
    best = {c: max(r["docs_per_sec"] for r in rs) for c, rs in results.items()}
    pairs = {tuple(sorted({r["pairs"] for r in rs})) for rs in results.values()}
    lo, hi = min(levels), max(levels)
    eff = (best[hi] / best[lo]) / (hi / lo)
    print(json.dumps({"best_docs_per_sec": best, "pair_counts_identical":
                      len(pairs) == 1, f"efficiency_{lo}_to_{hi}": round(eff, 3)}))


if __name__ == "__main__":
    main()
