"""Stretch evidence run (VERDICT r05 next #9): one 600k-page build +
query / percolate / dedup-append samples — extends the measured
index-served crossover curve and the percolation flat-plan claim one
decade past the 60k headline, toward the 10^12 target shape.

Run in a quiet window; prints one JSON line per component so partial
runs still record evidence.

Usage: python bench/corpus600k.py [--pages 600000] [--cpus 32]
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
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from bench import build_pipeline

    from es_loaders_spark import dsl
    from es_loaders_spark.session import get_spark
    from es_loaders_spark.wand import topk, warm_index

    spark = get_spark("corpus600k", cores=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"bench": "corpus600k", "pages": args.pages, "cpus": args.cpus}

    idx = tempfile.mkdtemp(prefix="big_idx_")
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    build_pipeline(spark, args.pages, idx, n_shards=max(args.cpus, args.pages // 3000))
    out["index_build_sec"] = round(time.time() - t0, 2)
    out["docs_per_sec"] = round(args.pages / out["index_build_sec"], 1)
    print(json.dumps(out), flush=True)

    t0 = time.time()
    warm_index(spark, idx)
    out["warm_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    topk(spark, idx, "spark index crawl data", k=20).collect()
    out["bm25_wand_first_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    for q in ("web page link crawl", "hash join group filter",
              "the fast query merge page"):
        topk(spark, idx, q, k=20).collect()
    out["bm25_wand_avg_sec"] = round((time.time() - t0) / 3, 3)
    print(json.dumps(out), flush=True)

    # crossover curve, one decade up: same text-only boolean tree as
    # bench.py's web rows, indexed vs scan (auto picks indexed here)
    web_docs = spark.read.parquet(os.path.join(idx, "ingest"))
    wq = "spark AND (crawl* OR index) page web"
    for mode in ("auto", "scan"):
        t0 = time.time()
        dsl.search(
            spark, web_docs,
            {"query": {"query_string": {"query": wq, "serve": mode}},
             "size": 15},
            index_dir=idx,
        ).collect()
        out[f"query_string_{mode}_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out), flush=True)

    # percolation: 20k stored queries against one candidate doc drawn
    # from THIS corpus — warm second call is the serving number
    from es_loaders_spark.percolate import percolate, queries_from_bodies

    kinds = [
        lambda i: {"match": {"text": f"w{i % 997:04d} crawl"}},
        lambda i: {"term": {"text": f"w{i % 997:04d}"}},
        lambda i: {"match_phrase": {"text": "page web"}},
    ]
    rules = queries_from_bodies(
        spark, [(i, kinds[i % 3](i)) for i in range(20000)]
    ).cache()
    rules.count()
    doc = {"text": web_docs.select("text").first()[0]}
    percolate(rules, doc).count()  # cold (codegen)
    t0 = time.time()
    n_match = percolate(rules, doc).count()
    out["percolate_20k_warm_sec"] = round(time.time() - t0, 2)
    out["percolate_matches"] = int(n_match)
    print(json.dumps(out), flush=True)

    # incremental dedup append: 1% batch against a store over this corpus
    from pyspark.sql import functions as F

    from es_loaders_spark.dedup_store import append_dedup_store, build_dedup_store

    sd = tempfile.mkdtemp(prefix="big_store_")
    shutil.rmtree(sd, ignore_errors=True)
    cut_docs = web_docs.select("doc_id", "text")
    n = args.pages
    t0 = time.time()
    build_dedup_store(
        spark, cut_docs.filter(F.col("doc_id") < int(n * 0.99)), sd,
        threshold=0.9,
    )
    out["dedup_store_build_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    append_dedup_store(
        spark, cut_docs.filter(F.col("doc_id") >= int(n * 0.99)), sd
    ).write.format("noop").mode("overwrite").save()
    out["dedup_append_1pct_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out), flush=True)

    for d in (idx, sd):
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
