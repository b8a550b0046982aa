#!/usr/bin/env python
"""Dump .explain('formatted') for the round-7 optimization targets.

Usage: python bench/plans_r07.py <suffix> [outdir]
  suffix: "before" (run from the round-start worktree) or "after" (HEAD)

Writes plans/r07/<query>_<suffix>.txt for every bench-suite query plus
the dedup-store sub-relations the r7 changes touched. Plans only — no
query is executed (cheap; safe to run next to other work).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "after"
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(REPO), "repo", "plans", "r07"
)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    from pyspark.sql import functions as F

    from es_loaders_spark.queries import EXTRA_QUERIES, QUERIES
    from es_loaders_spark.session import get_spark

    spark = get_spark("plans-r07", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")

    suite = [
        "groupby_sum_q1", "histogram2d_mode", "join_broadcast_dim",
        "postings", "quality_score", "dedup_exact_groups",
        "minhash_lsh_dups", "minhash_lsh_dups_fast", "ann_bruteforce",
        "ann_ivf", "dsl_query_string", "dsl_pipeline_aggs", "dsl_percolate",
    ]
    for name in suite:
        fn = QUERIES.get(name) or EXTRA_QUERIES[name]
        try:
            txt = plan_of(fn(spark, SF_DIR))
        except Exception as e:  # plan-time failure is itself the record
            txt = f"PLAN FAILED: {e!r}\n"
        with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as f:
            f.write(txt)
        print("dumped", name)

    # dedup-store sub-relations (the r7-touched shapes): the signature
    # relation (join-free in r7) and an append's member lookup
    import shutil
    import tempfile

    from es_loaders_spark.dedup_store import (
        _signature_relation, append_dedup_store, build_dedup_store,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rel = _signature_relation(
        docs.select("doc_id", "text"), 3, 32, 8, 42
    )
    with open(os.path.join(OUT, f"dedup_store_signature_relation_{SUFFIX}.txt"), "w") as f:
        f.write(plan_of(rel))
    print("dumped dedup_store_signature_relation")

    sd = tempfile.mkdtemp(prefix="plans_dstore_")
    shutil.rmtree(sd, ignore_errors=True)
    n_docs = docs.count()
    cut = int(n_docs * 0.9)
    build_dedup_store(spark, docs.filter(F.col("doc_id") < cut), sd, threshold=0.9)
    pairs = append_dedup_store(spark, docs.filter(F.col("doc_id") >= cut), sd)
    with open(os.path.join(OUT, f"dedup_incremental_append_{SUFFIX}.txt"), "w") as f:
        f.write(plan_of(pairs))
    shutil.rmtree(sd, ignore_errors=True)
    print("dumped dedup_incremental_append")

    # the web-shaped query_string boolean tree on the SCAN side (the
    # dsl_query_string_web_scan bench row's plan shape, on documents)
    from es_loaders_spark import dsl

    wq = {"query": {"query_string": {
        "query": "spark AND (crawl* OR index) page web", "serve": "scan"}},
        "size": 15}
    with open(os.path.join(OUT, f"dsl_query_string_web_scan_{SUFFIX}.txt"), "w") as f:
        f.write(plan_of(dsl.search(spark, docs, wq)))
    print("dumped dsl_query_string_web_scan")

    # index-served boolean tree (the dsl_query_string_indexed bench row)
    from es_loaders_spark.build import build_index

    d3 = tempfile.mkdtemp(prefix="plans_qsidx_")
    shutil.rmtree(d3, ignore_errors=True)
    build_index(spark, docs, d3, n_shards=8, positions=True)
    qb = {"query": {"query_string": {
        "query": '(spark OR "key order")^2 AND batch* -lang:zh '
                 'source:src3^1.5 n_chars:[120 TO 400]',
        "serve": "index"}}, "size": 15}
    with open(os.path.join(OUT, f"dsl_query_string_indexed_{SUFFIX}.txt"), "w") as f:
        f.write(plan_of(dsl.search(spark, docs, qb, index_dir=d3)))
    shutil.rmtree(d3, ignore_errors=True)
    print("dumped dsl_query_string_indexed")


if __name__ == "__main__":
    main()
