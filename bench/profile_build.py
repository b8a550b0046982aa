#!/usr/bin/env python
"""Per-stage build profiler: times each pipeline stage at one core count.

Usage: python bench/profile_build.py --cores 8 --pages 200000
Prints one JSON line with per-stage wall times. Used to localize the
8→32 scaling bottleneck (VERDICT r01 item 5).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--pages", type=int, default=200000)
    ap.add_argument("--shards", type=int, default=None)
    ap.add_argument("--broadcast-ids", action="store_true")
    ap.add_argument("--pandas-extract", action="store_true")
    ap.add_argument("--jvm-case", action="store_true",
                    help="single-expression hybrid extraction (interpreted)")
    args = ap.parse_args()
    n_shards = args.shards or max(64, args.pages // 3000)

    from pyspark.sql import functions as F

    from es_loaders_spark.analyze import SPLIT_RE_JAVA
    from es_loaders_spark.build import assign_doc_ids, build_index
    from es_loaders_spark.corpus import synthesize_web_pages
    from es_loaders_spark.extract import extract_text, extracted_jvm
    from es_loaders_spark.session import get_spark

    spark = get_spark(f"profile-{args.cores}", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    t: dict[str, float] = {}
    idx_dir = tempfile.mkdtemp(prefix=f"prof_idx_{args.cores}_")
    shutil.rmtree(idx_dir, ignore_errors=True)
    os.makedirs(idx_dir)

    # A1: synthesize + materialize raw pages (isolates the generator)
    t0 = time.time()
    pages_dir = os.path.join(idx_dir, "pages")
    synthesize_web_pages(spark, args.pages).write.mode("overwrite").parquet(pages_dir)
    t["a1_synthesize"] = round(time.time() - t0, 2)
    pages = spark.read.parquet(pages_dir)

    # A2: docID assignment (url-only range shuffle + rank)
    t0 = time.time()
    ids = assign_doc_ids(pages.select("url"))
    ids.count()
    t["a2_assign_ids"] = round(time.time() - t0, 2)

    # A3: extract + dl + join ids + ingest write. Default = the
    # DataFrame-split path (with_extracted_text): table-backed input, so
    # the two pruned scans are cheap and the hot branch keeps whole-stage
    # codegen. --jvm-case uses the single-expression hybrid (HOF CASE →
    # interpreted eval for every row) for comparison.
    from es_loaders_spark.extract import with_extracted_text

    t0 = time.time()
    ids_j = F.broadcast(ids) if args.broadcast_ids else ids
    joined = pages.join(ids_j, "url")
    if args.pandas_extract:
        extracted = joined.withColumn("text", extract_text(F.col("html")))
    elif args.jvm_case:
        extracted = joined.withColumn("text", extracted_jvm(F.col("html")))
    else:
        extracted = with_extracted_text(joined)
    docs = (
        extracted
        .withColumn(
            "dl",
            F.size(
                F.filter(
                    F.split(F.lower(F.col("text")), SPLIT_RE_JAVA),
                    lambda x: x != F.lit(""),
                )
            ),
        )
        .select("doc_id", "text", "dl")
    )
    ingest_dir = os.path.join(idx_dir, "ingest")
    docs.write.mode("overwrite").parquet(ingest_dir)
    spark.catalog.clearCache()
    t["a3_extract_ingest"] = round(time.time() - t0, 2)

    # B: corpus stats (columnar dl agg)
    ingest = spark.read.parquet(ingest_dir)
    t0 = time.time()
    ingest.agg(F.count("*"), F.avg("dl"), F.max("doc_id")).collect()
    t["b_stats"] = round(time.time() - t0, 2)

    # C: sharded posting build (the heavy pass) + D: terms
    t0 = time.time()
    build_index(spark, ingest, idx_dir, n_shards=n_shards)
    t["cd_build_index"] = round(time.time() - t0, 2)

    t["total"] = round(sum(v for k, v in t.items() if k != "total"), 2)
    shutil.rmtree(idx_dir, ignore_errors=True)
    print(json.dumps({"cores": args.cores, "pages": args.pages,
                      "shards": n_shards, "stages": t}))


if __name__ == "__main__":
    main()
