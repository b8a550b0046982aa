#!/usr/bin/env python
"""Isolated posting-build stage profiler (stage C of the build).

Builds the ingest table ONCE (cached on disk), then times build_index
alone in a fresh JVM at the given core count. Localizes the 8→32
anomaly away from synthesis/extraction.

Usage: python bench/profile_stage_c.py --cores 32 [--pages 200000]
       [--ingest-dir /tmp/ingest_200k]  (reused across runs if present)
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
    ap.add_argument("--ingest-dir", default=None)
    ap.add_argument("--shards", type=int, default=None)
    args = ap.parse_args()
    n_shards = args.shards or max(64, args.pages // 3000)
    ingest_dir = args.ingest_dir or f"/tmp/ingest_{args.pages}"

    from pyspark.sql import functions as F

    from es_loaders_spark.analyze import SPLIT_RE_JAVA
    from es_loaders_spark.build import assign_doc_ids, build_index
    from es_loaders_spark.corpus import synthesize_web_pages
    from es_loaders_spark.extract import extracted_jvm
    from es_loaders_spark.session import get_spark

    spark = get_spark(f"stagec-{args.cores}", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(ingest_dir, "_SUCCESS")):
        pages = synthesize_web_pages(spark, args.pages)
        ids = assign_doc_ids(pages.select("url"))
        (
            pages.join(F.broadcast(ids), "url")
            .withColumn("text", extracted_jvm(F.col("html")))
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
            .write.mode("overwrite")
            .parquet(ingest_dir)
        )
        spark.catalog.clearCache()

    idx_dir = tempfile.mkdtemp(prefix=f"stagec_idx_{args.cores}_")
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.time()
    build_index(spark, spark.read.parquet(ingest_dir), idx_dir, n_shards=n_shards)
    wall = time.time() - t0
    shutil.rmtree(idx_dir, ignore_errors=True)
    print(
        json.dumps(
            {
                "cores": args.cores,
                "pages": args.pages,
                "shards": n_shards,
                "arrow_batch": os.environ.get("SPARK_GRAFT_ARROW_BATCH", "65536"),
                "stage_c_sec": round(wall, 2),
                "docs_per_sec": round(args.pages / wall, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
