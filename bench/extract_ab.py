#!/usr/bin/env python
"""A/B: ingest-write extraction shapes on the bench's opaque synth input.

A (current): with_extracted_text DataFrame-level split — codegen chain
   for both branches, but the opaque synth subtree is SCANNED TWICE
   (clean + dirty branch).
B: single-scan hybrid — ONE synth pass; the extraction CASE (HOF decode
   on '&#' rows, replace chain otherwise) lives in its OWN projection so
   it is evaluated once per row, at interpreted (non-codegen) speed.

The r2 measurement (split 1.7x better) was on a TABLE-backed input where
a second scan is a cheap pruned parquet read; on the bench's generator
input a second scan is a full Python synthesis pass — this measures
which side of that trade wins. Interleaved, min-of-N per variant.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    pages_n = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "60000"))
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    from pyspark.sql import functions as F

    from es_loaders_spark.analyze import SPLIT_RE_JAVA
    from es_loaders_spark.build import assign_doc_ids, release_doc_id_caches
    from es_loaders_spark.corpus import synthesize_web_pages
    from es_loaders_spark.extract import (
        _decode_entities_jvm, _named_entity_chain, _tag_strip,
        with_extracted_text,
    )
    from es_loaders_spark.session import get_spark

    spark = get_spark("extract-ab", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    def case_extract(df, html_col="html", out_col="text"):
        has_num = F.contains(F.col(html_col), F.lit(b"&#"))
        text = F.when(
            has_num, _decode_entities_jvm(_tag_strip(F.col(html_col)))
        ).otherwise(_named_entity_chain(_tag_strip(F.col(html_col))))
        return df.withColumn(out_col, text)

    res = {"A_split": [], "B_case": []}
    for _ in range(rounds):
        for name, extractor in (("A_split", with_extracted_text),
                                ("B_case", case_extract)):
            pages = synthesize_web_pages(spark, pages_n, seed=42)
            ids = assign_doc_ids(pages.select("url"))
            d = tempfile.mkdtemp(prefix="exab_")
            t0 = time.time()
            (
                extractor(pages.join(F.broadcast(ids), "url"))
                .withColumn(
                    "dl",
                    F.size(
                        F.filter(
                            F.split(F.lower(F.col("text")), SPLIT_RE_JAVA),
                            lambda t: t != F.lit(""),
                        )
                    ),
                )
                .select("doc_id", "text", "dl")
                .write.mode("overwrite").parquet(os.path.join(d, "ingest"))
            )
            res[name].append(round(time.time() - t0, 3))
            release_doc_id_caches()
            shutil.rmtree(d, ignore_errors=True)
    print(json.dumps({k: {"times": v, "min": min(v)} for k, v in res.items()}))


if __name__ == "__main__":
    main()
