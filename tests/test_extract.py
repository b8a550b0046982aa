"""Extraction byte-equality over the full corpus (north_star requirement)."""

from __future__ import annotations

from pyspark.sql import functions as F

from es_loaders_spark.extract import extract_text, extract_text_bytes


def test_extract_bytes_unit():
    html = b"<html><head><title>t</title></head><body>hello world</body></html>"
    assert extract_text_bytes(html) == b"hello world"
    nested = b"<body class='x'>a <b>bold</b> c</body>"
    assert extract_text_bytes(nested) == b"a bold c"


def test_extraction_byte_equality_full_corpus(spark, web_pages):
    mismatches = (
        web_pages.withColumn("ext", extract_text(F.col("html")))
        .filter(F.col("ext") != F.col("text"))
        .count()
    )
    assert mismatches == 0
