"""Corpus synthesis: determinism across runs and parallelism (SURVEY §7 step 0)."""

from __future__ import annotations

from es_loaders_spark.corpus import generate_pages_pdf, synthesize_web_pages


def test_generator_deterministic():
    a = generate_pages_pdf(100, 50, seed=42)
    b = generate_pages_pdf(100, 50, seed=42)
    assert a.equals(b)
    c = generate_pages_pdf(100, 50, seed=43)
    assert not a["text"].equals(c["text"])


def test_block_split_consistency():
    """Generating [0,100) must equal [0,50)+[50,100) — partition-invariance."""
    import pandas as pd

    whole_urls = set(generate_pages_pdf(0, 100)["url"])
    split = pd.concat([generate_pages_pdf(0, 50), generate_pages_pdf(50, 50)])
    assert set(split["url"]) == whole_urls


def test_spark_synthesis_parallelism_invariant(spark):
    a = synthesize_web_pages(spark, 300, seed=42, partitions=2)
    b = synthesize_web_pages(spark, 300, seed=42, partitions=7)
    ra = {r["url"]: r["text"] for r in a.collect()}
    rb = {r["url"]: r["text"] for r in b.collect()}
    assert ra == rb
    assert len(ra) == 300


def test_schema_and_zipf_head(spark, web_pages):
    assert set(web_pages.columns) == {"url", "warc_ts", "html", "text", "lang"}
    assert web_pages.count() == 400
    # hot-term skew is real: 'the' appears in nearly every document
    from pyspark.sql import functions as F

    n_with_the = web_pages.filter(F.col("text").contains("the ")).count()
    assert n_with_the > 350
