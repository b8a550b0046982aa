"""Tokenizer: golden tokens, JVM/pandas path agreement, DuckDB oracle parity."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from es_loaders_spark.analyze import (
    oracle_tokens_sql,
    tokenize_text,
    tokenize_texts,
    tokens_df,
)


def test_golden_tokens():
    assert tokenize_text("Hello, World! 123") == ["hello", "world", "123"]
    assert tokenize_text("foo-bar_baz  qux.") == ["foo", "bar", "baz", "qux"]
    assert tokenize_text("") == []
    assert tokenize_text("...!!!") == []
    assert tokenize_text("Café déjà-vu") == ["café", "déjà", "vu"]


def test_vectorized_matches_scalar():
    texts = pd.Series(["Hello, World!", "", "a b  c", "Café 42"])
    offsets, flat = tokenize_texts(texts)
    for i, t in enumerate(texts):
        assert list(flat[offsets[i] : offsets[i + 1]]) == tokenize_text(t)


def test_jvm_tokens_match_python_and_duckdb(spark, documents, sf_dir):
    got = (
        tokens_df(documents.limit(50))
        .groupBy("doc_id", "term")
        .count()
        .orderBy("doc_id", "term")
        .collect()
    )
    spark_tokens = {(r["doc_id"], r["term"]): r["count"] for r in got}

    pdf = documents.limit(50).select("doc_id", "text").toPandas()
    py_tokens: dict = {}
    for _, row in pdf.iterrows():
        for t in tokenize_text(row["text"]):
            py_tokens[(row["doc_id"], t)] = py_tokens.get((row["doc_id"], t), 0) + 1
    assert spark_tokens == py_tokens

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet') "
        "ORDER BY doc_id LIMIT 50"
    )
    duck = con.execute(
        f"SELECT doc_id, term, count(*) c FROM ({oracle_tokens_sql()}) GROUP BY 1,2"
    ).fetchall()
    duck_tokens = {(d, t): c for d, t, c in duck}
    assert duck_tokens == spark_tokens


def test_tokenizer_property_unicode():
    """Vectorized batch path == scalar path for arbitrary unicode inputs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.lists(st.text(max_size=60), min_size=1, max_size=20))
    @settings(max_examples=150, deadline=None)
    def check(texts):
        s = pd.Series(texts, dtype="object")
        offsets, flat = tokenize_texts(s)
        for i, t in enumerate(texts):
            assert list(flat[offsets[i] : offsets[i + 1]]) == tokenize_text(t)

    check()


def test_analyze_api_offsets_and_parity():
    from es_loaders_spark.analyze import analyze_api, tokenize_text

    text = "Hello, WORLD! crawl-data 42"
    out = analyze_api(text)
    assert [t["token"] for t in out] == tokenize_text(text)
    assert [t["position"] for t in out] == list(range(len(out)))
    for t in out:
        assert text[t["start_offset"]:t["end_offset"]].lower() == t["token"]
