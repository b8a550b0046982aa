"""Text analysis: hand-computed goldens for quality/lang/fingerprint."""

from __future__ import annotations

import hashlib

from es_loaders_spark.textstats import fingerprint, lang_scores, quality_features


def test_quality_features_golden(spark):
    df = spark.createDataFrame(
        [(1, "The cat, the dog!"), (2, ""), (3, "of of of")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_features(df).collect()}
    r1 = rows[1]
    assert r1["n_chars"] == 17
    assert r1["n_tokens"] == 4
    assert r1["punct_ratio"] == round(2 / 17, 4)
    assert r1["stopword_ratio"] == round(2 / 4, 4)  # 'the' twice
    assert rows[2]["n_tokens"] == 0 and rows[2]["punct_ratio"] == 0.0
    assert rows[3]["stopword_ratio"] == 1.0


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat of the house is big"),
            (2, "le chat et la maison les arbres"),
            (3, "el gato de la casa que los"),
            (4, "xyz qqq zzz"),  # no markers → tie → alphabetical first
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["pred_lang"] for r in lang_scores(df).collect()}
    assert rows[1] == "en"
    assert rows[2] == "fr"
    assert rows[3] == "es"
    assert rows[4] == "de"  # 0-0-0-0 tie, alphabetical


def test_fingerprint_matches_hashlib(spark):
    df = spark.createDataFrame([(1, "  Hello World  ")], "doc_id long, text string")
    got = fingerprint(df).collect()[0]["fp"]
    assert got == hashlib.md5(b"hello world").hexdigest()


def test_bpe_token_count_golden(spark):
    from pyspark.sql import functions as F

    from es_loaders_spark.textstats import bpe_token_count_col

    df = spark.createDataFrame(
        [(1, "Hello, world's 42 test!!"), (2, ""), (3, "don't stop")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe_token_count_col(F.col("text")).alias("n")
        ).collect()
    }
    # Hello | , | _world | 's | _42 | _test | !! -> 7
    assert got[1] == 7
    assert got[2] == 0
    # don | 't | _stop -> 3
    assert got[3] == 3


def test_rolling_hash_incremental_property(spark):
    """h(A ++ B) == (h(A)·B^|B| + h(B)) mod M — the chunk-combining
    identity that makes the fingerprint streamable."""
    from pyspark.sql import functions as F

    from es_loaders_spark.textstats import (
        ROLL_BASE,
        ROLL_MOD,
        rolling_hash_col,
        token_count_col,
    )

    a = "spark builds the index"
    b = "and merges every shard tonight"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, a + " " + b)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["rh"], r["n"])
        for r in df.select(
            "doc_id",
            rolling_hash_col(F.col("text")).alias("rh"),
            token_count_col(F.col("text")).alias("n"),
        ).collect()
    }
    (ha, _), (hb, nb), (hab, _) = out[1], out[2], out[3]
    assert hab == (ha * pow(ROLL_BASE, nb, ROLL_MOD) + hb) % ROLL_MOD


def test_winnowing_guarantee_and_short_docs(spark):
    """Any shared token run of length >= w + k - 1 (= 8) shares at
    least one fingerprint; docs shorter than k emit none."""
    from es_loaders_spark.textstats import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    df = spark.createDataFrame(
        [
            (1, f"intro words here {shared} tail one"),
            (2, f"{shared} completely different ending text now"),
            (3, "tiny doc"),  # < k tokens -> no fingerprints
        ],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(df, k=5, w=4).collect()
    fps = {}
    for r in rows:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps.get(1) and fps.get(2)
    assert fps[1] & fps[2], "shared 8-token run must share a fingerprint"
    assert 3 not in fps
