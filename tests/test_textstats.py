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
