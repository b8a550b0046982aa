"""ES ``combined_fields`` (BM25F): the fields score as ONE combined
field — boost-weighted summed term freqs and lengths, collection stats
of the combination. Contrast with multi_match best_fields (max over
independently scored fields): a doc mentioning the term in EVERY field
must beat one stuffing a single field.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from es_loaders_spark import dsl
from es_loaders_spark.dsl import combined_fields_oracle_sql

DOCS = [
    (0, "spark engine overview", "spark"),
    (1, "the spark spark spark cookbook", "misc"),
    (2, "tuning guide", "spark"),
    (3, "unrelated text entirely", "misc"),
    (4, "spark joins", "engine notes"),
]
COLS = "doc_id long, text string, source string"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, COLS)


def _run(spark, docs, body):
    return [(r["doc_id"], r["score"]) for r in
            dsl.search(spark, docs, body).collect()]


def _want(query, fields, k=10, operator="or"):
    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame(DOCS, columns=["doc_id", "text", "source"]))
    sql = combined_fields_oracle_sql(query, fields, k=k, operator=operator)
    return [(int(r[0]), float(r[1])) for r in con.execute(sql).fetchall()]


def test_combined_fields_oracle_parity(spark, docs):
    body = {"query": {"combined_fields": {
        "query": "spark engine", "fields": ["text", "source"]}}, "size": 10}
    got = _run(spark, docs, body)
    assert got == _want("spark engine", ["text", "source"]) and got


def test_combined_fields_boost_weighting(spark, docs):
    """^2 on source doubles its freq AND length contribution — parity
    holds and the ordering differs from the unboosted run."""
    fields = ["text", "source^2"]
    body = {"query": {"combined_fields": {
        "query": "spark engine", "fields": fields}}, "size": 10}
    got = _run(spark, docs, body)
    assert got == _want("spark engine", fields) and got


def test_combined_fields_operator_and(spark, docs):
    fields = ["text", "source"]
    body = {"query": {"combined_fields": {
        "query": "spark engine", "fields": fields, "operator": "and"}},
        "size": 10}
    got = _run(spark, docs, body)
    assert got == _want("spark engine", fields, operator="and") and got
    # doc 2/3 lack at least one term across BOTH fields
    ids = {d for d, _ in got}
    assert 2 not in ids and 3 not in ids
    # every AND hit appears in the OR run too
    assert ids <= {d for d, _ in _run(spark, docs, {
        "query": {"combined_fields": {"query": "spark engine",
                                      "fields": fields}}, "size": 10})}


def test_combined_fields_beats_single_field_stuffing(spark, docs):
    """BM25F discrimination: doc 0 has 'spark' in text AND source (plus
    'engine'); doc 1 stuffs 'spark' 3x into one field. Under
    combined_fields with saturation, doc 0 outranks doc 1; multi_match
    best_fields ranks doc 1's stuffed field higher for 'spark' alone."""
    cf = _run(spark, docs, {"query": {"combined_fields": {
        "query": "spark engine", "fields": ["text", "source"]}}, "size": 10})
    assert cf[0][0] == 0
    pos = {d: i for i, (d, _) in enumerate(cf)}
    assert pos[0] < pos[1]


def test_combined_fields_rejects_sub_one_boost_and_bad_operator(spark, docs):
    with pytest.raises(ValueError, match="boost must be >= 1"):
        _run(spark, docs, {"query": {"combined_fields": {
            "query": "spark", "fields": ["text^0.5"]}}, "size": 5})
    with pytest.raises(ValueError, match="or|and"):
        _run(spark, docs, {"query": {"combined_fields": {
            "query": "spark", "fields": ["text"], "operator": "xor"}},
            "size": 5})


def test_combined_fields_requires_one_analyzer_over_chain(spark, tmp_path):
    """Over a chained index, combining the chained column with a
    default-grammar field would mix term spaces — refuse loudly."""
    from es_loaders_spark.build import build_index
    from es_loaders_spark.wand import evict_index

    docs = spark.createDataFrame(DOCS, COLS)
    d = str(tmp_path / "cf_chain_idx")
    build_index(spark, docs.select("doc_id", "text"), d, n_shards=2,
                analysis={"stopwords": ["the"]})
    try:
        with pytest.raises(ValueError, match="one analyzer"):
            dsl.search(spark, docs, {"query": {"combined_fields": {
                "query": "spark", "fields": ["text", "source"]}}, "size": 5},
                index_dir=d).collect()
        # the degenerate single-field case IS allowed and chain-analyzes:
        # 'the sparks' -> stopword drops; N.B. no stemmer in this chain
        rows = dsl.search(spark, docs, {"query": {"combined_fields": {
            "query": "the spark", "fields": ["text"]}}, "size": 5},
            index_dir=d).collect()
        assert [r["doc_id"] for r in rows][:1] == [1]
    finally:
        evict_index(d)
