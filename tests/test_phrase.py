"""Positional postings + index-backed phrase queries (VERDICT r01 gap #1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from es_loaders_spark.analyze import tokens_df
from es_loaders_spark.build import build_index
from es_loaders_spark.merge import merge_index
from es_loaders_spark.phrase import phrase_docs, positional_postings

PHRASES = ["the data", "the fast data", "data the", "spark", "zzzmissing data"]


@pytest.fixture(scope="module")
def pidx(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pos_index"))
    build_index(spark, documents, d, n_shards=4)
    merge_index(spark, d, hot_df_threshold=50, n_salts=4, n_buckets=8)
    return d


def _phrase_via_tokens(documents, phrase: str) -> set[int]:
    """Oracle: token-scan adjacency over the raw documents table."""
    from es_loaders_spark.analyze import tokenize_text

    terms = tokenize_text(phrase)
    toks = tokens_df(documents)
    cur = toks.filter(F.col("term") == terms[0]).select(
        "doc_id", F.col("pos").alias("p")
    )
    for t in terms[1:]:
        nxt = toks.filter(F.col("term") == t).select(
            "doc_id", (F.col("pos") - 1).alias("p")
        )
        cur = cur.join(nxt, ["doc_id", "p"]).select(
            "doc_id", (F.col("p") + 1).alias("p")
        )
    return {r["doc_id"] for r in cur.select("doc_id").distinct().collect()}


def test_positions_match_token_scan(spark, documents, pidx):
    """Decoded index positions == analyzer token positions per (term, doc)."""
    want = {
        (r["term"], r["doc_id"]): sorted(rr["pos"] for rr in r["ps"])
        for r in tokens_df(documents)
        .filter(F.col("term").isin(["the", "data", "spark"]))
        .groupBy("term", "doc_id")
        .agg(F.collect_list(F.struct("pos")).alias("ps"))
        .collect()
    }
    got = {
        (r["term"], r["doc_id"]): sorted(r["positions"])
        for r in positional_postings(
            spark, pidx, ["the", "data", "spark"]
        ).collect()
    }
    assert got == want


def test_phrase_docs_match_token_scan(spark, documents, pidx):
    for phrase in PHRASES:
        got = {r["doc_id"] for r in phrase_docs(spark, pidx, phrase).collect()}
        want = _phrase_via_tokens(documents, phrase)
        assert got == want, f"phrase {phrase!r}: {len(got)} vs {len(want)}"


def test_phrase_from_merged_table(spark, documents, pidx):
    """Positions survive the salted merge: phrase over merged == shards."""
    for phrase in ["the data", "the fast data"]:
        a = {r["doc_id"] for r in phrase_docs(spark, pidx, phrase).collect()}
        b = {
            r["doc_id"]
            for r in phrase_docs(spark, pidx, phrase, table="merged").collect()
        }
        assert a == b, phrase


def test_phrase_plan_reads_index_not_documents(spark, pidx):
    """The phrase plan must scan the index, never the documents table
    (the whole point: no raw-text re-scan per query)."""
    df = phrase_docs(spark, pidx, "the data")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in plan
    assert "pos_index" in plan  # reads the index dir


def test_phrase_across_generations(spark, documents, tmp_path_factory):
    """Appended generations carry positions; phrase == one-shot build."""
    from es_loaders_spark.build import append_documents

    d = str(tmp_path_factory.mktemp("pos_gen"))
    build_index(spark, documents.filter(F.col("doc_id") < 300), d, n_shards=4)
    append_documents(spark, documents.filter(F.col("doc_id") >= 300), d)
    got = {r["doc_id"] for r in phrase_docs(spark, d, "the data").collect()}
    want = _phrase_via_tokens(documents, "the data")
    assert got == want


def _prefix_oracle(documents, phrase: str, exps: list[str]) -> set[int]:
    """Token-scan oracle for match_phrase_prefix given an expansion set."""
    from es_loaders_spark.analyze import tokenize_text

    terms = tokenize_text(phrase)
    toks = tokens_df(documents)
    if len(terms) == 1:
        return {
            r["doc_id"]
            for r in toks.filter(F.col("term").isin(exps))
            .select("doc_id").distinct().collect()
        }
    cur = toks.filter(F.col("term") == terms[0]).select(
        "doc_id", F.col("pos").alias("p")
    )
    for t in terms[1:-1]:
        nxt = toks.filter(F.col("term") == t).select(
            "doc_id", (F.col("pos") - 1).alias("p")
        )
        cur = cur.join(nxt, ["doc_id", "p"]).select(
            "doc_id", (F.col("p") + 1).alias("p")
        )
    tail = toks.filter(F.col("term").isin(exps)).select(
        "doc_id", (F.col("pos") - 1).alias("p")
    )
    return {
        r["doc_id"]
        for r in cur.join(tail, ["doc_id", "p"]).select("doc_id").distinct().collect()
    }


def test_expand_prefix_term_order_and_cap(spark, documents, pidx):
    from es_loaders_spark.phrase import expand_prefix

    all_s = expand_prefix(spark, pidx, "s")
    want = sorted(
        r["term"]
        for r in tokens_df(documents)
        .filter(F.col("term").startswith("s"))
        .select("term").distinct().collect()
    )
    assert all_s == want and len(all_s) >= 2
    assert expand_prefix(spark, pidx, "s", max_expansions=2) == want[:2]
    assert expand_prefix(spark, pidx, "zzznope") == []


def test_phrase_prefix_docs_match_token_scan(spark, documents, pidx):
    from es_loaders_spark.phrase import expand_prefix, phrase_prefix_docs

    exps = expand_prefix(spark, pidx, "s")
    got = {r["doc_id"] for r in phrase_prefix_docs(spark, pidx, "the s").collect()}
    assert got == _prefix_oracle(documents, "the s", exps)
    assert got, "the s* should match"
    # single-token form: prefix only, no positional head
    got1 = {r["doc_id"] for r in phrase_prefix_docs(spark, pidx, "s").collect()}
    assert got1 == _prefix_oracle(documents, "s", exps)


def test_phrase_prefix_max_expansions_cap(spark, documents, pidx):
    from es_loaders_spark.phrase import expand_prefix, phrase_prefix_docs

    capped = expand_prefix(spark, pidx, "s", max_expansions=2)
    got = {
        r["doc_id"]
        for r in phrase_prefix_docs(spark, pidx, "the s", max_expansions=2).collect()
    }
    assert got == _prefix_oracle(documents, "the s", capped)
    # the cap must bite: full expansion set matches strictly more docs
    full = {r["doc_id"] for r in phrase_prefix_docs(spark, pidx, "the s").collect()}
    assert got < full


def test_phrase_prefix_no_expansion_empty(spark, pidx):
    from es_loaders_spark.phrase import phrase_prefix_docs

    assert phrase_prefix_docs(spark, pidx, "the zzznope").count() == 0
    assert phrase_prefix_docs(spark, pidx, "").count() == 0


def test_dsl_match_phrase_prefix(spark, documents, pidx):
    from es_loaders_spark import dsl
    from es_loaders_spark.phrase import expand_prefix

    body = {"query": {"match_phrase_prefix": {"text": "the s"}}, "size": 50000}
    got = {
        r["doc_id"]
        for r in dsl.search(spark, documents, body, index_dir=pidx).collect()
    }
    assert got == _prefix_oracle(documents, "the s", expand_prefix(spark, pidx, "s"))
    # long form carries max_expansions through
    body2 = {
        "query": {
            "match_phrase_prefix": {"text": {"query": "the s", "max_expansions": 2}}
        },
        "size": 50000,
    }
    got2 = {
        r["doc_id"]
        for r in dsl.search(spark, documents, body2, index_dir=pidx).collect()
    }
    assert got2 == _prefix_oracle(
        documents, "the s", expand_prefix(spark, pidx, "s", max_expansions=2)
    )
    with pytest.raises(ValueError, match="built index"):
        dsl.search(spark, documents, body)
