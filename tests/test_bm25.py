"""BM25 exact scorer: rank-identity vs brute-force Python oracle and DuckDB SQL."""

from __future__ import annotations

import math

import duckdb

from es_loaders_spark.analyze import tokenize_text
from es_loaders_spark.bm25 import SCORE_DECIMALS, bm25_topk, bm25_topk_oracle_sql
from es_loaders_spark.postings import corpus_stats, doc_lengths, postings_long, term_df

QUERIES = [
    "spark query data",
    "the fast table scan",
    "customer order line window merge",
    "hash join",
]


def brute_force_bm25(pdf, query, k=10, k1=1.2, b=0.75):
    """Pure-Python oracle: Lucene BM25 over a pandas documents frame."""
    docs = {int(r.doc_id): tokenize_text(r.text) for r in pdf.itertuples()}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    dfreq: dict = {}
    for toks in docs.values():
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    scores = {}
    for term in sorted(set(tokenize_text(query))):
        if term not in dfreq:
            continue
        idf = math.log(1 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
        for d, toks in docs.items():
            tf = toks.count(term)
            if tf == 0:
                continue
            dl = len(toks)
            scores[d] = scores.get(d, 0.0) + idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * dl / avgdl)
            )
    ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
    return [(d, round(s, SCORE_DECIMALS)) for d, s in ranked]


def test_bm25_rank_identity_python_oracle(spark, documents):
    postings = postings_long(documents).cache()
    dl = doc_lengths(documents).cache()
    tdf = term_df(postings)
    stats = corpus_stats(dl)
    pdf = documents.select("doc_id", "text").toPandas()

    for q in QUERIES:
        got = [
            (r["doc_id"], r["score"])
            for r in bm25_topk(spark, postings, dl, tdf, stats, q, k=10).collect()
        ]
        want = brute_force_bm25(pdf, q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], f"doc order differs for {q!r}"
        for (gd, gs), (wd, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-3, f"score mismatch {q!r}: {gs} vs {ws}"


def test_bm25_rank_identity_duckdb_oracle(spark, documents, sf_dir):
    postings = postings_long(documents).cache()
    dl = doc_lengths(documents).cache()
    tdf = term_df(postings)
    stats = corpus_stats(dl)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    for q in QUERIES:
        got = [
            (r["doc_id"], r["score"])
            for r in bm25_topk(spark, postings, dl, tdf, stats, q, k=10).collect()
        ]
        want = con.execute(bm25_topk_oracle_sql(q, k=10)).fetchall()
        assert [d for d, _ in got] == [int(d) for d, _ in want]
        for (gd, gs), (wd, ws) in zip(got, want):
            assert abs(gs - float(ws)) < 1e-3
