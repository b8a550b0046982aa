"""Rank-identity stress test on the Zipf web corpus (north_star check).

The driver ``documents`` table has a ~31-term vocabulary; this corpus
has 1000 Zipf-distributed terms, long documents, and genuine score ties
— the realistic surface for the compressed WAND path vs the
Lucene-formula DuckDB oracle.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from es_loaders_spark.bm25 import bm25_topk_oracle_sql
from es_loaders_spark.build import assign_doc_ids, build_index
from es_loaders_spark.corpus import synthesize_web_pages
from es_loaders_spark.extract import extract_text
from es_loaders_spark.wand import topk, topk_batch

WEB_QUERIES = [
    "the of and",                      # pure Zipf head, maximal ties
    "spark index crawl",
    "w0500 w0750 w0900",               # tail terms
    "the w0987",                       # head + tail mix
    "data query page web crawl spark", # many mid-frequency terms
]


@pytest.fixture(scope="module")
def web_index(spark, tmp_path_factory):
    pages = synthesize_web_pages(spark, 2000, seed=21)
    docs = (
        assign_doc_ids(pages.select("url"))
        .join(pages, "url")
        .withColumn("text", extract_text(F.col("html")))
        .select("doc_id", "text")
        .cache()
    )
    d = str(tmp_path_factory.mktemp("web_idx"))
    build_index(spark, docs, d, n_shards=8)
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    return d, con


def test_wand_rank_identity_on_web_corpus(spark, web_index):
    d, con = web_index
    for q in WEB_QUERIES:
        got = [(r["doc_id"], r["score"]) for r in topk(spark, d, q, k=25).collect()]
        want = [
            (int(doc), float(s))
            for doc, s in con.execute(bm25_topk_oracle_sql(q, k=25)).fetchall()
        ]
        assert [x for x, _ in got] == [x for x, _ in want], f"rank differs: {q!r}"
        for (gd, gs), (wd, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-3, f"score mismatch {q!r}: {gs} vs {ws}"


def test_batch_rank_identity_on_web_corpus(spark, web_index):
    d, con = web_index
    batch = {f"q{i}": q for i, q in enumerate(WEB_QUERIES)}
    rows = topk_batch(spark, d, batch, k=25).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid, q in batch.items():
        got = [(doc, s) for _, doc, s in sorted(by_q[qid])]
        want = [
            (int(doc), float(s))
            for doc, s in con.execute(bm25_topk_oracle_sql(q, k=25)).fetchall()
        ]
        assert [x for x, _ in got] == [x for x, _ in want], f"batch rank differs: {q!r}"
