"""Tombstone deletes + delete_by_query + compaction (VERDICT r01 item 6).

Reference analogue: clean_analysis / delete_by_query
(mira/elasticsearch.py:211-225, 255-274); model = Lucene live-docs.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from es_loaders_spark.build import build_index
from es_loaders_spark.deletes import (
    compact_index,
    delete_by_term,
    delete_ids,
    tombstones,
)
from es_loaders_spark.merge import merge_index, merged_postings
from es_loaders_spark.phrase import phrase_docs
from es_loaders_spark.wand import topk

DEL_IDS = [3, 57, 200, 444]
QUERIES = ["spark query data", "the fast scan", "w0005"]


@pytest.fixture(scope="module")
def del_index(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("del_idx"))
    build_index(spark, documents, d, n_shards=4)
    merge_index(spark, d, hot_df_threshold=50, n_salts=4, n_buckets=8)
    n = delete_ids(
        spark, d, spark.createDataFrame([(i,) for i in DEL_IDS], "doc_id long")
    )
    assert n == len(DEL_IDS)
    return d


def test_deleted_docs_excluded_from_topk(spark, documents, del_index):
    for q in QUERIES:
        got = {r["doc_id"] for r in topk(spark, del_index, q, k=50).collect()}
        assert not (got & set(DEL_IDS)), q


def test_deleted_docs_excluded_from_phrase_and_postings(spark, del_index):
    got = {r["doc_id"] for r in phrase_docs(spark, del_index, "the data").collect()}
    assert not (got & set(DEL_IDS))
    pg = {r["doc_id"] for r in merged_postings(spark, del_index, ["the"]).collect()}
    assert not (pg & set(DEL_IDS))


def test_delete_idempotent(spark, del_index):
    n = delete_ids(
        spark, del_index,
        spark.createDataFrame([(i,) for i in DEL_IDS], "doc_id long"),
    )
    assert n == len(DEL_IDS)  # same set, no growth


def test_delete_by_term_matches_token_scan(spark, documents, tmp_path_factory):
    from es_loaders_spark.analyze import tokens_df

    d = str(tmp_path_factory.mktemp("del_term_idx"))
    build_index(spark, documents, d, n_shards=2)
    n = delete_by_term(spark, d, "w0005")
    want = {
        r["doc_id"]
        for r in tokens_df(documents).filter(F.col("term") == "w0005")
        .select("doc_id").distinct().collect()
    }
    assert n == len(want)
    got = {r["doc_id"] for r in tombstones(spark, d).collect()}
    assert got == want
    # the term no longer matches anything
    assert topk(spark, d, "w0005", k=10).count() == 0


def test_compact_rank_identical_to_fresh_build(
    spark, documents, del_index, tmp_path_factory
):
    """delete → compact → rank-identical (ids AND scores) to a fresh
    index built over only the survivor documents."""
    stats = compact_index(spark, del_index)
    survivors = documents.filter(~F.col("doc_id").isin(DEL_IDS))
    assert stats["n_docs"] == survivors.count()
    assert stats["generations"] == 1
    assert tombstones(spark, del_index) is None
    with open(os.path.join(del_index, "stats.json")) as f:
        assert json.load(f)["n_docs"] == stats["n_docs"]

    fresh = str(tmp_path_factory.mktemp("fresh_survivors"))
    build_index(spark, survivors, fresh, n_shards=4)
    for q in QUERIES + ["the data"]:
        a = [(r["doc_id"], r["score"]) for r in topk(spark, del_index, q, k=20).collect()]
        b = [(r["doc_id"], r["score"]) for r in topk(spark, fresh, q, k=20).collect()]
        assert a == b, f"compact vs fresh differ for {q!r}"
    # phrase still index-served post-compaction (positions survived)
    pa = {r["doc_id"] for r in phrase_docs(spark, del_index, "the data").collect()}
    pb = {r["doc_id"] for r in phrase_docs(spark, fresh, "the data").collect()}
    assert pa == pb


def test_delete_and_compact_across_generations(spark, documents, tmp_path_factory):
    """Deletes spanning base + appended generations compact to exactly a
    fresh build of the survivors (multi-gen tombstone coverage)."""
    from es_loaders_spark.build import append_documents, generation_dirs

    d = str(tmp_path_factory.mktemp("del_gen_idx"))
    build_index(spark, documents.filter(F.col("doc_id") < 300), d, n_shards=4)
    append_documents(spark, documents.filter(F.col("doc_id") >= 300), d)
    dels = [5, 299, 300, 450]  # both generations, incl. boundary ids
    delete_ids(spark, d, spark.createDataFrame([(i,) for i in dels], "doc_id long"))
    for q in QUERIES:
        got = {r["doc_id"] for r in topk(spark, d, q, k=50).collect()}
        assert not (got & set(dels)), q
    stats = compact_index(spark, d)
    assert stats["generations"] == 1 and len(generation_dirs(d, "shards")) == 1
    survivors = documents.filter(~F.col("doc_id").isin(dels))
    assert stats["n_docs"] == survivors.count()
    fresh = str(tmp_path_factory.mktemp("del_gen_fresh"))
    build_index(spark, survivors, fresh, n_shards=4)
    for q in QUERIES + ["the data"]:
        a = [(r["doc_id"], r["score"]) for r in topk(spark, d, q, k=20).collect()]
        b = [(r["doc_id"], r["score"]) for r in topk(spark, fresh, q, k=20).collect()]
        assert a == b, q


def test_compact_fully_tombstoned_shard(spark, documents, tmp_path_factory):
    """A shard whose every doc is deleted must compact to empty, not crash
    (ADVICE r02: keep_docs[np.minimum(pos_idx, -1)] IndexError on size-0)."""
    d = str(tmp_path_factory.mktemp("full_tomb"))
    build_index(spark, documents.limit(40), d, n_shards=4)
    # shard = doc_id % 4 → delete every doc of shard 1
    ids = spark.range(40).filter(F.col("id") % 4 == 1).select(F.col("id").alias("doc_id"))
    delete_ids(spark, d, ids)
    compact_index(spark, d)
    shards = spark.read.parquet(os.path.join(d, "shards"))
    assert shards.filter(F.col("shard") == 1).count() == 0
    survivors = {r["doc_id"] for r in topk(spark, d, "the data scan", k=100).collect()}
    assert all(i % 4 != 1 for i in survivors)
