"""Time-travel query surface (VERDICT r04 #8): build → append → query
snapshot N−1 and get the EXACT pre-append result back (ids + scores) —
the snapshot history become a reproducibility guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from es_loaders_spark.build import append_documents, build_index
from es_loaders_spark.catalog import ManifestCatalog
from es_loaders_spark.timetravel import topk_as_of
from es_loaders_spark.wand import topk

QUERIES = ["spark query data", "the fast scan", "w0005 merge"]


@pytest.fixture(scope="module")
def tt_index(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tt_idx"))
    build_index(spark, documents.filter(F.col("doc_id") < 300), d, n_shards=4)
    pre = {
        q: [(r["doc_id"], r["score"]) for r in topk(spark, d, q, k=20).collect()]
        for q in QUERIES
    }
    append_documents(spark, documents.filter(F.col("doc_id") >= 300), d)
    return d, pre


def test_as_of_equals_pre_append(spark, tt_index):
    d, pre = tt_index
    for q in QUERIES:
        got = [(r["doc_id"], r["score"])
               for r in topk_as_of(spark, d, q, k=20, generations=1).collect()]
        assert got == pre[q], f"time travel diverged for {q!r}"


def test_as_of_current_equals_live(spark, tt_index):
    d, _ = tt_index
    for q in QUERIES:
        live = [(r["doc_id"], r["score"]) for r in topk(spark, d, q, k=20).collect()]
        tt = [(r["doc_id"], r["score"])
              for r in topk_as_of(spark, d, q, k=20).collect()]
        assert tt == live, q
    # appended docs visible at the current generation, absent at g=1
    cur = {r["doc_id"] for r in topk_as_of(spark, d, "w0005 merge", k=50).collect()}
    old = {r["doc_id"]
           for r in topk_as_of(spark, d, "w0005 merge", k=50, generations=1).collect()}
    assert all(i < 300 for i in old)
    assert cur - old, "append invisible at current generation"


def test_as_of_bounds_and_rewrite_guard(spark, tt_index, documents, tmp_path_factory):
    d, _ = tt_index
    with pytest.raises(ValueError, match="generations must be in"):
        topk_as_of(spark, d, "spark", generations=3)
    with pytest.raises(ValueError, match="generations must be in"):
        topk_as_of(spark, d, "spark", generations=0)
    # snapshot metadata survives history; the catalog documents both commits
    snaps = ManifestCatalog(d).snapshots("shards_gen1")
    assert snaps and snaps[-1]["version"] >= 1


def test_as_of_after_merge_raises_loudly(spark, documents, tmp_path_factory):
    from es_loaders_spark.deletes import merge_generations

    d = str(tmp_path_factory.mktemp("tt_merge"))
    build_index(spark, documents.filter(F.col("doc_id") < 200), d, n_shards=2)
    append_documents(
        spark, documents.filter(F.col("doc_id").between(200, 299)), d)
    append_documents(spark, documents.filter(F.col("doc_id") >= 300), d)
    pre = [(r["doc_id"], r["score"])
           for r in topk_as_of(spark, d, "the data", k=10, generations=2).collect()]
    assert pre
    merge_generations(spark, d, min_generations=1)  # gen1+gen2 → one gen
    # merged-away generations no longer resolve: the SUBSET g=2 of the
    # new layout is readable (base + merged gen1) but means "current",
    # not the old snapshot — history deeper than the rewrite raises
    with pytest.raises(ValueError, match="generations must be in"):
        topk_as_of(spark, d, "the data", generations=3)
