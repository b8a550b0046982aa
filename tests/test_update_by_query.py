"""_update_by_query: reindex-under-fresh-ids update over the
append-only index (deletes.update_by_query)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from es_loaders_spark.build import build_index
from es_loaders_spark.deletes import id_map, update_by_query
from es_loaders_spark.wand import evict_index, topk


@pytest.fixture()
def corpus(spark, web_pages):
    return (
        web_pages
        .withColumn("doc_id", F.row_number().over(Window.orderBy("url")) - 1)
        .select("doc_id", "url", "text")
        .cache()
    )


def _updated_corpus(corpus, term: str):
    hit = F.array_contains(
        F.split(F.lower(F.col("text")), r"[^\p{L}\p{N}]+"), term
    )
    return corpus.withColumn(
        "text",
        F.when(hit, F.concat(F.col("text"), F.lit(" zzzupdated"))).otherwise(
            F.col("text")
        ),
    )


def test_update_matches_fresh_build_rank_identity(spark, corpus, tmp_path):
    idx = str(tmp_path / "upd_idx")
    build_index(spark, corpus, idx, n_shards=4)

    res = update_by_query(
        spark, idx, {"query": {"match": {"text": "crawl"}}},
        corpus, new_text=F.concat(F.col("text"), F.lit(" zzzupdated")),
        batch_tag="upd-1",
    )
    assert res["updated"] > 0

    # the updated docs are found under the new token, and ONLY they are
    new_hits = topk(spark, idx, "zzzupdated", k=10000)
    assert new_hits.count() == res["updated"]

    # rank-identity vs a FRESH build over the logically-updated corpus:
    # same new ids (via id_map), same text → identical top-k ids+scores
    m = id_map(spark, idx)
    remap = {r.old_id: r.new_id for r in m.collect()}
    fresh_docs = (
        _updated_corpus(corpus, "crawl")
        .withColumn(
            "doc_id",
            F.coalesce(
                F.element_at(
                    F.create_map(*[
                        F.lit(x) for kv in remap.items() for x in kv
                    ]),
                    F.col("doc_id"),
                ),
                F.col("doc_id"),
            ),
        )
    )
    idx2 = str(tmp_path / "fresh_idx")
    build_index(spark, fresh_docs, idx2, n_shards=4)
    # BEFORE compaction the doc SETS match but scores differ: tombstoned
    # docs still pollute n_docs/avgdl/df — exactly like Lucene deleted
    # docs before a forcemerge. Compaction rebuilds stats from survivors,
    # after which the updated index is BYTE-identical to the fresh build.
    from es_loaders_spark.deletes import compact_index

    compact_index(spark, idx)
    evict_index(idx)
    for q in ("crawl zzzupdated", "spark crawl index", "the data"):
        got = [(r.doc_id, r.score) for r in topk(spark, idx, q, k=20).collect()]
        want = [(r.doc_id, r.score) for r in topk(spark, idx2, q, k=20).collect()]
        assert got == want, q
    evict_index(idx)
    evict_index(idx2)


def test_update_tombstones_old_ids_and_maps_forward(spark, corpus, tmp_path):
    idx = str(tmp_path / "upd_idx2")
    build_index(spark, corpus, idx, n_shards=4)
    old_hits = {r.doc_id for r in topk(spark, idx, "crawl", k=10000).collect()}
    update_by_query(
        spark, idx, {"query": {"match": {"text": "crawl"}}},
        corpus, new_text=F.concat(F.col("text"), F.lit(" zzzupdated")),
    )
    m = {r.old_id: r.new_id for r in id_map(spark, idx).collect()}
    assert set(m) == old_hits  # exactly the matched docs were remapped
    # old ids are tombstoned: a query hitting the old text never
    # returns an old id, and returns each NEW id instead
    after = {r.doc_id for r in topk(spark, idx, "crawl", k=10000).collect()}
    assert after == {m[i] for i in old_hits}
    evict_index(idx)


def test_update_replay_is_idempotent(spark, corpus, tmp_path):
    idx = str(tmp_path / "upd_idx3")
    build_index(spark, corpus, idx, n_shards=4)
    r1 = update_by_query(
        spark, idx, {"query": {"match": {"text": "crawl"}}},
        corpus, new_text=F.concat(F.col("text"), F.lit(" zzzupdated")),
        batch_tag="upd-replay",
    )
    before = [(r.doc_id, r.score)
              for r in topk(spark, idx, "zzzupdated", k=10000).collect()]
    # replay the SAME call (crash-after-append recovery path): no new
    # generation, same id assignment, same results
    r2 = update_by_query(
        spark, idx, {"query": {"match": {"text": "crawl"}}},
        corpus, new_text=F.concat(F.col("text"), F.lit(" zzzupdated")),
        batch_tag="upd-replay",
    )
    assert r2["updated"] == r1["updated"]
    assert int(r2["stats"]["generations"]) == int(r1["stats"]["generations"])
    after = [(r.doc_id, r.score)
             for r in topk(spark, idx, "zzzupdated", k=10000).collect()]
    assert after == before
    evict_index(idx)


def test_update_no_match_is_noop(spark, corpus, tmp_path):
    idx = str(tmp_path / "upd_idx4")
    build_index(spark, corpus, idx, n_shards=4)
    res = update_by_query(
        spark, idx, {"query": {"term": {"url": "no-such-url"}}},
        corpus, new_text=F.lit("x"),
    )
    assert res["updated"] == 0
    assert id_map(spark, idx) is None
    evict_index(idx)


def test_update_replay_survives_interleaved_append(spark, corpus, tmp_path):
    """ADVICE r05 (deletes.py:592): a crash-replay must recover ITS OWN
    id base from stats['batch_bases'], not from 'the last generation' —
    an unrelated append between the crash and the replay used to make
    the replay silently map old ids to the OTHER batch's doc_ids."""
    from es_loaders_spark.build import append_documents

    idx = str(tmp_path / "upd_idx5")
    build_index(spark, corpus, idx, n_shards=4)
    r1 = update_by_query(
        spark, idx, {"query": {"match": {"text": "crawl"}}},
        corpus, new_text=F.concat(F.col("text"), F.lit(" zzzupdated")),
        batch_tag="upd-interleave",
    )
    pairs_before = sorted(
        (r.old_id, r.new_id) for r in id_map(spark, idx).collect()
    )
    # unrelated append lands AFTER the update committed, BEFORE the replay
    base2 = int(r1["stats"]["max_doc_id"]) + 1
    extra = spark.createDataFrame(
        [(base2 + i, f"unrelated filler page {i}") for i in range(5)],
        "doc_id long, text string",
    )
    append_documents(spark, extra, idx)
    r2 = update_by_query(
        spark, idx, {"query": {"match": {"text": "crawl"}}},
        corpus, new_text=F.concat(F.col("text"), F.lit(" zzzupdated")),
        batch_tag="upd-interleave",
    )
    assert r2["updated"] == r1["updated"]
    pairs_after = sorted(
        (r.old_id, r.new_id) for r in id_map(spark, idx).collect()
    )
    # the replay recomputed the SAME mapping — no pairs pointing into
    # the unrelated batch's id range
    assert pairs_after == pairs_before
    assert all(new_id < base2 for _, new_id in pairs_after)
    evict_index(idx)


def test_update_replay_refuses_without_recorded_base(spark, corpus, tmp_path):
    """A tag in applied_batches WITHOUT a batch_bases entry (pre-r6
    index) must refuse loudly instead of guessing a base."""
    import json
    import os

    idx = str(tmp_path / "upd_idx6")
    build_index(spark, corpus, idx, n_shards=4)
    update_by_query(
        spark, idx, {"query": {"match": {"text": "crawl"}}},
        corpus, new_text=F.concat(F.col("text"), F.lit(" zzzupdated")),
        batch_tag="upd-nobase",
    )
    sp = os.path.join(idx, "stats.json")
    st = json.load(open(sp))
    st["batch_bases"].pop("upd-nobase")
    json.dump(st, open(sp, "w"))
    evict_index(idx)
    with pytest.raises(RuntimeError, match="no recorded base"):
        update_by_query(
            spark, idx, {"query": {"match": {"text": "crawl"}}},
            corpus, new_text=F.concat(F.col("text"), F.lit(" zzzupdated")),
            batch_tag="upd-nobase",
        )
    evict_index(idx)
