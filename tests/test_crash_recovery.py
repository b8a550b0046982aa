"""Crash-retry recovery for compact_index / merge_generations (ADVICE r04).

The high-severity r04 finding: both operations swept their aside copies
(*_precompact / *_premerge) at ENTRY, before validating the index was
intact — so retrying a run that crashed mid-swap deleted the only
surviving copy of the data, then failed on the missing generation dirs.
These tests construct the exact crashed-mid-swap disk states and assert
the retry now restores and completes instead of destroying.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from es_loaders_spark.build import build_index, append_documents, load_stats
from es_loaders_spark.deletes import (
    compact_index,
    delete_ids,
    merge_generations,
    tombstones,
)
from es_loaders_spark.wand import topk

Q = "the data scan spark"


def _topk_rows(spark, d, k=25):
    return [(r["doc_id"], r["score"]) for r in topk(spark, d, Q, k=k).collect()]


@pytest.fixture()
def gen_index(spark, documents, tmp_path_factory):
    """Index with a base build + 2 appended generations (g=3)."""
    d = str(tmp_path_factory.mktemp("crash_gen"))
    build_index(spark, documents.filter(F.col("doc_id") < 300), d, n_shards=2)
    append_documents(spark, documents.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 400)), d)
    append_documents(spark, documents.filter(F.col("doc_id") >= 400), d)
    assert load_stats(d)["generations"] == 3
    return d


def test_merge_retry_after_crash_mid_swap_recovers(spark, gen_index):
    """Simulated crash in merge step 2: gen dirs renamed aside, a stale
    merged temp left behind. The retry must restore the *_premerge copies
    (not delete them), redo the merge, and serve identical results."""
    before = _topk_rows(spark, gen_index)
    for t in ("shards", "doclens"):
        for g in (1, 2):
            src = os.path.join(gen_index, f"{t}_gen{g}")
            os.replace(src, src + "_premerge")
    # the half-written merged temp of the crashed run
    tmp = os.path.join(gen_index, "shards_genmerge_tmp")
    os.makedirs(tmp)
    open(os.path.join(tmp, "partial"), "w").write("junk")

    stats = merge_generations(spark, gen_index, min_generations=1)
    assert stats["generations"] == 2
    assert _topk_rows(spark, gen_index) == before
    leftovers = [n for n in os.listdir(gen_index)
                 if n.endswith("_premerge") or "genmerge_tmp" in n]
    assert leftovers == []


def test_merge_retry_with_partial_install_recovers(spark, gen_index):
    """Crash AFTER the merged gen-1 install but before the stats commit:
    gen1 holds the (never-visible) merged install while every *_premerge
    twin survives. The premerge copies are authoritative; retry must
    drop the occupant, restore, and converge to the same answer."""
    before = _topk_rows(spark, gen_index)
    for t in ("shards", "doclens"):
        for g in (1, 2):
            src = os.path.join(gen_index, f"{t}_gen{g}")
            os.replace(src, src + "_premerge")
    # fake "installed" gen1 from the crashed run (content is junk — the
    # recovery must prefer the premerge copy, never this)
    bogus = os.path.join(gen_index, "shards_gen1")
    os.makedirs(bogus)
    open(os.path.join(bogus, "junk"), "w").write("x")

    stats = merge_generations(spark, gen_index, min_generations=1)
    assert stats["generations"] == 2
    assert _topk_rows(spark, gen_index) == before


def test_merge_refuses_when_unrecoverable(spark, gen_index):
    """A declared generation dir missing WITHOUT an aside twin must raise
    a recovery message — and must not sweep the other aside copies."""
    shutil.rmtree(os.path.join(gen_index, "shards_gen2"))
    aside = os.path.join(gen_index, "shards_gen1")
    os.replace(aside, aside + "_premerge")
    with pytest.raises(RuntimeError, match="Refusing to sweep"):
        merge_generations(spark, gen_index, min_generations=1)
    # the restorable aside was restored; nothing else was deleted
    assert os.path.exists(os.path.join(gen_index, "shards_gen1"))
    assert os.path.exists(os.path.join(gen_index, "doclens_gen2"))


def test_compact_retry_after_crash_mid_swap_recovers(
    spark, documents, tmp_path_factory
):
    """Simulated crash in compact's swap: every table renamed aside, a
    partial compacted install present. Retry restores and completes; the
    result matches a clean compaction (tombstones cleared, docs gone)."""
    d = str(tmp_path_factory.mktemp("crash_compact"))
    build_index(spark, documents, d, n_shards=2)
    dels = [3, 57, 200]
    delete_ids(spark, d, spark.createDataFrame(
        [(i,) for i in dels], "doc_id long"))
    for t in ("shards", "doclens", "terms"):
        src = os.path.join(d, t)
        os.replace(src, src + "_precompact")
    # partial install from the crashed run — junk, must be dropped
    bogus = os.path.join(d, "shards")
    os.makedirs(bogus)
    open(os.path.join(bogus, "junk"), "w").write("x")

    stats = compact_index(spark, d)
    assert stats["generations"] == 1
    assert tombstones(spark, d) is None
    got = {r[0] for r in _topk_rows(spark, d, k=100)}
    assert not (got & set(dels))
    assert not [n for n in os.listdir(d) if n.endswith("_precompact")]


def test_release_doc_id_caches_rejects_derived_frames(spark, documents):
    """build.py release_doc_id_caches(result) was a silent no-op for any
    derived DataFrame (ADVICE r04) — now it raises, steering callers to
    the exact assign_doc_ids return value or the no-arg form."""
    from es_loaders_spark.build import assign_doc_ids, release_doc_id_caches

    out = assign_doc_ids(
        documents.limit(10)
        .select(F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"), "text")
    )
    derived = out.filter(F.col("doc_id") >= 0)
    with pytest.raises(ValueError, match="EXACT DataFrame"):
        release_doc_id_caches(derived)
    release_doc_id_caches(out)  # the real handle still works
    release_doc_id_caches()  # and the no-arg drain stays idempotent
