"""Iceberg-style snapshot history on the manifest catalog: every commit
retains a versioned snapshot file; load(version=) time-travels the
lineage/metrics log; expire_snapshots bounds retention.
"""

from __future__ import annotations

import pytest

from es_loaders_spark.catalog import ManifestCatalog, PartitionEntry


def _entry(pid: int, docs: int = 10) -> PartitionEntry:
    return PartitionEntry(
        partition_id=pid, stage="postings", input_rows=docs, docs=docs,
        terms=docs * 3, bytes=docs * 100, wall_ms=1,
    )


def test_snapshot_log_and_time_travel(tmp_path):
    cat = ManifestCatalog(str(tmp_path))
    cat.commit("t", [_entry(0), _entry(1)], props={"n_shards": 2})
    cat.commit("t", [_entry(2)])
    cat.commit("t", [_entry(3)])

    snaps = cat.snapshots("t")
    assert [s["version"] for s in snaps] == [1, 2, 3]
    assert [s["n_partitions"] for s in snaps] == [2, 3, 4]
    assert snaps[0]["docs"] == 20 and snaps[-1]["docs"] == 40
    assert all(s["committed_at"] for s in snaps)

    # time travel: v1 sees only the first commit's partitions
    m1 = cat.load("t", version=1)
    assert {e["partition_id"] for e in m1.partitions} == {0, 1}
    assert m1.props["n_shards"] == 2
    # current pointer == newest snapshot
    assert cat.load("t").partitions == cat.load("t", version=3).partitions


def test_missing_snapshot_raises(tmp_path):
    cat = ManifestCatalog(str(tmp_path))
    cat.commit("t", [_entry(0)])
    with pytest.raises(FileNotFoundError, match="no snapshot v9"):
        cat.load("t", version=9)
    assert cat.snapshots("nonexistent") == []


def test_expire_snapshots_keeps_newest(tmp_path):
    cat = ManifestCatalog(str(tmp_path))
    for i in range(5):
        cat.commit("t", [_entry(i)])
    assert cat.expire_snapshots("t", keep_last=2) == 3
    assert [s["version"] for s in cat.snapshots("t")] == [4, 5]
    # current pointer untouched; expired versions now raise
    assert cat.load("t").version == 5
    with pytest.raises(FileNotFoundError):
        cat.load("t", version=1)
    # idempotent
    assert cat.expire_snapshots("t", keep_last=2) == 0


def test_build_accrues_snapshots(spark, tmp_path, documents):
    """A real build leaves a queryable snapshot trail for the shards
    table (per-partition lineage as of each commit)."""
    from es_loaders_spark import build as b

    idx = str(tmp_path / "idx")
    b.build_index(spark, documents, idx, n_shards=2)
    cat = ManifestCatalog(idx)
    v_after_build = [s["version"] for s in cat.snapshots("shards")]
    assert v_after_build, "build must commit at least one shards snapshot"
    assert cat.load("shards", version=v_after_build[-1]).partitions


def test_commit_auto_expires_to_retention(tmp_path):
    cat = ManifestCatalog(str(tmp_path), snapshot_retention=3)
    for i in range(6):
        cat.commit("t", [_entry(i)])
    assert [s["version"] for s in cat.snapshots("t")] == [4, 5, 6]
    assert cat.load("t").version == 6


def test_retention_zero_keeps_no_history(tmp_path):
    cat = ManifestCatalog(str(tmp_path), snapshot_retention=0)
    cat.commit("t", [_entry(0)])
    assert cat.snapshots("t") == []
    assert cat.load("t").version == 1  # current pointer unaffected


def test_index_stats_metadata(spark, web_pages, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from es_loaders_spark.build import build_index
    from es_loaders_spark.catalog import index_stats
    from es_loaders_spark.deletes import delete_ids

    docs = (
        web_pages
        .withColumn("doc_id", F.row_number().over(Window.orderBy("url")) - 1)
        .select("doc_id", "text")
    )
    idx = str(tmp_path / "st_idx")
    build_index(spark, docs, idx, n_shards=4)
    st = index_stats(idx)
    assert st["n_docs"] == 400 and st["generations"] == 1
    assert not st["has_tombstones"]
    assert st["tables"]["shards"]["bytes"] > 0
    assert st["tables"]["shards"]["parquet_files"] > 0
    delete_ids(spark, idx, spark.createDataFrame([(0,)], "doc_id long"))
    assert index_stats(idx)["has_tombstones"]
    import pytest as _pt

    with _pt.raises(FileNotFoundError):
        index_stats(str(tmp_path / "nope"))
