"""Index aliases: atomic cutover registry (aliases.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from es_loaders_spark.aliases import get_aliases, resolve_alias, update_aliases
from es_loaders_spark.build import build_index
from es_loaders_spark.wand import evict_index, topk


@pytest.fixture(scope="module")
def two_indexes(spark, web_pages, tmp_path_factory):
    base = tmp_path_factory.mktemp("alias")
    docs = (
        web_pages
        .withColumn("doc_id", F.row_number().over(Window.orderBy("url")) - 1)
        .select("doc_id", "text")
        .cache()
    )
    a, b = str(base / "idx_a"), str(base / "idx_b")
    build_index(spark, docs, a, n_shards=4)
    # the "reindexed" variant: an extra marker token in every doc
    build_index(
        spark, docs.withColumn("text", F.concat("text", F.lit(" zzznew"))),
        b, n_shards=4,
    )
    yield str(base / "reg"), a, b
    evict_index(a)
    evict_index(b)


def test_alias_add_resolve_and_pass_through(two_indexes):
    reg, a, b = two_indexes
    update_aliases(reg, [{"add": {"alias": "web", "index": a}}])
    assert resolve_alias(reg, "web") == a
    assert resolve_alias(reg, a) == a  # index dirs pass through
    with pytest.raises(KeyError):
        resolve_alias(reg, "nope")


def test_alias_atomic_cutover_flips_query_results(spark, two_indexes):
    reg, a, b = two_indexes
    update_aliases(reg, [{"add": {"alias": "live", "index": a}}])
    before = topk(spark, resolve_alias(reg, "live"), "zzznew", k=5).count()
    assert before == 0  # old index has no marker token
    # the ES cutover shape: remove + add in ONE action list
    update_aliases(reg, [
        {"remove": {"alias": "live", "index": a}},
        {"add": {"alias": "live", "index": b}},
    ])
    after = topk(spark, resolve_alias(reg, "live"), "zzznew", k=5).count()
    assert after == 5


def test_alias_swap_requires_remove_in_same_batch(two_indexes):
    reg, a, b = two_indexes
    update_aliases(reg, [{"add": {"alias": "x", "index": a}}])
    with pytest.raises(ValueError, match="remove it in the same actions"):
        update_aliases(reg, [{"add": {"alias": "x", "index": b}}])
    # failed batch must not have modified anything (all-or-nothing)
    assert get_aliases(reg)["x"] == a


def test_alias_batch_is_all_or_nothing(two_indexes):
    reg, a, b = two_indexes
    snapshot = get_aliases(reg)
    with pytest.raises(ValueError, match="does not exist"):
        update_aliases(reg, [
            {"add": {"alias": "y", "index": b}},
            {"remove": {"alias": "never-there"}},
        ])
    assert get_aliases(reg) == snapshot  # the valid add did NOT land


def test_alias_rejects_unbuilt_target(two_indexes, tmp_path):
    reg, a, b = two_indexes
    with pytest.raises(ValueError, match="not a built index"):
        update_aliases(reg, [{"add": {"alias": "z", "index": str(tmp_path)}}])
