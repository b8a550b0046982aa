"""Physical-plan assertions: pushdown, pruning, broadcast — the 100 TB story.

A plan that reads all columns for a 2-column projection, or scans every
term row for a 3-term query, is wrong at scale even if results match.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_parquet_filter_pushdown(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_quantity") < 10)
        .select("l_orderkey", "l_quantity")
    )
    plan = explain_str(df)
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,10.0)" in plan
    # column pruning: only the two projected columns in ReadSchema
    assert "l_extendedprice" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_index_term_scan_is_pushed_down(spark, documents, tmp_path_factory):
    from es_loaders_spark.build import build_index

    d = str(tmp_path_factory.mktemp("plan_idx"))
    build_index(spark, documents, d, n_shards=2)
    scan = spark.read.parquet(f"{d}/shards").filter(F.col("term").isin(["spark", "data"]))
    plan = explain_str(scan)
    assert "PushedFilters: [In(term" in plan, plan


def test_small_dim_join_broadcasts(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_orderkey", "p_brand"
    )
    plan = explain_str(joined)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .orderBy(F.desc("o_totalprice"))
        .limit(10)
    )
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan


def test_q1_uses_partial_aggregation(spark, sf_dir):
    from es_loaders_spark.queries import EXTRA_QUERIES, QUERIES

    # rotation-stable: the entry moves between the driver gate and the
    # local-gate EXTRA registry across rounds
    fn = QUERIES.get("groupby_sum_q1") or EXTRA_QUERIES["groupby_sum_q1"]
    plan = explain_str(fn(spark, sf_dir))
    # partial (map-side) + final hash aggregate pair, filter pushed to scan
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_scoring_scan_prunes_positions(spark, documents, tmp_path_factory):
    """The BM25 scoring path must NOT read pos_payload (phrase-only
    bytes). Cogroup path: wand's explicit column select reaches the
    parquet ReadSchema. Serve path: the per-task pyarrow read uses the
    explicit _SERVE_COLS list, which excludes pos_payload."""
    from es_loaders_spark.build import build_index
    from es_loaders_spark.wand import _SERVE_COLS, topk

    d = str(tmp_path_factory.mktemp("plan_pos_idx"))
    build_index(spark, documents, d, n_shards=2)
    plan = explain_str(topk(spark, d, "spark data", k=5, mode="cogroup"))
    read_schemas = [
        line for line in plan.splitlines() if "ReadSchema" in line and "docs_payload" in line
    ]
    assert read_schemas, "expected an index scan with payload columns"
    for line in read_schemas:
        assert "pos_payload" not in line, line
    assert "pos_payload" not in _SERVE_COLS and "docs_payload" in _SERVE_COLS


def test_dedup_fingerprints_need_no_key_shuffle(spark, sf_dir):
    """MinHash signatures and SimHash fingerprints are row-local (array
    HOFs over the corpus scan): no hash/range Exchange anywhere — the
    100-TB property that lets them run at ingest with no keyed data
    movement. (A leading round-robin spread is permitted: it only fires
    when the scan has fewer splits than cores, a small-input artifact.)"""
    from es_loaders_spark.dedup import minhash_signatures, simhash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for df in (minhash_signatures(docs), simhash(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString().lower()
        assert "hashpartitioning" not in plan, plan
        assert "rangepartitioning" not in plan, plan
    # and once the input is as parallel as the cluster, the plan is pure
    # map-only: zero Exchange of any kind
    import tempfile

    wide_dir = tempfile.mkdtemp(prefix="dedup_wide_")
    docs.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(wide_dir)
    wide = spark.read.parquet(wide_dir)
    for df in (minhash_signatures(wide), simhash(wide)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
