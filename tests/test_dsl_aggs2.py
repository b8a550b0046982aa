"""Round-5 agg wave: multi_terms, rare_terms, date_range,
auto_date_histogram, global, sampler/diversified_sampler,
median_absolute_deviation, string_stats, boxplot, top_metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from es_loaders_spark import dsl


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").cache()


def test_multi_terms_matches_manual_topn(spark, events):
    body = {"size": 0, "aggs": {"mt": {"multi_terms": {
        "terms": [{"field": "event_type"}, {"field": "user_id"}],
        "size": 5,
    }}}}
    got = dsl.search(spark, events, body).collect()
    want = (
        events.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("event_type"), F.asc("user_id"))
        .limit(5)
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_multi_terms_sub_agg_per_tuple_bucket(spark, events):
    body = {"size": 0, "aggs": {"mt": {"multi_terms": {
        "terms": [{"field": "event_type"}, {"field": "user_id"}], "size": 3,
    }, "aggs": {"m": {"avg": {"field": "value"}}}}}}
    out = dsl.search(spark, events, body)
    assert set(out.columns) == {"event_type", "user_id", "value", "doc_count"}
    assert out.count() == 3


def test_rare_terms_is_the_long_tail(spark, events):
    body = {"size": 0, "aggs": {"rt": {"rare_terms": {
        "field": "user_id", "max_doc_count": 2}}}}
    got = {(r.user_id, r.doc_count) for r in dsl.search(spark, events, body).collect()}
    want = {
        (r.user_id, r.doc_count)
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .filter("doc_count <= 2")
        .collect()
    }
    assert got == want
    assert all(c <= 2 for _, c in got)


def test_date_range_buckets_overlap_and_open_ends(spark, events):
    body = {"size": 0, "aggs": {"dr": {"date_range": {
        "field": "ts",
        "ranges": [
            {"to": "2024-01-15"},
            {"from": "2024-01-10", "to": "2024-01-20"},
            {"from": "2024-01-15"},
        ],
    }}}}
    rows = {r.dr_key: r.doc_count for r in dsl.search(spark, events, body).collect()}
    n = events.count()
    assert rows["*-2024-01-15"] + rows["2024-01-15-*"] == n
    overlap = events.filter(
        (F.col("ts") >= "2024-01-10") & (F.col("ts") < "2024-01-20")
    ).count()
    assert rows["2024-01-10-2024-01-20"] == overlap


def test_auto_date_histogram_picks_smallest_fitting_unit(spark, events):
    out = dsl.search(spark, events, {"size": 0, "aggs": {"adh": {
        "auto_date_histogram": {"field": "ts", "buckets": 40}}}})
    rows = out.collect()
    assert rows[0]["adh_interval"] == "day"  # ~30-day span, 40 buckets
    assert len(rows) <= 40
    # tighter budget → coarser unit
    out2 = dsl.search(spark, events, {"size": 0, "aggs": {"adh": {
        "auto_date_histogram": {"field": "ts", "buckets": 5}}}})
    assert out2.first()["adh_interval"] in ("week", "month")
    assert out2.count() <= 5


def test_global_escapes_the_query_filter(spark, events):
    body = {
        "query": {"term": {"event_type": "click"}},
        "size": 0,
        "aggs": {"all": {"global": {}, "aggs": {
            "m": {"avg": {"field": "value"}}}}},
    }
    got = dsl.search(spark, events, body).first()["value"]
    want = events.agg(F.avg("value")).first()[0]
    assert got == want


def test_sampler_deterministic_prefix(spark, events):
    body = {"size": 0, "aggs": {"s": {"sampler": {"shard_size": 100},
        "aggs": {"m": {"sum": {"field": "value"}}}}}}
    got = dsl.search(spark, events, body, id_col="event_id").first()["value"]
    want = (
        events.orderBy("event_id").limit(100).agg(F.sum("value")).first()[0]
    )
    assert got == want


def test_diversified_sampler_caps_per_value(spark, events):
    body = {"size": 0, "aggs": {"s": {"diversified_sampler": {
        "shard_size": 50, "field": "event_type", "max_docs_per_value": 5},
        "aggs": {"m": {"value_count": {"field": "value"}}}}}}
    got = dsl.search(spark, events, body, id_col="event_id").first()["value"]
    # ≤ 5 per event_type before the size cap; with few types the cap
    # binds at 5 × n_types
    n_types = events.select("event_type").distinct().count()
    assert got == min(50, 5 * n_types)


def test_sampler_without_id_col_refuses(spark, events):
    with pytest.raises(ValueError, match="id_col"):
        dsl.search(spark, events, {"size": 0, "aggs": {
            "s": {"sampler": {}, "aggs": {"m": {"avg": {"field": "value"}}}}}})


def test_mad_global_and_per_bucket(spark, events):
    import numpy as np

    vals = np.array([r.value for r in events.select("value").collect()])
    want = float(np.median(np.abs(vals - np.median(vals))))
    got = dsl.search(spark, events, {"size": 0, "aggs": {
        "m": {"median_absolute_deviation": {"field": "value"}}}}).first()
    assert abs(got["value"] - want) < 1e-9
    assert got["doc_count"] == len(vals)
    per = dsl.search(spark, events, {"size": 0, "aggs": {
        "by": {"terms": {"field": "event_type", "size": 10},
               "aggs": {"m": {"median_absolute_deviation": {"field": "value"}}}}}})
    rows = {r.event_type: r.value for r in per.collect()}
    one = [r.value for r in events.filter("event_type = 'click'")
           .select("value").collect()]
    v = np.array(one)
    assert abs(rows["click"] - float(np.median(np.abs(v - np.median(v))))) < 1e-9


def test_string_stats_lengths_and_entropy(spark, documents):
    import math
    from collections import Counter

    out = dsl.search(spark, documents, {"size": 0, "aggs": {
        "ss": {"string_stats": {"field": "lang"}}}}).first()
    langs = [r.lang for r in documents.select("lang").collect()]
    lens = [len(x) for x in langs]
    assert out["count"] == len(langs)
    assert out["min_length"] == min(lens)
    assert out["max_length"] == max(lens)
    assert abs(out["avg_length"] - sum(lens) / len(lens)) < 1e-9
    chars = Counter("".join(langs))
    t = sum(chars.values())
    want = -sum((c / t) * math.log2(c / t) for c in chars.values())
    assert abs(out["entropy"] - want) < 1e-9


def test_boxplot_quartiles_exact(spark, events):
    import numpy as np

    out = dsl.search(spark, events, {"size": 0, "aggs": {
        "bx": {"boxplot": {"field": "value"}}}}).first()
    vals = np.array([r.value for r in events.select("value").collect()])
    for k, q in (("q1", 25), ("q2", 50), ("q3", 75)):
        assert abs(out[k] - float(np.percentile(vals, q))) < 1e-9
    assert out["min"] == float(vals.min()) and out["max"] == float(vals.max())


def test_top_metrics_latest_value_with_tiebreak(spark, events):
    out = dsl.search(spark, events, {"size": 0, "aggs": {
        "by": {"terms": {"field": "event_type", "size": 10},
               "aggs": {"tm": {"top_metrics": {
                   "metrics": [{"field": "value"}],
                   "sort": [{"ts": "desc"}]}}}}}}, id_col="event_id")
    rows = {r.event_type: r.value for r in out.collect()}
    w = (
        events.withColumn(
            "_rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("event_type")
                .orderBy(F.desc("ts"), F.asc("event_id"))
            ),
        )
        .filter("_rn = 1")
        .collect()
    )
    for r in w:
        assert rows[r.event_type] == r.value


def test_top_metrics_size_gt_1_refuses(spark, events):
    with pytest.raises(ValueError, match="size=1"):
        dsl.search(spark, events, {"size": 0, "aggs": {
            "tm": {"top_metrics": {"metrics": [{"field": "value"}],
                                   "sort": [{"ts": "desc"}], "size": 3}}}},
                   id_col="event_id")
