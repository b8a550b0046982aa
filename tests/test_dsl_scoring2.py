"""Round-5 third-wave scoring clauses: script_score, rank_feature,
terms_set, span_near / intervals, match_bool_prefix."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from es_loaders_spark import dsl


def _ids(df):
    return [r.doc_id for r in df.collect()]


class TestScriptScore:
    def test_score_and_doc_field_arithmetic(self, spark, documents):
        base = {"query": {"match": {"text": "spark merge"}}, "size": 500}
        base_scores = {
            r.doc_id: r.score
            for r in dsl.search(spark, documents, base).collect()
        }
        body = {
            "query": {
                "script_score": {
                    "query": {"match": {"text": "spark merge"}},
                    "script": {"source": "_score * 2"},
                }
            },
            "size": 500,
        }
        out = dsl.search(spark, documents, body).collect()
        assert out
        # doubling preserves membership; spot-check the arithmetic on the
        # raw sums (2*round(x,4) can differ from round(2x,4) in the 4th
        # decimal, so compare loosely)
        for r in out:
            assert abs(r.score - 2 * base_scores[r.doc_id]) < 2e-4

    def test_match_all_base_with_params_and_funcs(self, spark, documents):
        body = {
            "query": {
                "script_score": {
                    "query": {"match_all": {}},
                    "script": {
                        "source": "Math.sqrt(doc['n_chars'].value) + params.b",
                        "params": {"b": 1},
                    },
                }
            },
            "size": 5,
        }
        top = dsl.search(spark, documents, body).collect()
        want = (
            documents.select(
                "doc_id",
                F.round(F.sqrt(F.col("n_chars").cast("double")) + 1, 4)
                .alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(5)
            .collect()
        )
        assert [(r.doc_id, r.score) for r in top] == [
            (r.doc_id, r.score) for r in want
        ]

    def test_unknown_name_raises(self, spark, documents):
        body = {
            "query": {
                "script_score": {
                    "query": {"match_all": {}},
                    "script": {"source": "nosuch + 1"},
                }
            }
        }
        with pytest.raises(ValueError, match="nosuch"):
            dsl.search(spark, documents, body).collect()


class TestRankFeature:
    def test_saturation_explicit_pivot(self, spark, documents):
        body = {
            "query": {
                "rank_feature": {
                    "field": "n_chars", "saturation": {"pivot": 200},
                }
            },
            "size": 5,
        }
        top = dsl.search(spark, documents, body).collect()
        want = (
            documents.filter("n_chars > 0")
            .select(
                "doc_id",
                F.round(
                    F.col("n_chars").cast("double")
                    / (F.col("n_chars") + F.lit(200.0)),
                    4,
                ).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(5)
            .collect()
        )
        assert [(r.doc_id, r.score) for r in top] == [
            (r.doc_id, r.score) for r in want
        ]

    def test_default_pivot_is_geometric_mean(self, spark, documents):
        import math

        body = {"query": {"rank_feature": {"field": "n_chars"}}, "size": 3}
        top = dsl.search(spark, documents, body).collect()
        m = documents.filter("n_chars > 0").agg(
            F.avg(F.log("n_chars"))
        ).first()[0]
        pivot = math.exp(m)
        row = documents.filter(
            F.col("doc_id") == top[0].doc_id
        ).first()
        assert top[0].score == round(
            row.n_chars / (row.n_chars + pivot), 4
        )

    def test_scores_are_in_unit_interval(self, spark, documents):
        body = {
            "query": {
                "rank_feature": {
                    "field": "n_chars", "saturation": {"pivot": 100},
                }
            },
            "size": 100,
        }
        for r in dsl.search(spark, documents, body).collect():
            assert 0.0 < r.score < 1.0


class TestTermsSet:
    def test_script_threshold(self, spark, documents):
        body = {
            "query": {
                "terms_set": {
                    "text": {
                        "terms": ["spark", "merge", "sort"],
                        "minimum_should_match_script": {"source": "3"},
                    }
                }
            },
            "size": 10000,
        }
        got = set(_ids(dsl.search(spark, documents, body)))
        # threshold == all terms → identical to match operator=and
        want = set(_ids(dsl.search(spark, documents, {
            "query": {"match": {"text": {
                "query": "spark merge sort", "operator": "and"}}},
            "size": 10000,
        })))
        assert got == want and got

    def test_msm_field_reads_per_doc_threshold(self, spark, documents):
        # synthesize the ES-native shape: a per-doc required_matches column
        docs2 = documents.withColumn(
            "required_matches",
            F.when(F.col("doc_id") % 2 == 0, F.lit(1)).otherwise(F.lit(3)),
        )
        body = {
            "query": {
                "terms_set": {
                    "text": {
                        "terms": ["spark", "merge", "sort"],
                        "minimum_should_match_field": "required_matches",
                    }
                }
            },
            "size": 10000,
        }
        out = dsl.search(spark, docs2, body)
        toks = set(_ids(out))
        assert toks
        # odd ids need all three; even ids need any one
        strict = set(_ids(dsl.search(spark, documents, {
            "query": {"match": {"text": {
                "query": "spark merge sort", "operator": "and"}}},
            "size": 10000})))
        loose = set(_ids(dsl.search(spark, documents, {
            "query": {"match": {"text": "spark merge sort"}},
            "size": 10000})))
        assert toks == {i for i in loose if i % 2 == 0} | {
            i for i in strict if i % 2 == 1
        }

    def test_needs_exactly_one_threshold(self, spark, documents):
        with pytest.raises(ValueError, match="exactly one"):
            dsl.search(spark, documents, {
                "query": {"terms_set": {"text": {"terms": ["a"]}}}
            })


class TestSpanNearIntervals:
    def test_in_order_is_subset_of_unordered(self, spark, documents):
        def run(in_order):
            return set(_ids(dsl.search(spark, documents, {
                "query": {"span_near": {
                    "clauses": [
                        {"span_term": {"text": "key"}},
                        {"span_term": {"text": "sort"}},
                    ],
                    "slop": 2, "in_order": in_order,
                }},
                "size": 10000,
            })))
        ordered, unordered = run(True), run(False)
        assert ordered and ordered <= unordered

    def test_slop_zero_in_order_equals_phrase_adjacency(self, spark, documents):
        from es_loaders_spark.analyze import tokens_df

        got = set(_ids(dsl.search(spark, documents, {
            "query": {"span_near": {
                "clauses": [
                    {"span_term": {"text": "the"}},
                    {"span_term": {"text": "data"}},
                ],
                "slop": 0, "in_order": True,
            }},
            "size": 10000,
        })))
        toks = tokens_df(documents)
        a = toks.filter("term = 'the'").select("doc_id", F.col("pos").alias("pa"))
        b = toks.filter("term = 'data'").select("doc_id", F.col("pos").alias("pb"))
        want = set(
            r.doc_id
            for r in a.join(b, "doc_id")
            .filter(F.col("pb") == F.col("pa") + 1)
            .select("doc_id").distinct().collect()
        )
        assert got == want

    def test_intervals_match_maps_to_proximity(self, spark, documents):
        got = set(_ids(dsl.search(spark, documents, {
            "query": {"intervals": {"text": {"match": {
                "query": "key sort", "max_gaps": 2, "ordered": True}}}},
            "size": 10000,
        })))
        want = set(_ids(dsl.search(spark, documents, {
            "query": {"span_near": {
                "clauses": [
                    {"span_term": {"text": "key"}},
                    {"span_term": {"text": "sort"}},
                ],
                "slop": 2, "in_order": True,
            }},
            "size": 10000,
        })))
        assert got == want

    def test_unlimited_gaps_refused(self, spark, documents):
        with pytest.raises(ValueError, match="max_gaps"):
            dsl.search(spark, documents, {
                "query": {"intervals": {"text": {"match": {"query": "a b"}}}}
            })

    def test_repeated_terms_refused(self, spark, documents):
        with pytest.raises(ValueError, match="repeated"):
            dsl.search(spark, documents, {
                "query": {"span_near": {"clauses": [
                    {"span_term": {"text": "the"}},
                    {"span_term": {"text": "the"}},
                ], "slop": 1}},
            })


class TestMatchBoolPrefix:
    def test_equals_query_string_with_trailing_star(self, spark, documents):
        a = dsl.search(spark, documents, {
            "query": {"match_bool_prefix": {"text": "spark cra"}}, "size": 20,
        }).collect()
        b = dsl.search(spark, documents, {
            "query": {"query_string": {"query": "spark cra*"}}, "size": 20,
        }).collect()
        assert [(r.doc_id, r.score) for r in a] == [
            (r.doc_id, r.score) for r in b
        ]

    def test_operator_and(self, spark, documents):
        out = dsl.search(spark, documents, {
            "query": {"match_bool_prefix": {"text": {
                "query": "spark cra", "operator": "and"}}},
            "size": 10000,
        })
        ids = set(_ids(out))
        both = dsl.search(spark, documents, {
            "query": {"query_string": {
                "query": "spark AND cra*"}},
            "size": 10000,
        })
        assert ids == set(_ids(both))


def test_span_near_index_served_matches_scan(spark, web_pages, tmp_path):
    from pyspark.sql.window import Window

    from es_loaders_spark.build import build_index

    docs = (
        web_pages
        .withColumn("doc_id", F.row_number().over(Window.orderBy("url")) - 1)
        .select("doc_id", "text")
        .cache()
    )
    idx = str(tmp_path / "span_idx")
    build_index(spark, docs, idx, n_shards=4)
    for body in (
        {"query": {"span_near": {"clauses": [
            {"span_term": {"text": "spark"}}, {"span_term": {"text": "crawl"}},
        ], "slop": 3, "in_order": True}}, "size": 10000},
        {"query": {"span_near": {"clauses": [
            {"span_term": {"text": "data"}}, {"span_term": {"text": "index"}},
        ], "slop": 2, "in_order": False}}, "size": 10000},
    ):
        scan = [r.doc_id for r in dsl.search(spark, docs, body).collect()]
        served = [r.doc_id
                  for r in dsl.search(spark, docs, body, index_dir=idx).collect()]
        assert scan == served and len(scan) > 0


def test_terms_set_index_served_matches_scan(spark, web_pages, tmp_path):
    from pyspark.sql.window import Window

    from es_loaders_spark.build import build_index

    docs = (
        web_pages
        .withColumn("doc_id", F.row_number().over(Window.orderBy("url")) - 1)
        .select("doc_id", "text", F.lit(2).alias("required"))
        .cache()
    )
    idx = str(tmp_path / "ts_idx")
    build_index(spark, docs, idx, n_shards=4)
    body = {"query": {"terms_set": {"text": {
        "terms": ["spark", "crawl", "index"],
        "minimum_should_match_field": "required",
    }}}, "size": 25}
    scan = [(r.doc_id, r.score) for r in dsl.search(spark, docs, body).collect()]
    served = [(r.doc_id, r.score)
              for r in dsl.search(spark, docs, body, index_dir=idx).collect()]
    assert scan == served and len(scan) > 0


def test_more_like_this_index_served_matches_scan(spark, web_pages, tmp_path):
    from pyspark.sql.window import Window

    from es_loaders_spark.build import build_index

    docs = (
        web_pages
        .withColumn("doc_id", F.row_number().over(Window.orderBy("url")) - 1)
        .select("doc_id", "text")
        .cache()
    )
    idx = str(tmp_path / "mlt_idx")
    build_index(spark, docs, idx, n_shards=4)
    body = {"query": {"more_like_this": {
        "like": {"doc_id": 7}, "max_query_terms": 20,
        "min_term_freq": 2, "min_doc_freq": 5}}, "size": 15}
    scan = [(r.doc_id, r.score)
            for r in dsl.more_like_this(spark, docs, body).collect()]
    served = [(r.doc_id, r.score)
              for r in dsl.more_like_this(spark, docs, body,
                                          index_dir=idx).collect()]
    assert scan == served and len(scan) > 0
