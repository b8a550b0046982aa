"""Parent/child join-field queries: has_child / has_parent / parent_id
and the children agg (dsl._parent_child_query)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from es_loaders_spark import dsl


@pytest.fixture(scope="module")
def qa_docs(spark):
    # questions (parents) + answers (children), ES join-field style
    rows = [
        Row(doc_id=1, join_name="question", join_parent=None,
            topic="spark", votes=0),
        Row(doc_id=2, join_name="question", join_parent=None,
            topic="duck", votes=0),
        Row(doc_id=3, join_name="question", join_parent=None,
            topic="spark", votes=0),
        Row(doc_id=10, join_name="answer", join_parent=1, topic=None, votes=5),
        Row(doc_id=11, join_name="answer", join_parent=1, topic=None, votes=1),
        Row(doc_id=12, join_name="answer", join_parent=2, topic=None, votes=9),
        Row(doc_id=13, join_name="answer", join_parent=3, topic=None, votes=0),
    ]
    return spark.createDataFrame(rows).cache()


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_has_child_with_query_and_min_children(spark, qa_docs):
    body = {"query": {"has_child": {
        "type": "answer", "query": {"range": {"votes": {"gte": 2}}}}},
        "sort": [{"doc_id": "asc"}], "size": 10, "_source": ["doc_id"]}
    assert _ids(dsl.search(spark, qa_docs, body)) == [1, 2]
    body2 = {"query": {"has_child": {"type": "answer", "min_children": 2}},
             "sort": [{"doc_id": "asc"}], "size": 10, "_source": ["doc_id"]}
    assert _ids(dsl.search(spark, qa_docs, body2)) == [1]
    body3 = {"query": {"has_child": {"type": "answer", "max_children": 1}},
             "sort": [{"doc_id": "asc"}], "size": 10, "_source": ["doc_id"]}
    assert _ids(dsl.search(spark, qa_docs, body3)) == [2, 3]


def test_has_parent_and_parent_id(spark, qa_docs):
    body = {"query": {"has_parent": {
        "parent_type": "question", "query": {"term": {"topic": "spark"}}}},
        "sort": [{"doc_id": "asc"}], "size": 10, "_source": ["doc_id"]}
    assert _ids(dsl.search(spark, qa_docs, body)) == [10, 11, 13]
    body2 = {"query": {"parent_id": {"type": "answer", "id": 1}},
             "sort": [{"doc_id": "asc"}], "size": 10, "_source": ["doc_id"]}
    assert _ids(dsl.search(spark, qa_docs, body2)) == [10, 11]


def test_children_agg_under_terms(spark, qa_docs):
    # per-topic (parent bucket): children's vote stats
    body = {"size": 0,
            "query": {"term": {"join_name": "question"}},
            "aggs": {"by_topic": {"terms": {"field": "topic", "size": 10},
                                  "aggs": {"ans": {"children": {"type": "answer"},
                                                   "aggs": {"v": {"sum": {"field": "votes"}}}}}}}}
    rows = sorted(tuple(r) for r in dsl.search(spark, qa_docs, body).collect())
    # spark: answers 10,11,13 votes 5+1+0=6, count 3; duck: answer 12 votes 9
    assert rows == [("duck", 9, 1), ("spark", 6, 3)]


def test_children_agg_plain_count(spark, qa_docs):
    body = {"size": 0, "query": {"term": {"topic": "spark"}},
            "aggs": {"n": {"children": {"type": "answer"}}}}
    assert dsl.search(spark, qa_docs, body).collect()[0].doc_count == 3


def test_has_child_matches_duckdb_exists(spark, qa_docs):
    con = duckdb.connect()
    con.register("t", qa_docs.toPandas())
    want = [r[0] for r in con.execute(
        "SELECT doc_id FROM t p WHERE EXISTS (SELECT 1 FROM t c WHERE "
        "c.join_name='answer' AND c.join_parent=p.doc_id AND c.votes>=2) "
        "ORDER BY 1").fetchall()]
    body = {"query": {"has_child": {
        "type": "answer", "query": {"range": {"votes": {"gte": 2}}}}},
        "sort": [{"doc_id": "asc"}], "size": 10, "_source": ["doc_id"]}
    assert _ids(dsl.search(spark, qa_docs, body)) == want
