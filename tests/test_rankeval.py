"""_rank_eval: batch search-quality metrics (rankeval.py), verified
against an independent plain-Python recomputation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from es_loaders_spark.build import build_index
from es_loaders_spark.rankeval import rank_eval
from es_loaders_spark.wand import evict_index, topk_batch


@pytest.fixture(scope="module")
def re_index(spark, web_pages, tmp_path_factory):
    docs = (
        web_pages
        .withColumn("doc_id", F.row_number().over(Window.orderBy("url")) - 1)
        .select("doc_id", "text")
        .cache()
    )
    idx = str(tmp_path_factory.mktemp("re") / "idx")
    build_index(spark, docs, idx, n_shards=4)
    yield idx
    evict_index(idx)


def _requests(spark, idx, k):
    # ratings derived from the engine's own results so relevance is
    # non-trivial: for q0 rate ranks 1,3,5 relevant; q1 ranks 2,4; q2 none
    queries = {"q0": "spark index crawl", "q1": "the data page", "q2": "spark merge"}
    hits = {qid: [] for qid in queries}
    for r in topk_batch(spark, idx, queries, k=k).collect():
        hits[r.query_id].append(r.doc_id)
    reqs = []
    rated_ranks = {"q0": [0, 2, 4], "q1": [1, 3], "q2": []}
    for qid, q in queries.items():
        ratings = [{"_id": hits[qid][i], "rating": 2 if i == 0 else 1}
                   for i in rated_ranks[qid] if i < len(hits[qid])]
        # plus one rated doc that is NOT in the top-k (recall denominator)
        if qid == "q1":
            ratings.append({"_id": 999999, "rating": 1})
        reqs.append({"id": qid, "request": {"query": {"match": {"text": q}}},
                     "ratings": ratings})
    return reqs, hits, rated_ranks


def test_precision_recall_mrr_against_python(spark, re_index):
    k = 10
    reqs, hits, rated = _requests(spark, re_index, k)
    rated_ids = {r["id"]: {x["_id"] for x in r["ratings"]} for r in reqs}

    p, per = rank_eval(spark, re_index, reqs, {"precision": {"k": k}})
    # ES Precision divides by the RETRIEVED count (<= k), not by k
    want_p = {qid: len([i for i in rated[qid] if i < len(hits[qid])])
              / max(1, len(hits[qid]))
              for qid in hits}
    got_p = {r.query_id: r.metric_score for r in per.collect()}
    assert got_p == pytest.approx(want_p, abs=1e-6)
    assert p == pytest.approx(sum(want_p.values()) / 3, abs=1e-6)

    rcl, per_r = rank_eval(spark, re_index, reqs, {"recall": {"k": k}})
    got_r = {r.query_id: r.metric_score for r in per_r.collect()}
    assert got_r["q0"] == pytest.approx(1.0)          # all 3 rated found
    assert got_r["q1"] == pytest.approx(2.0 / 3.0)    # 999999 never returned
    assert got_r["q2"] == 0.0                          # no relevant ratings

    mrr, per_m = rank_eval(
        spark, re_index, reqs, {"mean_reciprocal_rank": {"k": k}})
    got_m = {r.query_id: r.metric_score for r in per_m.collect()}
    assert got_m["q0"] == pytest.approx(1.0)      # rank 1 rated
    assert got_m["q1"] == pytest.approx(0.5)      # first rated at rank 2
    assert got_m["q2"] == 0.0


def test_dcg_and_ndcg_against_python(spark, re_index):
    k = 10
    reqs, hits, rated = _requests(spark, re_index, k)
    dcg, per = rank_eval(spark, re_index, reqs, {"dcg": {"k": k}})
    got = {r.query_id: r.metric_score for r in per.collect()}
    # independent recomputation for q0: gains at ranks 1,3,5 with
    # ratings 2,1,1
    want_q0 = ((2**2 - 1) / math.log2(2) + (2**1 - 1) / math.log2(4)
               + (2**1 - 1) / math.log2(6))
    assert got["q0"] == pytest.approx(want_q0, abs=1e-5)
    assert got["q2"] == 0.0

    ndcg, per_n = rank_eval(
        spark, re_index, reqs, {"dcg": {"k": k, "normalize": True}})
    got_n = {r.query_id: r.metric_score for r in per_n.collect()}
    # q0 ideal: ratings [2,1,1] at ranks 1,2,3
    idcg_q0 = ((2**2 - 1) / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4))
    assert got_n["q0"] == pytest.approx(want_q0 / idcg_q0, abs=1e-5)
    assert 0.0 <= got_n["q1"] <= 1.0 and got_n["q2"] == 0.0


def test_rank_eval_rejects_non_match(spark, re_index):
    with pytest.raises(ValueError, match="only match"):
        rank_eval(spark, re_index,
                  [{"id": "x", "request": {"query": {"term": {"text": "a"}}},
                    "ratings": []}],
                  {"precision": {}})
