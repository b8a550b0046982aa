"""Round-5 wave C: scroll (keyset cursor), PIT (point-in-time search),
completion and phrase suggesters."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from es_loaders_spark import dsl


class TestScroll:
    def test_pages_tile_exactly(self, spark, documents):
        pages = list(dsl.scroll(spark, documents, {
            "query": {"term": {"lang": "en"}},
            "sort": [{"n_chars": "desc"}],
            "size": 50,
        }))
        flat = [r.doc_id for p in pages for r in p]
        want = [
            r.doc_id
            for r in documents.filter("lang='en'")
            .orderBy(F.desc("n_chars"), F.asc("doc_id"))
            .collect()
        ]
        assert flat == want
        assert all(len(p) == 50 for p in pages[:-1])
        assert 0 < len(pages[-1]) <= 50

    def test_scroll_without_sort_appends_id(self, spark, documents):
        pages = list(dsl.scroll(spark, documents, {
            "query": {"term": {"lang": "de"}}, "size": 40,
        }))
        flat = [r.doc_id for p in pages for r in p]
        want = [r.doc_id for r in documents.filter("lang='de'")
                .orderBy("doc_id").collect()]
        assert flat == want

    def test_empty_result_yields_nothing(self, spark, documents):
        assert list(dsl.scroll(spark, documents, {
            "query": {"term": {"lang": "xx"}}, "size": 10})) == []


@pytest.fixture(scope="module")
def pit_index(spark, documents, tmp_path_factory):
    from es_loaders_spark.build import append_documents, build_index
    from es_loaders_spark.wand import topk

    d = str(tmp_path_factory.mktemp("pit_idx"))
    build_index(spark, documents.filter(F.col("doc_id") < 300), d, n_shards=4)
    pit = dsl.open_pit(d)
    pre = [
        (r["doc_id"], r["score"])
        for r in topk(spark, d, "spark query data", k=15).collect()
    ]
    append_documents(spark, documents.filter(F.col("doc_id") >= 300), d)
    return d, pit, pre


class TestPit:
    def test_pit_reproduces_pre_append_results(self, spark, documents, pit_index):
        d, pit, pre = pit_index
        body = {
            "pit": pit,
            "query": {"match": {"text": "spark query data"}},
            "size": 15,
        }
        got = [
            (r["doc_id"], r["score"])
            for r in dsl.search(spark, documents, body, index_dir=d).collect()
        ]
        assert got == pre

    def test_fresh_pit_sees_appends(self, spark, documents, pit_index):
        from es_loaders_spark.wand import topk

        d, _, pre = pit_index
        body = {
            "pit": dsl.open_pit(d),
            "query": {"match": {"text": "spark query data"}},
            "size": 15,
        }
        got = [
            (r["doc_id"], r["score"])
            for r in dsl.search(spark, documents, body, index_dir=d).collect()
        ]
        live = [
            (r["doc_id"], r["score"])
            for r in topk(spark, d, "spark query data", k=15).collect()
        ]
        assert got == live and got != pre

    def test_malformed_pit_refuses(self, spark, documents, pit_index):
        d, _, _ = pit_index
        with pytest.raises(ValueError, match="malformed pit"):
            dsl.search(spark, documents, {
                "pit": {"id": "bogus"},
                "query": {"match": {"text": "spark"}},
            }, index_dir=d)

    def test_pit_requires_index_dir(self, spark, documents):
        with pytest.raises(ValueError, match="index_dir"):
            dsl.search(spark, documents, {
                "pit": {"id": "gen-1"},
                "query": {"match": {"text": "spark"}},
            })


class TestCompletionSuggester:
    def test_prefix_completions_ranked_by_freq(self, spark, documents):
        out = dsl.suggest(spark, documents, {
            "c": {"prefix": "s", "completion": {"size": 4}}})
        rows = out.collect()
        assert len(rows) == 4
        freqs = [r.freq for r in rows]
        assert freqs == sorted(freqs, reverse=True)
        assert all(r.option.startswith("s") for r in rows)
        assert all(r.distance == 0 for r in rows)

    def test_mixes_with_term_suggester(self, spark, documents):
        out = dsl.suggest(spark, documents, {
            "c": {"prefix": "s", "completion": {"size": 2}},
            "t": {"text": "spork", "term": {"size": 2}},
        })
        kinds = {r.suggester for r in out.collect()}
        assert kinds == {"c", "t"}

    def test_empty_prefix_refuses(self, spark, documents):
        with pytest.raises(ValueError, match="prefix"):
            dsl.suggest(spark, documents, {"c": {"completion": {}}})


class TestPhraseSuggester:
    def test_corrects_against_python_lm_reference(self, spark, documents):
        """Independent recomputation: rebuild the bigram LM in plain
        Python over the collected token stream and verify the top
        correction and its score."""
        from collections import Counter

        from es_loaders_spark.analyze import tokens_df

        out = dsl.suggest(spark, documents, {
            "dym": {"text": "spqrk merje", "phrase": {"size": 3}}})
        rows = out.collect()
        assert rows and rows[0].option == "spark merge"

        toks = tokens_df(documents).orderBy("doc_id", "pos").collect()
        uni: Counter = Counter(r.term for r in toks)
        big: Counter = Counter()
        prev = {}
        for r in toks:
            key = (r.doc_id,)
            if key in prev and prev[key][1] == r.pos - 1:
                big[(prev[key][0], r.term)] += 1
            prev[key] = (r.term, r.pos)
        v, t = len(uni), sum(uni.values())
        w0, w1 = "spark", "merge"
        want = math.log((uni[w0] + 1) / (t + v)) + math.log(
            (big[(w0, w1)] + 1) / (uni[w0] + v)
        )
        assert abs(rows[0].score - round(want, 6)) < 1e-6

    def test_excludes_the_input_phrase(self, spark, documents):
        out = dsl.suggest(spark, documents, {
            "dym": {"text": "spark merge", "phrase": {"size": 5}}})
        assert all(r.option != "spark merge" for r in out.collect())

    def test_mixed_with_term_refuses(self, spark, documents):
        with pytest.raises(ValueError, match="mixed"):
            dsl.suggest(spark, documents, {
                "p": {"text": "a b", "phrase": {}},
                "t": {"text": "a", "term": {}},
            })

    def test_token_count_bounds(self, spark, documents):
        with pytest.raises(ValueError, match="2-4"):
            dsl.suggest(spark, documents, {
                "p": {"text": "one", "phrase": {}}})
