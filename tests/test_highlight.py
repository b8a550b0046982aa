"""Highlighting (highlight.py): tags, fragments, phrase mode, DSL wiring."""

from __future__ import annotations

import pytest

from es_loaders_spark import dsl
from es_loaders_spark.highlight import highlight_expr


@pytest.fixture(scope="module")
def hdocs(spark):
    rows = [
        (0, "Spark streams the data; spark STREAMS again"),
        (1, "no relevant terms here"),
        (2, "sparkle is not spark but Spark Stream is a phrase"),
        (3, "the data stream"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def _hl(hdocs, **kw):
    return {
        r["doc_id"]: r["h"]
        for r in hdocs.select("doc_id", highlight_expr("text", **kw).alias("h")).collect()
    }


def test_whole_field_tags_and_case(hdocs):
    got = _hl(hdocs, terms=["spark", "stream"])
    # every occurrence wrapped, ORIGINAL casing kept, token boundaries
    # respected ('sparkle'/'streams' untouched)
    assert got[0] == "<em>Spark</em> streams the data; <em>spark</em> STREAMS again"
    assert got[1] is None
    assert got[2] == "sparkle is not <em>spark</em> but <em>Spark</em> <em>Stream</em> is a phrase"


def test_custom_tags(hdocs):
    got = _hl(hdocs, terms=["data"], pre_tag="[", post_tag="]")
    assert got[0] == "Spark streams the [data]; spark STREAMS again"


def test_phrase_mode_contiguous_only(hdocs):
    got = _hl(hdocs, terms=["spark", "stream"], phrase=True)
    # only the contiguous 'Spark Stream' span; doc 0 has the terms but
    # never adjacent
    assert got[0] is None
    assert got[2] == "sparkle is not spark but <em>Spark Stream</em> is a phrase"
    # separator between phrase terms is the analyzer class, any run
    got3 = _hl(hdocs, terms=["data", "stream"], phrase=True)
    assert got3[3] == "the <em>data stream</em>"


def test_first_fragment_window(hdocs):
    got = _hl(hdocs, terms=["stream"], number_of_fragments=1, fragment_size=12)
    # 'streams' is not the token 'stream' → doc 0 has no hit at all
    assert got[0] is None
    # window starts AT the first match ('Stream' in doc 2), original case
    assert got[2] == "<em>Stream</em> is a "
    assert got[3] == "<em>stream</em>"
    raw = got[2].replace("<em>", "").replace("</em>", "")
    assert len(raw) <= 12
    with pytest.raises(ValueError, match="number_of_fragments"):
        _hl(hdocs, terms=["stream"], number_of_fragments=3)


def test_dsl_match_phrase_highlight(spark, documents, tmp_path_factory):
    from es_loaders_spark.build import build_index

    d = str(tmp_path_factory.mktemp("hl_idx"))
    build_index(spark, documents, d, n_shards=2)
    body = {
        "query": {"match_phrase": {"text": "the data"}},
        "size": 5,
        "highlight": {"fields": {"text": {}}},
    }
    rows = dsl.search(spark, documents, body, index_dir=d).collect()
    assert rows
    for r in rows:
        assert "<em>" in r["highlight_text"]
        inner = r["highlight_text"].split("<em>")[1].split("</em>")[0]
        assert inner.lower().startswith("the")


def test_dsl_highlight_requires_scoring(spark, documents):
    body = {
        "query": {"term": {"lang": "en"}},
        "highlight": {"fields": {"text": {}}},
    }
    with pytest.raises(ValueError, match="scoring clause"):
        dsl.search(spark, documents, body)
