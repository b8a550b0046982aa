"""Round-6c surface: post_filter / min_score / track_total_hits search
body features, sliced scroll, and the matrix_stats / t_test /
percentiles_bucket / normalize aggs.

Reference parity targets: the ES request-body features the loaders'
users reach beyond the loaders' own calls (mira/elasticsearch.py builds
plain bodies; these keys are standard ES search-body surface).
"""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from es_loaders_spark import dsl


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").cache()


# ---------------------------------------------------------------- post_filter

def test_post_filter_scores_match_unfiltered(spark, documents):
    """post_filter never changes scores: every hit of the post-filtered
    page carries the same score the unfiltered query gives that doc."""
    q = {"match": {"text": "spark merge table"}}
    base = {r.doc_id: r.score for r in dsl.search(
        spark, documents, {"query": q, "size": 500}).collect()}
    out = dsl.search(spark, documents, {
        "query": q, "post_filter": {"term": {"lang": "en"}}, "size": 10,
    }).collect()
    langs = {r.doc_id: r.lang for r in documents.select("doc_id", "lang").collect()}
    assert out, "post-filtered page came back empty"
    for r in out:
        assert langs[r.doc_id] == "en"
        assert r.score == base[r.doc_id]


def test_post_filter_equals_bool_filter_here(spark, documents):
    """With size:0 aggs refused, post_filter ≡ bool.filter for hits."""
    a = dsl.search(spark, documents, {
        "query": {"match": {"text": "spark merge"}},
        "post_filter": {"range": {"n_chars": {"gte": 200}}},
        "size": 15,
    }).collect()
    b = dsl.search(spark, documents, {
        "query": {"bool": {
            "must": [{"match": {"text": "spark merge"}}],
            "filter": [{"range": {"n_chars": {"gte": 200}}}],
        }},
        "size": 15,
    }).collect()
    assert [(r.doc_id, r.score) for r in a] == [(r.doc_id, r.score) for r in b]


def test_post_filter_refused_with_aggs_and_knn(spark, documents):
    with pytest.raises(ValueError, match="post_filter"):
        dsl.search(spark, documents, {
            "size": 0,
            "aggs": {"l": {"terms": {"field": "lang"}}},
            "post_filter": {"term": {"lang": "en"}},
        })
    with pytest.raises(ValueError, match="post_filter"):
        dsl.search(spark, documents, {
            "knn": {"field": "v", "query_vector": [1.0], "k": 3},
            "post_filter": {"term": {"lang": "en"}},
        })


# ----------------------------------------------------------------- min_score

def test_min_score_prefix_of_page(spark, documents):
    full = dsl.search(spark, documents, {
        "query": {"match": {"text": "spark merge table"}}, "size": 20,
    }).collect()
    thr = full[4].score  # keep exactly the hits scoring >= the 5th score
    kept = dsl.search(spark, documents, {
        "query": {"match": {"text": "spark merge table"}},
        "min_score": thr, "size": 20,
    }).collect()
    want = [(r.doc_id, r.score) for r in full if r.score >= thr]
    assert [(r.doc_id, r.score) for r in kept] == want


def test_min_score_refused_on_filter_context(spark, documents):
    with pytest.raises(ValueError, match="min_score"):
        dsl.search(spark, documents, {
            "query": {"term": {"lang": "en"}}, "min_score": 0.5, "size": 5,
        })


def test_min_score_refused_on_unscored_clause(spark, documents):
    # span_near pages by doc_id without scores — a silent min_score
    # no-op would be wrong
    with pytest.raises(ValueError, match="min_score"):
        dsl.search(spark, documents, {
            "query": {"span_near": {
                "clauses": [{"span_term": {"text": "key"}},
                            {"span_term": {"text": "sort"}}],
                "slop": 2, "in_order": True, "serve": "scan",
            }},
            "min_score": 0.5, "size": 5,
        }).collect()


# ---------------------------------------------------------- track_total_hits

def test_track_total_hits_exact_and_page_stable(spark, documents):
    n = documents.filter(F.col("n_chars") >= 300).count()
    page1 = dsl.search(spark, documents, {
        "query": {"range": {"n_chars": {"gte": 300}}},
        "track_total_hits": True, "sort": [{"doc_id": "asc"}], "size": 7,
    }).collect()
    assert page1 and all(r.total_hits == n for r in page1)
    # the same total on a later search_after page — ES reports the full
    # query's total on every page
    page2 = dsl.search(spark, documents, {
        "query": {"range": {"n_chars": {"gte": 300}}},
        "track_total_hits": True, "sort": [{"doc_id": "asc"}],
        "search_after": [page1[-1].doc_id], "size": 7,
    }).collect()
    assert page2 and all(r.total_hits == n for r in page2)
    assert page1[-1].doc_id < page2[0].doc_id


def test_track_total_hits_refused_on_scoring(spark, documents):
    with pytest.raises(ValueError, match="track_total_hits"):
        dsl.search(spark, documents, {
            "query": {"match": {"text": "spark"}},
            "track_total_hits": True, "size": 5,
        })


# -------------------------------------------------------------- sliced scroll

def test_sliced_scroll_partitions_the_hits(spark, documents):
    body = {"query": {"range": {"n_chars": {"gte": 0}}}, "size": 64}
    whole = {r.doc_id for pg in dsl.scroll(spark, documents, dict(body))
             for r in pg}
    seen: set = set()
    for i in range(3):
        b = dict(body)
        b["slice"] = {"id": i, "max": 3}
        ids = {r.doc_id for pg in dsl.scroll(spark, documents, b) for r in pg}
        assert not (ids & seen), f"slice {i} overlaps an earlier slice"
        seen |= ids
    assert seen == whole


def test_sliced_scroll_rejects_bad_slice(spark, documents):
    for sl in ({"id": 3, "max": 3}, {"id": -1, "max": 3}, {"id": 0, "max": 1}):
        with pytest.raises(ValueError, match="slice"):
            next(iter(dsl.scroll(spark, documents, {
                "query": {"range": {"n_chars": {"gte": 0}}},
                "size": 8, "slice": sl,
            })))


# ---------------------------------------------------------------- matrix_stats

def test_matrix_stats_matches_numpy(spark, events):
    import numpy as np

    rows = events.select("value", "user_id").collect()
    v = np.array([r.value for r in rows], dtype=float)
    u = np.array([r.user_id for r in rows], dtype=float)
    out = dsl.search(spark, events, {
        "size": 0,
        "aggs": {"m": {"matrix_stats": {"fields": ["value", "user_id"]}}},
    }, id_col="event_id").collect()[0]
    assert out.value_count == len(v)
    assert out.value_mean == pytest.approx(v.mean())
    assert out.value_variance == pytest.approx(v.var(ddof=1))
    m2, m3, m4 = (((v - v.mean()) ** k).mean() for k in (2, 3, 4))
    assert out.value_skewness == pytest.approx(m3 / m2 ** 1.5)
    assert out.value_kurtosis == pytest.approx(m4 / m2 ** 2)
    assert out.value_user_id_covariance == pytest.approx(
        np.cov(v, u, ddof=1)[0, 1])
    assert out.value_user_id_correlation == pytest.approx(
        np.corrcoef(v, u)[0, 1])


def test_matrix_stats_drops_rows_missing_any_field(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 10.0), (2, 2.0, None), (3, 3.0, 30.0), (4, None, 40.0)],
        "id long, x double, y double",
    )
    out = dsl.search(spark, df, {
        "size": 0, "aggs": {"m": {"matrix_stats": {"fields": ["x", "y"]}}},
    }, id_col="id").collect()[0]
    # only rows 1 and 3 are complete
    assert out.x_count == 2 and out.y_count == 2
    assert out.x_mean == pytest.approx(2.0)
    assert out.y_mean == pytest.approx(20.0)


# --------------------------------------------------------------------- t_test

def _welch(a, b):
    import numpy as np

    a, b = np.asarray(a, float), np.asarray(b, float)
    na, nb = len(a), len(b)
    sea, seb = a.var(ddof=1) / na, b.var(ddof=1) / nb
    t = (a.mean() - b.mean()) / math.sqrt(sea + seb)
    df = (sea + seb) ** 2 / (sea**2 / (na - 1) + seb**2 / (nb - 1))
    return t, df


def test_t_test_welch_matches_numpy(spark, events):
    rows = events.select("event_type", "value").collect()
    a = [r.value for r in rows if r.event_type == "click"]
    b = [r.value for r in rows if r.event_type == "view"]
    t, df = _welch(a, b)
    out = dsl.search(spark, events, {
        "size": 0,
        "aggs": {"tt": {"t_test": {
            "a": {"field": "value", "filter": {"term": {"event_type": "click"}}},
            "b": {"field": "value", "filter": {"term": {"event_type": "view"}}},
        }}},
    }, id_col="event_id").collect()[0]
    assert out.t == pytest.approx(t)
    assert out.df == pytest.approx(df)


def test_t_test_paired_and_pooled(spark):
    import numpy as np

    data = [(i, float(x), float(y)) for i, (x, y) in
            enumerate([(5, 3), (7, 4), (9, 9), (4, 1), (6, 6), (8, 5)])]
    df_ = spark.createDataFrame(data, "id long, x double, y double")
    # paired
    out = dsl.search(spark, df_, {
        "size": 0,
        "aggs": {"tt": {"t_test": {"a": {"field": "x"}, "b": {"field": "y"},
                                   "type": "paired"}}},
    }, id_col="id").collect()[0]
    d = np.array([x - y for _, x, y in data])
    t_want = d.mean() / (d.std(ddof=1) / math.sqrt(len(d)))
    assert out.t == pytest.approx(t_want) and out.df == len(d) - 1
    # homoscedastic (pooled)
    out2 = dsl.search(spark, df_, {
        "size": 0,
        "aggs": {"tt": {"t_test": {"a": {"field": "x"}, "b": {"field": "y"},
                                   "type": "homoscedastic"}}},
    }, id_col="id").collect()[0]
    x = np.array([x for _, x, _ in data]); y = np.array([y for _, _, y in data])
    sp2 = ((len(x) - 1) * x.var(ddof=1) + (len(y) - 1) * y.var(ddof=1)) / (
        len(x) + len(y) - 2)
    t_p = (x.mean() - y.mean()) / math.sqrt(sp2 * (1 / len(x) + 1 / len(y)))
    assert out2.t == pytest.approx(t_p) and out2.df == len(x) + len(y) - 2
    # paired with a filter is refused
    with pytest.raises(ValueError, match="paired"):
        dsl.search(spark, df_, {
            "size": 0,
            "aggs": {"tt": {"t_test": {
                "a": {"field": "x", "filter": {"range": {"x": {"gte": 5}}}},
                "b": {"field": "y"}, "type": "paired"}}},
        }, id_col="id").collect()


# --------------------------------------------- percentiles_bucket / normalize

def test_percentiles_bucket_matches_numpy(spark, events):
    import numpy as np

    sums = (events.groupBy(
        (F.floor(F.col("value") / 100) * 100).alias("k"))
        .agg(F.sum("value").alias("s")).collect())
    vals = np.array([r.s for r in sums], dtype=float)
    out = dsl.search(spark, events, {
        "size": 0,
        "aggs": {
            "h": {"histogram": {"field": "value", "interval": 100},
                  "aggs": {"s": {"sum": {"field": "value"}}}},
            "pb": {"percentiles_bucket": {"buckets_path": "h>s",
                                          "percents": [25, 50, 75]}},
        },
    }, id_col="event_id").collect()[0]
    for p, col in ((25, "pb_p25"), (50, "pb_p50"), (75, "pb_p75")):
        assert out[col] == pytest.approx(
            np.percentile(vals, p, method="linear"))


def test_normalize_methods(spark, events):
    import numpy as np

    def run(method):
        body = {"size": 0, "aggs": {"h": {
            "histogram": {"field": "value", "interval": 100},
            "aggs": {"s": {"sum": {"field": "value"}},
                     "nm": {"normalize": {"buckets_path": "s",
                                          "method": method}}},
        }}}
        rows = dsl.search(spark, events, body, id_col="event_id").collect()
        return (np.array([r["value"] for r in rows]),
                np.array([r["nm"] for r in rows]))

    v, pct = run("percent_of_sum")
    assert pct.sum() == pytest.approx(1.0)
    assert pct == pytest.approx(v / v.sum())
    v, z = run("z-score")
    assert z == pytest.approx((v - v.mean()) / v.std(ddof=0))
    v, r01 = run("rescale_0_1")
    assert r01.min() == pytest.approx(0.0) and r01.max() == pytest.approx(1.0)
    v, sm = run("softmax")
    e = np.exp(v - v.max())  # same max-shifted stable form as the engine
    assert sm == pytest.approx(e / e.sum())
    with pytest.raises(ValueError, match="normalize method"):
        run("nope")


# ------------------------------------------------------------ significant_text

def test_significant_text_filter_duplicate_text(spark):
    """Boilerplate guard: 5 copies of the same promo text inflate a
    term's foreground count without the filter, and count ONCE with it —
    the background stays undeduped in both cases."""
    promo = "buy cheap widgets now limited offer"
    rows = [(i, promo, "fg") for i in range(5)]
    rows += [(10 + i, f"organic doc about widgets number {i}", "fg")
             for i in range(3)]
    rows += [(100 + i, f"background text piece {i} nothing special", "bg")
             for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, body string, grp string")

    def sig(filter_dups):
        out = dsl.search(spark, df, {
            "size": 0,
            "query": {"term": {"grp": "fg"}},
            "aggs": {"s": {"significant_text": {
                "field": "body", "size": 20, "min_doc_count": 1,
                "filter_duplicate_text": filter_dups,
            }}},
        }, text_col="body")
        return {r.term: r.doc_count for r in out.collect()}

    dup, dedup = sig(False), sig(True)
    assert dup["cheap"] == 5      # the 5 copies each count
    assert dedup["cheap"] == 1    # deduped foreground counts it once
    assert dup["widgets"] == 8 and dedup["widgets"] == 4


# --------------------------------------------------------- multi-index search

def test_multi_index_topk_boost_and_per_index_stats(spark, documents, tmp_path):
    from es_loaders_spark.build import build_index
    from es_loaders_spark.wand import evict_index, topk

    den, dxx = str(tmp_path / "en"), str(tmp_path / "xx")
    build_index(spark, documents.filter(F.col("lang") == "en"), den, n_shards=4)
    build_index(spark, documents.filter(F.col("lang") != "en"), dxx, n_shards=4)
    q = "spark merge table"
    # manual merge from the per-index top-k pages (own stats per index)
    a = [("en", r.doc_id, round(r.score * 2.0, 4))
         for r in topk(spark, den, q, k=10).collect()]
    b = [("xx", r.doc_id, round(r.score * 1.0, 4))
         for r in topk(spark, dxx, q, k=10).collect()]
    want = sorted(a + b, key=lambda t: (-t[2], t[0], t[1]))[:10]
    got = [(r._index, r.doc_id, r.score) for r in dsl.multi_index_topk(
        spark, {"en": (den, 2.0), "xx": (dxx, 1.0)}, q, k=10).collect()]
    assert got == want
    # a huge boost pushes one index's hits to the top wholesale
    boosted = [r._index for r in dsl.multi_index_topk(
        spark, {"en": (den, 1.0), "xx": (dxx, 100.0)}, q, k=5).collect()]
    assert set(boosted) == {"xx"}
    with pytest.raises(ValueError, match="positive"):
        dsl.multi_index_topk(spark, {"en": (den, 0.0)}, q)
    with pytest.raises(ValueError, match="at least one"):
        dsl.multi_index_topk(spark, {}, q)
    evict_index(den), evict_index(dxx)


# ------------------------------------------------------ terms agg partitioning

def test_terms_partitioning_tiles_the_key_space(spark, documents):
    full = {r.source: r.doc_count for r in dsl.search(spark, documents, {
        "size": 0,
        "aggs": {"s": {"terms": {"field": "source", "size": 100000}}},
    }).collect()}
    seen = {}
    for pid in range(3):
        part = dsl.search(spark, documents, {
            "size": 0,
            "aggs": {"s": {"terms": {
                "field": "source", "size": 100000,
                "include": {"partition": pid, "num_partitions": 3},
            }}},
        }).collect()
        for r in part:
            assert r.source not in seen, "key appeared in two partitions"
            seen[r.source] = r.doc_count
    assert seen == full
    with pytest.raises(ValueError, match="partition"):
        dsl.search(spark, documents, {
            "size": 0,
            "aggs": {"s": {"terms": {"field": "source",
                                     "include": {"partition": 3,
                                                 "num_partitions": 3}}}},
        })


def test_terms_include_regex_and_exclude_list(spark, documents):
    got = {r.source for r in dsl.search(spark, documents, {
        "size": 0,
        "aggs": {"s": {"terms": {"field": "source", "size": 1000,
                                 "include": "src1.*",
                                 "exclude": ["src1"]}}},
    }).collect()}
    assert got, "regex include matched nothing"
    assert all(s.startswith("src1") for s in got)
    assert "src1" not in got  # excluded exactly
    # whole-term anchoring: 'rc1' must NOT match anything (substring
    # would); ES anchors the include regex
    none = dsl.search(spark, documents, {
        "size": 0,
        "aggs": {"s": {"terms": {"field": "source", "size": 10,
                                 "include": "rc1.*"}}},
    }).collect()
    assert none == []


def test_min_score_and_total_hits_refused_with_aggs(spark, documents):
    for extra in ({"min_score": 2.0}, {"track_total_hits": True}):
        with pytest.raises(ValueError, match="aggs"):
            dsl.search(spark, documents, {
                "size": 0,
                "query": {"match": {"text": "spark"}},
                "aggs": {"l": {"terms": {"field": "lang"}}},
                **extra,
            })


# --------------------------------------------------------------- geohash_grid

def _reference_geohash(lat, lon, p):
    """Textbook range-bisection geohash — an INDEPENDENT algorithm from
    the engine's scaled-integer Morton form."""
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    latr, lonr = [-90.0, 90.0], [-180.0, 180.0]
    bits, even, out, ch = 0, True, "", 0
    while len(out) < p:
        rng, v = (lonr, lon) if even else (latr, lat)
        mid = (rng[0] + rng[1]) / 2
        if v >= mid:
            ch, rng[0] = ch * 2 + 1, mid
        else:
            ch, rng[1] = ch * 2, mid
        even, bits = not even, bits + 1
        if bits == 5:
            out, bits, ch = out + b32[ch], 0, 0
    return out


def test_geohash_key_matches_reference_bisection(spark):
    from es_loaders_spark.dsl import geohash_key

    pts = [(57.64911, 10.40744), (40.71, -74.0), (0.0, 0.0),
           (-33.8688, 151.2093), (-90.0, -180.0), (90.0, 180.0),
           (13.37, -42.42), (-77.85, 166.67)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    for p in (1, 4, 7, 12):
        got = [r.g for r in df.select(
            geohash_key(F.col("lat"), F.col("lon"), p).alias("g")).collect()]
        assert got == [_reference_geohash(la, lo, p) for la, lo in pts], p
    # the classic published vector, for the reader
    assert _reference_geohash(57.64911, 10.40744, 7) == "u4pruyd"
    with pytest.raises(ValueError, match="precision"):
        df.select(geohash_key(F.col("lat"), F.col("lon"), 13))


def test_geohash_grid_agg_with_subagg(spark):
    df = spark.createDataFrame(
        [(1, 57.64911, 10.40744, 5.0), (2, 57.649, 10.407, 7.0),
         (3, 40.71, -74.0, 9.0)],
        "doc_id long, lat double, lon double, v double",
    )
    df = df.select(
        "doc_id", "v",
        F.struct(F.col("lat"), F.col("lon")).alias("loc"),
    )
    rows = dsl.search(spark, df, {
        "size": 0,
        "aggs": {"g": {"geohash_grid": {"field": "loc", "precision": 4},
                       "aggs": {"s": {"sum": {"field": "v"}}}}},
    }).collect()
    out = {r.g_key: (r.doc_count, r.value) for r in rows}
    assert out == {"u4pr": (2, 12.0), "dr5r": (1, 9.0)}


# -------------------------------------------------------------------- ip_range

def test_ip_range_buckets_and_cidr(spark):
    df = spark.createDataFrame(
        [(1, "10.0.0.5"), (2, "10.0.0.255"), (3, "10.0.1.0"),
         (4, "192.168.1.1"), (5, "9.255.255.255")],
        "doc_id long, ip string",
    )
    rows = dsl.search(spark, df, {
        "size": 0,
        "aggs": {"r": {"ip_range": {"field": "ip", "ranges": [
            {"to": "10.0.0.0"},                      # only doc 5
            {"from": "10.0.0.0", "to": "10.0.1.0"},  # docs 1,2 (to EXCL)
            {"mask": "10.0.0.0/23"},                 # docs 1,2,3 (overlap)
            {"from": "192.168.0.0", "key": "private192"},
        ]}}},
    }).collect()
    got = {r.r_key: r.doc_count for r in rows}
    assert got == {"*-10.0.0.0": 1, "10.0.0.0-10.0.1.0": 2,
                   "10.0.0.0/23": 3, "private192": 1}
    # CIDR base with host bits set masks down to the network base
    from es_loaders_spark.dsl import _cidr_bounds, _ipv4_int
    lo, hi = _cidr_bounds("10.0.1.77/23")
    assert lo == _ipv4_int("10.0.0.0") and hi == _ipv4_int("10.0.2.0")
    with pytest.raises(ValueError, match="CIDR"):
        _cidr_bounds("10.0.0.0/33")
    with pytest.raises(ValueError, match="IPv4"):
        _ipv4_int("10.0.0.300")


# ------------------------------------------------- randomized consistency web

def test_min_score_web_random_thresholds(spark, documents):
    """Every observed score value used as a threshold must reproduce the
    python-filtered full ranking — 12 seeded draws."""
    import random

    full = dsl.search(spark, documents, {
        "query": {"match": {"text": "spark merge table key"}}, "size": 60,
    }).collect()
    scores = sorted({r.score for r in full})
    rng = random.Random(606)
    for thr in rng.sample(scores, min(12, len(scores))):
        kept = dsl.search(spark, documents, {
            "query": {"match": {"text": "spark merge table key"}},
            "min_score": thr, "size": 60,
        }).collect()
        want = [(r.doc_id, r.score) for r in full if r.score >= thr]
        assert [(r.doc_id, r.score) for r in kept] == want, thr


def test_geo_grids_drop_null_coordinates(spark):
    df = spark.createDataFrame(
        [(1, 57.64911, 10.40744), (2, None, 10.0), (3, 40.71, None)],
        "doc_id long, lat double, lon double",
    ).select("doc_id", F.struct(F.col("lat"), F.col("lon")).alias("loc"))
    for agg in ({"geohash_grid": {"field": "loc", "precision": 4}},
                {"geotile_grid": {"field": "loc", "precision": 5}}):
        rows = dsl.search(spark, df, {"size": 0, "aggs": {"g": agg}}).collect()
        # only doc 1 buckets; nulls drop (no corner cell, no null bucket)
        assert len(rows) == 1 and rows[0].doc_count == 1, (agg, rows)


def test_track_total_hits_survives_source_projection(spark, documents):
    out = dsl.search(spark, documents, {
        "query": {"range": {"n_chars": {"gte": 300}}},
        "track_total_hits": True, "sort": [{"doc_id": "asc"}], "size": 5,
        "_source": ["doc_id", "lang"],
    })
    rows = out.collect()
    n = documents.filter(F.col("n_chars") >= 300).count()
    assert out.columns == ["doc_id", "lang", "total_hits"]
    assert rows and all(r.total_hits == n for r in rows)


# ------------------------------------------------------------------- rate agg

def test_rate_agg_under_date_histogram(spark, events):
    import numpy as np

    body = {"size": 0, "aggs": {"h": {
        "date_histogram": {"field": "ts", "calendar_interval": "hour"},
        "aggs": {"r": {"rate": {"field": "value", "interval": "1h",
                                "unit": "minute"}},
                 "s": {"sum": {"field": "value"}}},
    }}}
    rows = dsl.search(spark, events, body, id_col="event_id").collect()
    assert rows
    for r in rows:
        # rate per minute = hourly sum / 60, exactly
        assert r.r_value == pytest.approx(r.s_value / 60.0)
    # doc-count rate (no field): docs per minute
    body2 = {"size": 0, "aggs": {"h": {
        "date_histogram": {"field": "ts", "calendar_interval": "hour"},
        "aggs": {"r": {"rate": {"interval": "1h", "unit": "minute"}}},
    }}}
    rows2 = dsl.search(spark, events, body2, id_col="event_id").collect()
    assert all(r.value == pytest.approx(r.doc_count / 60.0) for r in rows2)
    # refusals: missing interval; calendar-length units
    with pytest.raises(ValueError, match="interval"):
        dsl.search(spark, events, {"size": 0, "aggs": {"h": {
            "date_histogram": {"field": "ts", "calendar_interval": "hour"},
            "aggs": {"r": {"rate": {"field": "value"}}}}}},
            id_col="event_id")
    with pytest.raises(ValueError, match="fixed-length"):
        dsl.search(spark, events, {"size": 0, "aggs": {"h": {
            "date_histogram": {"field": "ts", "calendar_interval": "hour"},
            "aggs": {"r": {"rate": {"field": "value", "interval": "month"}}},
        }}}, id_col="event_id")
