"""Round-5 fourth wave: nested query/agg, geo queries + aggs,
knn search body, runtime fields, percolator."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from es_loaders_spark import dsl, percolate as P


@pytest.fixture(scope="module")
def nested_docs(spark):
    return spark.createDataFrame([
        Row(doc_id=1, items=[Row(flag="A", qty=5.0), Row(flag="B", qty=2.0)],
            loc=Row(lat=40.0, lon=-74.0), price=10.0),
        Row(doc_id=2, items=[Row(flag="A", qty=3.0)],
            loc=Row(lat=52.5, lon=13.4), price=20.0),
        Row(doc_id=3, items=[], loc=Row(lat=40.7, lon=-74.1), price=30.0),
        Row(doc_id=4, items=[Row(flag="A", qty=1.0), Row(flag="A", qty=4.0)],
            loc=Row(lat=-33.9, lon=151.2), price=40.0),
        Row(doc_id=5, items=None, loc=Row(lat=0.0, lon=0.0), price=50.0),
    ]).cache()


# ---------- nested query (filter context, HOF — no explode) ----------

def test_nested_query_same_element_semantics(spark, nested_docs):
    # Both conditions must hold on the SAME nested object: only doc 1 has
    # an item with qty>=5 AND flag=B? no — qty>=2 & flag=B. Craft the
    # classic trap: doc 1 has (A,5) and (B,2); a flattened model would
    # match flag=B AND qty>=5, nested must NOT.
    body = {"nested": {"path": "items", "query": {"bool": {"filter": [
        {"term": {"items.flag": "B"}},
        {"range": {"items.qty": {"gte": 5}}},
    ]}}}}
    assert nested_docs.filter(dsl.filter_expr(body)).count() == 0
    body2 = {"nested": {"path": "items", "query": {"bool": {"filter": [
        {"term": {"items.flag": "B"}},
        {"range": {"items.qty": {"gte": 2}}},
    ]}}}}
    got = [r.doc_id for r in nested_docs.filter(dsl.filter_expr(body2)).collect()]
    assert got == [1]


def test_nested_query_null_and_empty_arrays_never_match(spark, nested_docs):
    body = {"nested": {"path": "items",
                       "query": {"exists": {"field": "items.flag"}}}}
    got = sorted(r.doc_id for r in nested_docs.filter(dsl.filter_expr(body)).collect())
    assert got == [1, 2, 4]  # 3 (empty) and 5 (null) excluded


def test_nested_query_under_must_not(spark, nested_docs):
    inner = {"nested": {"path": "items",
                        "query": {"range": {"items.qty": {"gte": 4}}}}}
    body = {"bool": {"must_not": [inner]}}
    got = sorted(r.doc_id for r in nested_docs.filter(dsl.filter_expr(body)).collect())
    assert got == [2, 3, 5]  # ES: must_not of nested keeps null/empty parents


def test_nested_query_plan_has_no_explode(spark, nested_docs):
    body = {"nested": {"path": "items",
                       "query": {"range": {"items.qty": {"gte": 4}}}}}
    plan = nested_docs.filter(dsl.filter_expr(body))._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan  # exists() HOF, not explode


# ---------- nested agg + reverse_nested ----------

def test_nested_agg_terms_sum_reverse_nested(spark, nested_docs):
    body = {"size": 0, "aggs": {"per_item": {"nested": {"path": "items"}, "aggs": {
        "by_flag": {"terms": {"field": "items.flag", "size": 10}, "aggs": {
            "qty_sum": {"sum": {"field": "items.qty"}},
            "parents": {"reverse_nested": {}},
        }}}}}}
    rows = sorted(tuple(r) for r in dsl.search(spark, nested_docs, body).collect())
    # A: nested docs 1,2,4,4 → qty 5+3+1+4=13, parents {1,2,4}=3, doc_count 4
    # B: nested doc 1 → qty 2, parents 1, doc_count 1
    assert rows == [("A", 13.0, 3, 4), ("B", 2.0, 1, 1)]


def test_nested_agg_plain_counts_nested_docs(spark, nested_docs):
    body = {"size": 0, "aggs": {"n": {"nested": {"path": "items"}}}}
    assert dsl.search(spark, nested_docs, body).collect()[0].doc_count == 5


# ---------- geo queries ----------

def test_geo_distance_filter(spark, nested_docs):
    body = {"geo_distance": {"distance": "100km",
                             "loc": {"lat": 40.71, "lon": -74.0}}}
    got = sorted(r.doc_id for r in nested_docs.filter(dsl.filter_expr(body)).collect())
    assert got == [1, 3]


def test_geo_distance_unit_parsing():
    assert dsl._parse_distance("1500km") == 1_500_000.0
    assert dsl._parse_distance("10mi") == pytest.approx(16093.44)
    assert dsl._parse_distance(250) == 250.0
    with pytest.raises(ValueError):
        dsl._parse_distance("10 parsecs")


def test_haversine_known_distance(spark):
    # JFK -> LHR great-circle ≈ 5,555 km (published figure 5,541-5,570
    # depending on the exact coordinates/radius)
    df = spark.range(1).select(
        dsl._haversine_m(F.lit(40.6413), F.lit(-73.7781),
                         F.lit(51.4700), F.lit(-0.4543)).alias("d"))
    d = df.collect()[0].d
    assert 5.52e6 < d < 5.58e6


def test_haversine_sql_twin_matches(spark):
    d_spark = spark.range(1).select(
        dsl._haversine_m(F.lit(40.6413), F.lit(-73.7781),
                         F.lit(51.4700), F.lit(-0.4543)).alias("d")).collect()[0].d
    d_duck = duckdb.sql(
        "SELECT " + dsl.haversine_sql("40.6413", "-73.7781", "51.4700", "-0.4543")
    ).fetchone()[0]
    assert d_spark == pytest.approx(d_duck, rel=1e-12)


def test_geo_bounding_box_and_antimeridian(spark, nested_docs):
    body = {"geo_bounding_box": {"loc": {
        "top_left": {"lat": 60, "lon": 0}, "bottom_right": {"lat": 40, "lon": 20}}}}
    got = [r.doc_id for r in nested_docs.filter(dsl.filter_expr(body)).collect()]
    assert got == [2]
    # wrap: lon in [150, -70] crosses the antimeridian → Sydney + both NYs
    wrap = {"geo_bounding_box": {"loc": {
        "top_left": {"lat": 85, "lon": 150}, "bottom_right": {"lat": -85, "lon": -70}}}}
    got2 = sorted(r.doc_id for r in nested_docs.filter(dsl.filter_expr(wrap)).collect())
    assert got2 == [1, 3, 4]


# ---------- geo aggs ----------

def test_geotile_grid_matches_duckdb_twin(spark, nested_docs):
    body = {"size": 0,
            "aggs": {"tiles": {"geotile_grid": {"field": "loc", "precision": 6}}}}
    got = {(r.tiles_key, r.doc_count)
           for r in dsl.search(spark, nested_docs, body).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                "(40.0,-74.0),(52.5,13.4),(40.7,-74.1),(-33.9,151.2),(0.0,0.0)"
                ") v(lat,lon)")
    want = set(con.execute(
        f"SELECT {dsl.geotile_sql('lat', 'lon', 6)} AS k, count(*) "
        "FROM t GROUP BY 1").fetchall())
    assert got == want


def test_geotile_key_reference_values(spark):
    # OSM slippy-map reference: (lat=41.85, lon=-87.65) at z=7 → tile 32/47
    row = spark.range(1).select(
        dsl.geotile_key(F.lit(41.85), F.lit(-87.65), 7).alias("k")).collect()[0]
    assert row.k == "7/32/47"
    # poles clamp instead of overflowing: lon=180 → x clamps to n-1;
    # lat=+90 → Mercator top edge, y clamps to 0 (tile y grows southward)
    row2 = spark.range(1).select(
        dsl.geotile_key(F.lit(90.0), F.lit(180.0), 3).alias("k")).collect()[0]
    assert row2.k == "3/7/0"
    row3 = spark.range(1).select(
        dsl.geotile_key(F.lit(-90.0), F.lit(-180.0), 3).alias("k")).collect()[0]
    assert row3.k == "3/0/7"


def test_geo_distance_agg_rings(spark, nested_docs):
    body = {"size": 0, "aggs": {"rings": {"geo_distance": {
        "field": "loc", "origin": {"lat": 40.71, "lon": -74.0}, "unit": "km",
        "ranges": [{"to": 100}, {"from": 100, "to": 7000}, {"from": 7000}],
    }}}}
    rings = sorted((r.rings_key, r.doc_count)
                   for r in dsl.search(spark, nested_docs, body).collect())
    # NYC-ish docs 1,3 <100km; Berlin 6386km; Sydney 15991km + (0,0) 8667km
    assert rings == [("*-100", 2), ("100-7000", 1), ("7000-*", 2)]


def test_geo_bounds_and_centroid(spark, nested_docs):
    body = {"size": 0, "aggs": {
        "vp": {"geo_bounds": {"field": "loc"}},
        "cen": {"geo_centroid": {"field": "loc"}},
    }}
    r = dsl.search(spark, nested_docs, body).collect()[0]
    assert (r.vp_top_left_lat, r.vp_top_left_lon) == (52.5, -74.1)
    assert (r.vp_bottom_right_lat, r.vp_bottom_right_lon) == (-33.9, 151.2)
    assert r.cen_count == 5
    assert r.cen_lat == pytest.approx((40.0 + 52.5 + 40.7 - 33.9 + 0.0) / 5)


# ---------- knn search body ----------

def test_knn_body_exact_cosine_with_prefilter(spark, nested_docs):
    df = spark.createDataFrame([
        Row(doc_id=i, price=float(10 * i), vec=[float(i), 1.0, 0.0])
        for i in range(1, 8)
    ])
    body = {"knn": {"field": "vec", "query_vector": [1.0, 0.0, 0.0], "k": 3,
                    "filter": {"range": {"price": {"gte": 20.0}}}}}
    out = dsl.search(spark, df, body).collect()
    assert [r.doc_id for r in out] == [7, 6, 5]
    # score is ES's (1+cosine)/2 transform
    cos7 = 7.0 / math.sqrt(50.0)
    assert out[0].score == pytest.approx(round((1 + cos7) / 2, 4))


def test_knn_body_unfiltered_equals_cosine_topk(spark):
    from es_loaders_spark.similarity import cosine_topk

    df = spark.createDataFrame([
        Row(vec_id=i, embedding=[float((i * 7) % 5), float(i % 3), 1.0])
        for i in range(20)
    ])
    body = {"knn": {"field": "embedding", "query_vector": [1.0, 2.0, 0.5], "k": 5}}
    got = [r.vec_id for r in dsl.search(spark, df, body, id_col="vec_id").collect()]
    want = [r.vec_id
            for r in cosine_topk(df, [1.0, 2.0, 0.5], k=5).collect()]
    assert got == want


# ---------- runtime fields ----------

def test_runtime_field_in_query_and_aggs(spark):
    df = spark.createDataFrame([
        Row(doc_id=i, price=float(10 + i), disc=0.1 * (i % 3)) for i in range(1, 8)
    ])
    body = {
        "runtime_mappings": {"net": {"type": "double", "script": {
            "source": "emit(doc['price'].value * (1 - doc['disc'].value))"}}},
        "size": 0,
        "query": {"range": {"net": {"gte": 11.0}}},
        "aggs": {"s": {"stats": {"field": "net"}}},
    }
    r = dsl.search(spark, df, body).collect()[0]
    nets = [(10 + i) * (1 - 0.1 * (i % 3)) for i in range(1, 8)]
    sel = [n for n in nets if n >= 11.0]
    assert r["count"] == len(sel)
    assert r["sum"] == pytest.approx(sum(sel))


def test_runtime_field_with_params_and_sort(spark):
    df = spark.createDataFrame([Row(doc_id=i, v=float(i)) for i in range(5)])
    body = {
        "runtime_mappings": {"scaled": {"type": "double", "script": {
            "source": "doc['v'].value * params.k", "params": {"k": 3.0}}}},
        "query": {"match_all": {}},
        "sort": [{"scaled": "desc"}], "size": 2, "_source": ["doc_id", "scaled"],
    }
    out = dsl.search(spark, df, body).collect()
    assert [(r.doc_id, r.scaled) for r in out] == [(4, 12.0), (3, 9.0)]


def test_runtime_field_rejects_unknown_type(spark):
    df = spark.createDataFrame([Row(doc_id=1, v=1.0)])
    body = {"runtime_mappings": {"x": {"type": "geo_shape",
                                       "script": "doc['v'].value"}},
            "query": {"match_all": {}}}
    with pytest.raises(ValueError, match="unsupported type"):
        dsl.search(spark, df, body)


# ---------- percolator ----------

PERC_BODIES = [
    (1, {"term": {"brand": "Brand#32"}}),
    (2, {"term": {"brand": "Brand#13"}}),
    (3, {"range": {"size": {"gte": 10, "lte": 20}}}),
    (4, {"range": {"size": {"gte": 18}}}),
    (5, {"match": {"type_text": "polished BRASS"}}),
    (6, {"match": {"type_text": {"query": "polished brass", "operator": "and"}}}),
    (7, {"match": {"type_text": {"query": "polished tin", "operator": "and"}}}),
    (8, {"match_phrase": {"type_text": "standard polished"}}),
    (9, {"match_phrase": {"type_text": "polished standard"}}),
    (10, {"prefix": {"brand": "Brand#3"}}),
    (11, {"exists": {"field": "container"}}),
    (12, {"exists": {"field": "nope"}}),
    (13, {"terms": {"container": ["SM CASE", "LG BOX"]}}),
]
PERC_DOC = {"brand": "Brand#32", "size": 17,
            "type_text": "STANDARD POLISHED TIN", "container": "SM CASE"}


def test_percolate_matches_expected_queries(spark):
    q = P.queries_from_bodies(spark, PERC_BODIES)
    got = [r.query_id for r in P.percolate(q, PERC_DOC).collect()]
    assert got == [1, 3, 5, 7, 8, 10, 11, 13]


def test_percolate_matches_duckdb_oracle(spark):
    q = P.queries_from_bodies(spark, PERC_BODIES)
    got = [r.query_id for r in P.percolate(q, PERC_DOC).collect()]
    con = duckdb.connect()
    con.register("pq", q.toPandas())
    want = [r[0] for r in
            con.execute(P.percolate_oracle_sql(PERC_DOC, "pq")).fetchall()]
    assert got == want


def test_percolate_missing_doc_fields_never_match(spark):
    q = P.queries_from_bodies(spark, PERC_BODIES)
    got = [r.query_id for r in P.percolate(q, {"other": "x"}).collect()]
    assert got == []


def test_percolate_plan_is_single_scan_no_shuffle(spark):
    q = P.queries_from_bodies(spark, PERC_BODIES)
    plan = P.percolate(q, PERC_DOC)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.replace("Exchange rangepartitioning", "", 1)
    # the only allowed exchange is the final orderBy's range partitioning


def test_percolate_rejects_unsupported_kind(spark):
    with pytest.raises(ValueError, match="unsupported percolator"):
        P.queries_from_bodies(spark, [(1, {"fuzzy": {"f": "x"}})])


# ---------- termvectors / mget / field_caps ----------

def test_termvectors_forward_stats_match_python(spark, documents):
    from es_loaders_spark.analyze import tokenize_text

    ids = [r.doc_id for r in documents.limit(2).collect()]
    out = dsl.termvectors(spark, documents, ids).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.term] = (r.term_freq, list(r.positions))
    for row in documents.filter(F.col("doc_id").isin(ids)).collect():
        toks = tokenize_text(row.text)
        want = {}
        for pos, t in enumerate(toks):
            tf, ps = want.get(t, (0, []))
            want[t] = (tf + 1, ps + [pos])
        assert by_doc[row.doc_id] == want


def test_termvectors_doc_freq_matches_corpus(spark, documents):
    ids = [documents.limit(1).collect()[0].doc_id]
    out = dsl.termvectors(spark, documents, ids).collect()
    some = sorted(out, key=lambda r: -r.doc_freq)[:3]
    from es_loaders_spark.analyze import terms_array

    for r in some:
        df = (documents
              .filter(F.array_contains(
                  F.array_distinct(terms_array(F.col("text"))), r.term))
              .count())
        assert r.doc_freq == df


def test_termvectors_index_served_df(spark, web_pages, tmp_path):
    from es_loaders_spark.build import build_index
    from pyspark.sql.window import Window

    docs = (
        web_pages
        .withColumn("doc_id", F.row_number().over(Window.orderBy("url")) - 1)
        .select("doc_id", "text")
    )
    idx = str(tmp_path / "tv_idx")
    build_index(spark, docs, idx, n_shards=4)
    got = dsl.termvectors(spark, docs, [0, 1], index_dir=idx)
    want = dsl.termvectors(spark, docs, [0, 1])
    g = [(r.doc_id, r.term, r.term_freq, r.doc_freq) for r in got.collect()]
    w = [(r.doc_id, r.term, r.term_freq, r.doc_freq) for r in want.collect()]
    assert g == w  # index terms table == scan-computed df


def test_mget_request_order_and_source(spark, documents):
    ids = [r.doc_id for r in documents.limit(5).collect()]
    req = [ids[3], ids[0], ids[4]]
    out = dsl.mget(documents, req, _source=["doc_id"]).collect()
    assert [r.doc_id for r in out] == req


def test_field_caps_types(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(
        doc_id=1, text="x", price=1.5, ok=True,
        vec=[1.0, 2.0], tags=["a"], items=[Row(q=1)],
    )])
    caps = dsl.field_caps(df)
    assert caps["doc_id"]["type"] == "long"
    assert caps["text"]["type"] == "keyword"
    assert caps["price"]["type"] == "double"
    assert caps["ok"]["type"] == "boolean"
    assert caps["vec"]["type"] == "dense_vector"
    assert caps["tags"]["type"] == "keyword"
    assert caps["items"]["type"] == "nested"


# ---------- index-assisted faceted search (aggs + match query) ----------

def test_aggs_with_match_query_index_served_parity(spark, web_pages, tmp_path):
    from pyspark.sql.window import Window

    from es_loaders_spark.build import build_index

    docs = (
        web_pages
        .withColumn("doc_id", F.row_number().over(Window.orderBy("url")) - 1)
        .select("doc_id", "text", "lang")
        .cache()
    )
    idx = str(tmp_path / "facet_idx")
    build_index(spark, docs, idx, n_shards=4)
    for v in ("spark crawl", {"query": "spark crawl", "operator": "and"}):
        body = {"size": 0, "query": {"match": {"text": v}},
                "aggs": {"by_lang": {"terms": {"field": "lang", "size": 10}}}}
        scan = sorted(tuple(r) for r in dsl.search(spark, docs, body).collect())
        served = sorted(
            tuple(r)
            for r in dsl.search(spark, docs, body, index_dir=idx).collect())
        assert scan == served and len(scan) > 0, v


def test_aggs_match_index_plan_never_tokenizes_corpus(spark, web_pages, tmp_path):
    from pyspark.sql.window import Window

    from es_loaders_spark.build import build_index

    docs = (
        web_pages
        .withColumn("doc_id", F.row_number().over(Window.orderBy("url")) - 1)
        .select("doc_id", "text", "lang")
    )
    idx = str(tmp_path / "facet_idx2")
    build_index(spark, docs, idx, n_shards=4)
    body = {"size": 0, "query": {"match": {"text": "spark"}},
            "aggs": {"by_lang": {"terms": {"field": "lang", "size": 10}}}}
    plan = (
        dsl.search(spark, docs, body, index_dir=idx)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "split(" not in plan and "posexplode" not in plan


# ---------- search templates ----------

def test_render_template_substitution_and_types():
    src = {"query": {"match": {"text": "{{q}}"}},
           "size": "{{size}}{{^size}}10{{/size}}",
           "knn_vec": "{{#toJson}}vec{{/toJson}}",
           "note": "q={{q}} k={{size}}"}
    out = dsl.render_template(src, {"q": "spark", "vec": [1.0, 2.0]})
    assert out["query"]["match"]["text"] == "spark"
    assert out["size"] == 10          # default kept native int
    assert out["knn_vec"] == [1.0, 2.0]
    assert out["note"] == "q=spark k="  # mustache: missing renders empty
    out2 = dsl.render_template(src, {"q": "spark", "size": 3, "vec": []})
    assert out2["size"] == 3
    assert dsl.render_template({"a": "{{nope}}"}, {}) == {"a": ""}


def test_search_template_end_to_end(spark, documents):
    tpl = {
        "source": {
            "query": {"range": {"n_chars": {"gte": "{{lo}}"}}},
            "sort": [{"doc_id": "asc"}],
            "size": "{{k}}{{^k}}5{{/k}}",
            "_source": ["doc_id"],
        },
        "params": {"lo": 200},
    }
    out = dsl.search_template(spark, documents, tpl).collect()
    assert len(out) == 5
    want = [r.doc_id for r in documents.filter(F.col("n_chars") >= 200)
            .orderBy("doc_id").limit(5).collect()]
    assert [r.doc_id for r in out] == want


def test_nested_inner_hits_returns_matching_elements(spark, nested_docs):
    body = {
        "query": {"nested": {
            "path": "items",
            "query": {"range": {"items.qty": {"gte": 4}}},
            "inner_hits": {},
        }},
        "sort": [{"doc_id": "asc"}], "size": 10,
        "_source": ["doc_id", "inner_hits_items"],
    }
    out = dsl.search(spark, nested_docs, body).collect()
    got = {r.doc_id: [(e.flag, e.qty) for e in r.inner_hits_items] for r in out}
    # doc 1: (A,5.0) matches, (B,2.0) doesn't; doc 4: only (A,4.0)
    assert got == {1: [("A", 5.0)], 4: [("A", 4.0)]}


def test_nested_inner_hits_custom_name(spark, nested_docs):
    body = {
        "query": {"nested": {
            "path": "items",
            "query": {"term": {"items.flag": "B"}},
            "inner_hits": {"name": "b_items"},
        }},
        "sort": [{"doc_id": "asc"}], "size": 10,
        "_source": ["doc_id", "b_items"],
    }
    out = dsl.search(spark, nested_docs, body).collect()
    assert [(r.doc_id, len(r.b_items)) for r in out] == [(1, 1)]


def test_percolate_batch_matches_per_doc_percolate(spark):
    q = P.queries_from_bodies(spark, PERC_BODIES)
    docs = spark.createDataFrame([
        Row(doc_id=1, brand="Brand#32", size=17,
            type_text="STANDARD POLISHED TIN", container="SM CASE"),
        Row(doc_id=2, brand="Brand#13", size=30,
            type_text="ECONOMY BURNISHED STEEL", container="JUMBO JAR"),
        Row(doc_id=3, brand="Other", size=19,
            type_text="PROMO POLISHED BRASS", container="LG BOX"),
    ])
    got = sorted(
        (r.doc_id, r.query_id)
        for r in P.percolate_batch(docs, q).collect()
    )
    want = []
    for d in docs.collect():
        doc = {k: v for k, v in d.asDict().items() if k != "doc_id"}
        for r in P.percolate(q, doc).collect():
            want.append((d.doc_id, r.query_id))
    assert got == sorted(want) and len(got) > 0


def test_percolate_streaming_alerting(spark, tmp_path):
    import time

    q = P.queries_from_bodies(spark, PERC_BODIES)
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    docs = spark.createDataFrame([
        Row(doc_id=1, brand="Brand#32", size=17,
            type_text="STANDARD POLISHED TIN", container="SM CASE"),
        Row(doc_id=2, brand="Brand#13", size=30,
            type_text="ECONOMY BURNISHED STEEL", container="JUMBO JAR"),
    ])
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    matches = P.percolate_batch(stream, q)  # stream-static broadcast join
    query = (
        matches.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    query.awaitTermination(120)
    got = sorted(
        (r.doc_id, r.query_id) for r in spark.read.parquet(out).collect()
    )
    want = []
    for d in docs.collect():
        doc = {k: v for k, v in d.asDict().items() if k != "doc_id"}
        for r in P.percolate(q, doc).collect():
            want.append((d.doc_id, r.query_id))
    assert got == sorted(want) and len(got) > 0


def test_validate_query(spark):  # Column compilation needs a session
    assert dsl.validate_query(
        {"query": {"bool": {"filter": [{"term": {"a": 1}}]}}}
    ) == {"valid": True, "error": None}
    bad = dsl.validate_query({"query": {"frobnicate": {"a": 1}}})
    assert not bad["valid"] and "frobnicate" in bad["error"]
    badqs = dsl.validate_query(
        {"query": {"query_string": {"query": "a AND (b"}}})
    assert not badqs["valid"] and "parenthes" in badqs["error"]


def test_percolate_randomized_three_way_consistency(spark):
    """300 seeded-random stored queries × 12 random docs: per-doc
    percolate ≡ percolate_batch ≡ the DuckDB SQL twin, in bulk."""
    import random

    rng = random.Random(20260818)
    words = ["spark", "index", "crawl", "data", "batch", "merge", "query",
             "page", "fast", "slow", "tin", "brass", "steel"]
    brands = [f"Brand#{i}" for i in range(1, 6)]

    bodies = []
    for qid in range(1, 301):
        kind = rng.choice(
            ["term", "terms", "range", "match", "match_and",
             "match_phrase", "prefix", "exists"])
        if kind == "term":
            bodies.append((qid, {"term": {"brand": rng.choice(brands)}}))
        elif kind == "terms":
            bodies.append((qid, {"terms": {"brand": rng.sample(brands, 2)}}))
        elif kind == "range":
            lo = rng.randint(0, 40)
            bodies.append((qid, {"range": {"size": {"gte": lo, "lte": lo + rng.randint(0, 20)}}}))
        elif kind == "match":
            bodies.append((qid, {"match": {"blurb": " ".join(rng.sample(words, rng.randint(1, 3)))}}))
        elif kind == "match_and":
            bodies.append((qid, {"match": {"blurb": {
                "query": " ".join(rng.sample(words, 2)), "operator": "and"}}}))
        elif kind == "match_phrase":
            bodies.append((qid, {"match_phrase": {"blurb": " ".join(rng.sample(words, 2))}}))
        elif kind == "prefix":
            bodies.append((qid, {"prefix": {"brand": rng.choice(brands)[:6]}}))
        else:
            bodies.append((qid, {"exists": {"field": rng.choice(["brand", "blurb", "nope"])}}))
    q = P.queries_from_bodies(spark, bodies)

    docs = []
    for did in range(1, 13):
        docs.append({
            "brand": rng.choice(brands),
            "size": rng.randint(0, 60),
            "blurb": " ".join(rng.choice(words) for _ in range(rng.randint(3, 10))),
        })

    import duckdb
    con = duckdb.connect()
    con.register("pq", q.toPandas())

    batch_df = spark.createDataFrame(
        [Row(doc_id=i + 1, **d) for i, d in enumerate(docs)])
    got_batch = sorted(
        (r.doc_id, r.query_id)
        for r in P.percolate_batch(batch_df, q).collect())

    got_perdoc, got_duck = [], []
    for i, d in enumerate(docs):
        for r in P.percolate(q, d).collect():
            got_perdoc.append((i + 1, r.query_id))
        for r in con.execute(P.percolate_oracle_sql(d, "pq")).fetchall():
            got_duck.append((i + 1, r[0]))

    assert got_batch == sorted(got_perdoc) == sorted(got_duck)
    assert len(got_batch) > 100  # the web actually matched things


def test_geo_randomized_duckdb_consistency(spark):
    """500 seeded-random coordinates: geotile keys and haversine
    distances agree with the DuckDB twins in bulk (one pass each)."""
    import random

    import duckdb

    rng = random.Random(42)
    pts = [(round(rng.uniform(-89.9, 89.9), 6),
            round(rng.uniform(-180.0, 180.0), 6)) for _ in range(500)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = [
        (r.k, round(r.d, 6))
        for r in df.select(
            dsl.geotile_key(F.col("lat"), F.col("lon"), 9).alias("k"),
            dsl._haversine_m(F.col("lat"), F.col("lon"),
                             F.lit(40.71), F.lit(-74.0)).alias("d"),
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (lat DOUBLE, lon DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pts)
    want = [
        (k, round(d, 6))
        for k, d in con.execute(
            f"SELECT {dsl.geotile_sql('lat', 'lon', 9)}, "
            f"{dsl.haversine_sql('lat', 'lon', '40.71', '-74.0')} FROM t"
        ).fetchall()
    ]
    assert got == want


def test_msearch_template(spark, documents):
    tpls = [
        {"source": {"query": {"range": {"n_chars": {"gte": "{{lo}}"}}},
                    "sort": [{"doc_id": "asc"}], "size": 3,
                    "_source": ["doc_id"]},
         "params": {"lo": lo}}
        for lo in (100, 300)
    ]
    outs = dsl.msearch_template(spark, documents, tpls)
    assert len(outs) == 2
    for lo, out in zip((100, 300), outs):
        want = [r.doc_id for r in documents
                .filter(F.col("n_chars") >= lo).orderBy("doc_id")
                .limit(3).collect()]
        assert [r.doc_id for r in out.collect()] == want


def test_terms_lookup_resolves_from_document(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, color="red", follower_ids=[2, 3]),
        Row(doc_id=2, color="blue", follower_ids=[]),
        Row(doc_id=3, color="red", follower_ids=[1]),
        Row(doc_id=4, color="blue", follower_ids=[1, 2]),
    ])
    # ES terms lookup: ids from doc 1's follower_ids field
    body = {"query": {"terms": {"doc_id": {"id": 1, "path": "follower_ids"}}},
            "sort": [{"doc_id": "asc"}], "size": 10, "_source": ["doc_id"]}
    got = [r.doc_id for r in dsl.search(spark, docs, body).collect()]
    assert got == [2, 3]
    # nested inside bool + a separate lookup table
    users = spark.createDataFrame([Row(doc_id=9, fav_colors=["blue"])])
    body2 = {"query": {"bool": {"filter": [
        {"terms": {"color": {"index": "users", "id": 9, "path": "fav_colors"}}},
    ]}}, "sort": [{"doc_id": "asc"}], "size": 10, "_source": ["doc_id"]}
    got2 = [r.doc_id for r in
            dsl.search(spark, docs, body2, lookups={"users": users}).collect()]
    assert got2 == [2, 4]
    # scalar path value resolves to a one-element list
    body3 = {"query": {"terms": {"color": {"id": 1, "path": "color"}}},
             "sort": [{"doc_id": "asc"}], "size": 10, "_source": ["doc_id"]}
    got3 = [r.doc_id for r in dsl.search(spark, docs, body3).collect()]
    assert got3 == [1, 3]
    with pytest.raises(ValueError, match="no doc"):
        dsl.search(spark, docs,
                   {"query": {"terms": {"color": {"id": 99, "path": "color"}}}})


def test_percolate_numeric_term_parity_single_vs_batch(spark):
    """ADVICE r05 (percolate.py:165): a stored {"term": {"size": 17.0}}
    must match doc size=17 on BOTH percolation paths (single-doc used
    strict string equality; batch had the numeric try_cast fallback)
    — and in the DuckDB oracle."""
    bodies = [(1, {"term": {"size": 17.0}}),
              (2, {"term": {"size": 18.0}}),
              (3, {"term": {"brand": "Brand#32"}})]
    q = P.queries_from_bodies(spark, bodies)
    doc = {"brand": "Brand#32", "size": 17}
    got_single = [r.query_id for r in P.percolate(q, doc).collect()]
    assert got_single == [1, 3]
    docs_df = spark.createDataFrame([Row(doc_id=0, brand="Brand#32", size=17)])
    got_batch = sorted(
        r.query_id
        for r in P.percolate_batch(docs_df, q, text_cols=("brand",)).collect()
    )
    assert got_batch == got_single
    con = duckdb.connect()
    con.register("pq", q.toPandas())
    want = [r[0] for r in
            con.execute(P.percolate_oracle_sql(doc, "pq")).fetchall()]
    assert want == got_single
