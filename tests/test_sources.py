"""Driver-side remote sources (S4 HTTP CSV / S5 REST JSON / F17 glob).

file:// URLs exercise the full fetch→spool→distributed-read path with
no network dependency (urllib treats them as ordinary URLs).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from es_loaders_spark.sources import read_csv_url, read_json_url, read_parquet_glob


@pytest.fixture()
def csv_url(tmp_path):
    p = tmp_path / "samples.csv"
    p.write_text("sample_id,patient,qc\nS1,P1,0.91\nS2,P1,0.83\nS3,P2,0.99\n")
    return f"file://{p}"


def test_read_csv_url(spark, csv_url):
    df = read_csv_url(spark, csv_url)
    assert df.columns == ["sample_id", "patient", "qc"]
    assert df.count() == 3
    assert df.filter(F.col("patient") == "P1").count() == 2
    # schema inferred: qc is numeric
    assert dict(df.dtypes)["qc"] == "double"


def test_read_csv_url_tsv(spark, tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text("a\tb\n1\tx\n2\ty\n")
    df = read_csv_url(spark, f"file://{p}", sep="\t")
    assert [r["a"] for r in df.orderBy("a").collect()] == [1, 2]


def test_read_json_url_records_key(spark, tmp_path):
    """The reference's REST shape: a top-level key holding the record
    array (utils/metadata.py:36-60 response.json())."""
    p = tmp_path / "api.json"
    p.write_text(
        json.dumps(
            {"hits": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}], "total": 2}
        )
    )
    df = read_json_url(spark, f"file://{p}", records_key="hits")
    assert df.count() == 2
    assert {r["name"] for r in df.collect()} == {"a", "b"}


def test_read_json_url_bare_list(spark, tmp_path):
    p = tmp_path / "list.json"
    p.write_text(json.dumps([{"k": i} for i in range(5)]))
    df = read_json_url(spark, f"file://{p}")
    assert sorted(r["k"] for r in df.collect()) == list(range(5))


def test_read_parquet_glob(spark, sf_dir, tmp_path):
    """Glob over part files == the table scan (one distributed scan,
    not the reference's per-file driver loop)."""
    whole = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = str(tmp_path / "docs_parts")
    whole.repartition(3).write.parquet(d)
    globbed = read_parquet_glob(spark, f"{d}/part-*.parquet")
    assert globbed.count() == whole.count()
    a = whole.agg(F.sum("doc_id")).first()[0]
    b = globbed.agg(F.sum("doc_id")).first()[0]
    assert a == b


def test_read_json_url_all_null_and_nested(spark, tmp_path):
    """read.json inference semantics survive the cluster-safe path:
    all-null fields become string columns (no raise), nested objects
    become STRUCTs, not maps."""
    p = tmp_path / "n.json"
    p.write_text(json.dumps([
        {"a": 1, "b": None, "meta": {"x": 1, "y": "s"}},
        {"a": 2, "b": None, "meta": {"x": 2, "y": "t"}},
    ]))
    df = read_json_url(spark, f"file://{p}")
    assert df.count() == 2
    kinds = dict(df.dtypes)
    assert kinds["b"] == "string"           # all-null → string, no crash
    assert kinds["meta"].startswith("struct")  # struct, not map
    assert df.select("meta.x").rdd.map(lambda r: r[0]).sum() == 3
