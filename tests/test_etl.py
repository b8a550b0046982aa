"""Reference-pipeline regression: the SURVEY §5 invariants over etl.py.

Fixtures follow FIXTURES.md §B (synthetic, seed-fixed).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from es_loaders_spark.etl import (
    ALHENA_TRANSFORMS,
    bin_cells_2d,
    clean_field_names,
    dense_bin_gene_matrix,
    get_gc_bias_data,
    get_qc_data,
    get_segs_data,
    join_cells_samples,
    nest_gene_records,
    normalize_cells,
)


@pytest.fixture(scope="module")
def cells(spark):
    rows = [
        (f"cell{i}", i + 1, f"T.cell.{i % 3}", f"S{i % 4}", float(i) / 10, float(i) / 7)
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "cell_id string, cell_idx long, cell_type string, sample string, `UMAP-1` double, `UMAP-2` double"
    )


def test_normalize_cells(spark, cells):
    out = normalize_cells(cells)
    assert {"x", "y", "sample_id"} <= set(out.columns)
    # '.' → ' ' in values (mira_loader.py:104)
    types = {r["cell_type"] for r in out.select("cell_type").distinct().collect()}
    assert types == {"T cell 0", "T cell 1", "T cell 2"}


def test_normalize_cells_missing_column_raises(spark):
    df = spark.createDataFrame([("c1",)], "cell_id string")
    with pytest.raises(ValueError, match="missing required"):
        normalize_cells(df)


def test_join_integrity(spark, cells):
    norm = normalize_cells(cells)
    samples = spark.createDataFrame(
        [(f"S{i}", f"patient{i}", "site1") for i in range(4)] + [("S0", "dup", "site2")],
        "sample_id string, patient_id string, site string",
    )
    joined = join_cells_samples(norm, samples)  # dedup prevents multiplication
    assert joined.count() == norm.count()
    assert joined.filter(F.col("patient_id").isNull()).count() == 0


def test_alhena_qc_ratio(spark):
    m = spark.createDataFrame(
        [("c1", 25, 100, False), ("c2", 1, 3, True)],
        "cell_id string, unmapped_reads long, total_reads long, is_contaminated boolean",
    )
    rows = {r["cell_id"]: r for r in get_qc_data(m).collect()}
    assert rows["c1"]["percent_unmapped_reads"] == 0.25
    assert rows["c2"]["percent_unmapped_reads"] == 0.3333
    assert rows["c2"]["is_contaminated"] is True  # stays Boolean (F10)


def test_alhena_chrom_pad(spark):
    segs = spark.createDataFrame(
        [("c1", "1", 0, 10), ("c1", "22", 10, 20), ("c1", "X", 20, 30)],
        "cell_id string, chr string, start long, end long",
    )
    got = {r["chr"]: r["chrom_number"] for r in get_segs_data(segs).collect()}
    assert got == {"1": "01", "22": "22", "X": "X"}


def test_alhena_gc_unpivot(spark):
    cols = ", ".join(f"`{i}` double" for i in range(101))
    rows = [tuple(["c1"] + [float(i) for i in range(101)])]
    gc = spark.createDataFrame(rows, f"cell_id string, {cols}")
    out = get_gc_bias_data(gc)
    assert out.count() == 101
    got = {r["gc_percent"]: r["value"] for r in out.collect()}
    assert got[0] == 0.0 and got[100] == 100.0
    assert set(ALHENA_TRANSFORMS) == {"qc", "segs", "bins", "gc_bias"}


def test_clean_field_names(spark):
    df = spark.createDataFrame([(1, 2)], "`a.b` long, c long")
    assert clean_field_names(df).columns == ["a_b", "c"]


def test_nest_gene_records(spark):
    matrix = spark.createDataFrame(
        [(1, 1, 2.0), (2, 1, 3.0), (1, 2, 1.0), (10001, 1, 9.0)],
        "gene_idx long, cell_idx long, log_count double",
    )
    genes = spark.createDataFrame(
        [(1, "GENE_A"), (2, "GENE_B"), (10001, "GENE_FAR")],
        "gene_idx long, gene string",
    )
    out = {r["cell_idx"]: r["genes"] for r in nest_gene_records(matrix, genes).collect()}
    assert [g["gene"] for g in out[1]] == ["GENE_A", "GENE_B"]  # 10001 cut (P3)
    assert out[1][0]["log_count"] == 2.0
    assert [g["gene"] for g in out[2]] == ["GENE_A"]


def test_bin_and_dense_fill(spark):
    cells = spark.createDataFrame(
        [(0.1, 0.2), (0.9, 0.3), (1.5, 0.1)], "x double, y double"
    )
    bins = {(r["x_bin"], r["y_bin"]): r["count"] for r in bin_cells_2d(cells).collect()}
    assert bins == {(0, 0): 2, (1, 0): 1}

    mb = spark.createDataFrame(
        [(0, 0, "GENE_A", 4.0, 2), (0, 0, "GENE_B", 2.0, 2)],
        "x_bin long, y_bin long, gene string, log_count_sum double, cell_count long",
    )
    genes = spark.createDataFrame([("GENE_A",), ("GENE_B",), ("GENE_C",)], "gene string")
    dense = {
        r["gene"]: r["value"] for r in dense_bin_gene_matrix(mb, genes).collect()
    }
    # A4: absent gene emitted as 0 (dense fill), values normalized by cells
    assert dense == {"GENE_A": 2.0, "GENE_B": 1.0, "GENE_C": 0.0}
