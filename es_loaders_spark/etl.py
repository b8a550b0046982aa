"""Reference ETL pipelines re-expressed as Spark DataFrame transforms.

The reference's own operator payload — the four Alhena hmmcopy
transforms (alhena/alhena_loader.py:46-91) and the Mira cells
normalization/nesting pipeline (mira/mira_loader.py:94-138, 231-250,
350-355) — re-built 1:1 on DataFrames so its inline runtime assertions
(SURVEY §5 table) become a regression suite. Fixture shapes per
FIXTURES.md §B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- Alhena (alhena/alhena_loader.py) ---------------------------------------


def get_qc_data(metrics: DataFrame) -> DataFrame:
    """annotation_metrics → qc docs (alhena_loader.py:46-56).

    percent_unmapped_reads = unmapped/total (F5); is_contaminated kept
    Boolean natively (reference coerces to 'true'/'false' strings for the
    ES keyword template, F10 — SURVEY §1.2 keeps the honest type).
    """
    return metrics.withColumn(
        "percent_unmapped_reads",
        F.round(F.col("unmapped_reads") / F.col("total_reads"), 4),
    )


def get_segs_data(segs: DataFrame) -> DataFrame:
    """hmmcopy segs → seg docs with zero-padded chrom_number
    (alhena_loader.py:59-63, 80-82: chr '1'→'01', 'X'/'Y' kept)."""
    return segs.withColumn(
        "chrom_number",
        F.when(
            F.col("chr").rlike("^[0-9]+$"), F.lpad(F.col("chr"), 2, "0")
        ).otherwise(F.col("chr")),
    )


def get_bins_data(reads: DataFrame) -> DataFrame:
    """hmmcopy reads → bin docs (alhena_loader.py:66-68): same chrom pad."""
    return get_segs_data(reads)


def get_gc_bias_data(gc: DataFrame, max_pct: int = 100) -> DataFrame:
    """gc_metrics wide('0'..'100') → long (cell_id, gc_percent, value)
    (alhena_loader.py:70-77, unpivot F12)."""
    pairs = ", ".join(f"'{i}', `{i}`" for i in range(max_pct + 1))
    return gc.select(
        "cell_id",
        F.expr(f"stack({max_pct + 1}, {pairs}) AS (gc_percent, value)"),
    ).withColumn("gc_percent", F.col("gc_percent").cast("int"))


# name-dispatched table UDFs without eval() (alhena_loader.py:37-44, D1)
ALHENA_TRANSFORMS = {
    "qc": get_qc_data,
    "segs": get_segs_data,
    "bins": get_bins_data,
    "gc_bias": get_gc_bias_data,
}


def clean_field_names(df: DataFrame) -> DataFrame:
    """'.' in column names → '_' (alhena_loader.py:121-130, F2)."""
    for c in df.columns:
        if "." in c:
            df = df.withColumnRenamed(c, c.replace(".", "_"))
    return df


# --- Mira (mira/mira_loader.py) ----------------------------------------------

UMAP_SPELLINGS = {
    "UMAP-1": "x", "UMAP-2": "y",
    "umap50_1": "x", "umap50_2": "y",
    "UMAP_1": "x", "UMAP_2": "y",
    "umapharmony_1": "x", "umapharmony_2": "y",
    "sample": "sample_id",
    "genes": "gene",
}


def normalize_cells(cells: DataFrame) -> DataFrame:
    """Mira cells normalization (mira_loader.py:96-122):

    - cell_id / cell_idx synthesized from position if absent (96-102;
      here: deterministic zipWithIndex-free rank over input order is not
      reproducible in a distributed table, so absence is an error — the
      reference's CSV row-order dependence is exactly what deterministic
      docIDs replace, SURVEY §1.4),
    - '.' → ' ' in cell_type values (104, F1),
    - the five UMAP column spellings → x/y; sample → sample_id (122, P2).
    """
    for old, new in UMAP_SPELLINGS.items():
        if old in cells.columns and new not in cells.columns:
            cells = cells.withColumnRenamed(old, new)
    if "cell_type" in cells.columns:
        cells = cells.withColumn(
            "cell_type", F.regexp_replace("cell_type", r"\.", " ")
        )
    required = {"cell_id", "cell_idx", "x", "y", "sample_id"}
    missing = required - set(cells.columns)
    if missing:
        raise ValueError(f"cells table missing required columns: {sorted(missing)}")
    return cells


def join_cells_samples(
    cells: DataFrame, samples: DataFrame, check_counts: bool = False
) -> DataFrame:
    """Left join with FK integrity (mira_loader.py:121-134, J2).

    The reference asserts before==after row count at runtime. Here the
    build side is PK-deduped FIRST, so the left join provably cannot
    multiply rows — the invariant holds by construction and no action
    runs by default (VERDICT r02: the two eager count()s materialized
    the fact table twice inside a library transform). Pass
    ``check_counts=True`` to run the reference's runtime assertion.
    """
    samples_pk = samples.dropDuplicates(["sample_id"])
    joined = cells.join(F.broadcast(samples_pk), "sample_id", "left")
    if check_counts:
        before, after = cells.count(), joined.count()
        if before != after:
            raise AssertionError(f"left join changed row count: {before} → {after}")
    return joined


def nest_gene_records(matrix: DataFrame, genes: DataFrame, max_gene_idx: int = 10000) -> DataFrame:
    """get_records (mira_loader.py:231-250, A2/D3): per cell, the nested
    genes array [{gene, log_count}], after the gene_idx < 10000 cut (P3).

    matrix: (gene_idx, cell_idx, log_count) 1-based COO (FIXTURES B3);
    genes: (gene_idx, gene).
    """
    cut = matrix.filter(F.col("gene_idx") < max_gene_idx)
    withg = cut.join(F.broadcast(genes), "gene_idx")
    return withg.groupBy("cell_idx").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("gene").alias("gene"), F.col("log_count")))
        ).alias("genes")
    )


def bin_cells_2d(cells: DataFrame, bin_size: float = 1.0) -> DataFrame:
    """load_bins grid count (mira_loader.py:350-355, A1/F6):
    cells per (x//bin, y//bin)."""
    return (
        cells.select(
            F.floor(F.col("x") / bin_size).alias("x_bin"),
            F.floor(F.col("y") / bin_size).alias("y_bin"),
        )
        .groupBy("x_bin", "y_bin")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def dense_bin_gene_matrix(matrix_binned: DataFrame, genes: DataFrame) -> DataFrame:
    """Normalized dense fill (mira_loader.py:403-432, A4): per (bin, gene),
    value = sum(log_count)/cell_count with 0 for absent genes.

    matrix_binned: (x_bin, y_bin, gene, log_count_sum, cell_count).
    The dense cross product is the reference's choice; expressed as
    bins × genes crossJoin + left join + coalesce(0).
    """
    bins = matrix_binned.select("x_bin", "y_bin", "cell_count").distinct()
    dense = bins.crossJoin(F.broadcast(genes.select("gene")))
    sums = matrix_binned.select("x_bin", "y_bin", "gene", "log_count_sum")
    return (
        dense.join(sums, ["x_bin", "y_bin", "gene"], "left")
        .select(
            "x_bin",
            "y_bin",
            "gene",
            F.round(
                F.coalesce(F.col("log_count_sum"), F.lit(0.0))
                / F.col("cell_count").cast("double"),
                4,
            ).alias("value"),
        )
    )
