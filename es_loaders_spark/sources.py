"""Driver-side remote sources: HTTP CSV/TSV and REST-JSON ingestion.

The reference fetches metadata over HTTP on the driver and feeds the
rows into its engine (SURVEY §2.1 S4/S5: `requests.get(SAMPLES_URL)` →
records, /root/reference/utils/metadata.py:36-60; `pd.read_csv(url)`
shapes in mira/mira_data.py). The same pattern here: the DRIVER fetches
and parses the (small) remote payload — these are metadata tables of a
few KB, not data-plane corpora — and ships the rows to the cluster via
``createDataFrame`` (Arrow), so the path works on a real multi-node
cluster (a driver-local temp file handed to ``spark.read`` would be
unreadable from executors). Data-plane tables never move through this
path; they are parquet scans (S1/S2), where glob patterns (F17) are
served natively by Spark's file index.

Uses only stdlib urllib + pandas, so ``file://`` URLs test the full
path without network access.
"""

from __future__ import annotations

import io
import json
import urllib.request

from pyspark.sql import DataFrame, SparkSession


def _fetch(url: str) -> bytes:
    """Driver-side fetch. Small metadata payloads only (the reference's
    sample/analysis tables are a few KB)."""
    with urllib.request.urlopen(url) as resp:  # noqa: S310 (caller-supplied URL)
        return resp.read()


def read_csv_url(
    spark: SparkSession,
    url: str,
    sep: str = ",",
    header: bool = True,
    infer_schema: bool = True,
) -> DataFrame:
    """S4: HTTP(S) CSV/TSV scan (reference: pd.read_csv over a fetched
    response). Driver fetch + parse → distributed DataFrame."""
    import pandas as pd

    pdf = pd.read_csv(
        io.BytesIO(_fetch(url)),
        sep=sep,
        header=0 if header else None,
        dtype=None if infer_schema else str,
    )
    return spark.createDataFrame(pdf)


def read_json_url(spark: SparkSession, url: str, records_key: str | None = None) -> DataFrame:
    """S5: REST-API scan (reference: requests.get(...).json() → record
    list, utils/metadata.py:36-60). Fetches JSON on the driver,
    optionally unwraps a top-level key holding the record array, and
    ships the records to the cluster (schema inferred from the rows)."""
    payload = json.loads(_fetch(url))
    if records_key is not None:
        payload = payload[records_key]
    if isinstance(payload, dict):
        payload = [payload]
    # spark.read.json over a parallelized string RDD: cluster-safe (rows
    # ship with the job, no driver-local path) AND keeps read.json's
    # inference — all-null fields become string columns and nested
    # objects become STRUCTs (createDataFrame(list[dict]) raised on
    # all-null fields and inferred maps instead)
    lines = spark.sparkContext.parallelize([json.dumps(r) for r in payload])
    return spark.read.json(lines)


def read_parquet_glob(spark: SparkSession, pattern: str) -> DataFrame:
    """F17: glob scan. Spark's file index expands globs natively —
    this thin wrapper exists to give the operator an explicit, tested
    surface (the reference used ``glob.glob`` + per-file reads,
    alhena_loader.py; here one distributed scan serves all matches)."""
    return spark.read.parquet(pattern)
