"""Driver-side remote sources: HTTP CSV/TSV and REST-JSON ingestion.

The reference fetches metadata over HTTP on the driver and feeds the
rows into its engine (SURVEY §2.1 S4/S5: `requests.get(SAMPLES_URL)` →
records, /root/reference/utils/metadata.py:36-60; `pd.read_csv(url)`
shapes in mira/mira_data.py). The same pattern here: the DRIVER fetches
the (small) remote payload — these are metadata tables, not data-plane
corpora — spools it to a local temp file, and hands it to a distributed
``spark.read``. Data-plane tables never move through this path; they
are parquet scans (S1/S2), where glob patterns (F17) are served
natively by Spark's file index.

Uses only stdlib urllib, so ``file://`` URLs test the full path without
network access.
"""

from __future__ import annotations

import json
import os
import tempfile
import urllib.request

from pyspark.sql import DataFrame, SparkSession


def _fetch(url: str, suffix: str) -> str:
    """Driver-side fetch → local temp file path. Small metadata payloads
    only (the reference's sample/analysis tables are a few KB)."""
    with urllib.request.urlopen(url) as resp:  # noqa: S310 (caller-supplied URL)
        data = resp.read()
    fd, path = tempfile.mkstemp(suffix=suffix, prefix="es_src_")
    with os.fdopen(fd, "wb") as f:
        f.write(data)
    return path


def read_csv_url(
    spark: SparkSession,
    url: str,
    sep: str = ",",
    header: bool = True,
    infer_schema: bool = True,
) -> DataFrame:
    """S4: HTTP(S) CSV/TSV scan (reference: pd.read_csv over a fetched
    response). Driver fetch + distributed ``spark.read.csv``."""
    path = _fetch(url, ".csv")
    return (
        spark.read.option("header", str(header).lower())
        .option("inferSchema", str(infer_schema).lower())
        .option("sep", sep)
        .csv(path)
    )


def read_json_url(spark: SparkSession, url: str, records_key: str | None = None) -> DataFrame:
    """S5: REST-API scan (reference: requests.get(...).json() → record
    list, utils/metadata.py:36-60). Fetches JSON, optionally unwraps a
    top-level key holding the record array, and loads it distributed
    via ``spark.read.json`` (one JSON object per line spool)."""
    path = _fetch(url, ".json")
    with open(path, "rb") as f:
        payload = json.load(f)
    if records_key is not None:
        payload = payload[records_key]
    if isinstance(payload, dict):
        payload = [payload]
    fd, jl = tempfile.mkstemp(suffix=".jsonl", prefix="es_src_")
    with os.fdopen(fd, "w") as f:
        for rec in payload:
            f.write(json.dumps(rec) + "\n")
    os.unlink(path)
    return spark.read.json(jl)


def read_parquet_glob(spark: SparkSession, pattern: str) -> DataFrame:
    """F17: glob scan. Spark's file index expands globs natively —
    this thin wrapper exists to give the operator an explicit, tested
    surface (the reference used ``glob.glob`` + per-file reads,
    alhena_loader.py; here one distributed scan serves all matches)."""
    return spark.read.parquet(pattern)
