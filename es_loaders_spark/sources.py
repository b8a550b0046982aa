"""Driver-side remote sources: HTTP CSV/TSV, REST-JSON, and SCP staging.

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
import os
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


def fetch_scp(
    remotes: list[str] | str,
    dest_dir: str,
    scp_bin: str = "scp",
    batch_mode: bool = True,
) -> list[str]:
    """S7: SCP bulk staging (reference: SCPClient.get over an SSHClient
    session, mira/mira_data.py:43-129 — cells/genes/matrix/samples TSVs
    pulled from ``juno`` into a local staging directory before loading).

    Control-plane staging only: the reference moves a handful of
    analysis TSVs this way, never the data plane — same contract here.
    Each remote is a standard scp spec (``host:/path`` or
    ``scp://host/path``); files land in ``dest_dir`` under their
    basename, and the staged local paths are returned in input order.
    At 100 TB nothing data-sized ever rides this path: corpora are
    parquet scans over shared storage (S1/S2); this exists so the
    reference's fetch-then-load workflows have a drop-in surface.

    Uses the system ``scp`` binary via subprocess (the sandbox has no
    paramiko; the binary honours ~/.ssh config exactly like the
    reference's ``load_system_host_keys``). ``batch_mode`` adds ``-B``
    so an unreachable host fails loudly instead of prompting. Raises
    FileNotFoundError when no scp binary exists and RuntimeError on a
    non-zero exit (stderr included).
    """
    import shutil as _shutil
    import subprocess

    if _shutil.which(scp_bin) is None:
        raise FileNotFoundError(
            f"scp binary {scp_bin!r} not found on PATH; install OpenSSH "
            "client or pass scp_bin="
        )
    if isinstance(remotes, str):
        remotes = [remotes]
    os.makedirs(dest_dir, exist_ok=True)
    staged: list[str] = []
    for remote in remotes:
        spec = remote
        port: str | None = None
        if spec.startswith("scp://"):
            # scp://host[:port]/abs/path → host:/abs/path (+ scp -P port)
            rest = spec[len("scp://"):]
            host, _, path = rest.partition("/")
            if ":" in host:
                host, _, port = host.partition(":")
                if not port.isdigit():
                    raise ValueError(f"bad port in scp URL {remote!r}")
            spec = f"{host}:/{path}"
        base = os.path.basename(spec.split(":", 1)[-1])
        dest = os.path.join(dest_dir, base)
        # "--" ends option parsing: a spec starting with "-" must never be
        # read as an scp option (-oProxyCommand=... injection; ADVICE r04)
        cmd = (
            [scp_bin]
            + (["-B"] if batch_mode else [])
            + (["-P", port] if port else [])
            + ["--", spec, dest]
        )
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise RuntimeError(
                f"scp failed ({proc.returncode}) for {remote!r}: "
                f"{proc.stderr.strip()}"
            )
        staged.append(dest)
    return staged


def read_tsv_scp(
    spark: SparkSession,
    remote: str,
    dest_dir: str,
    sep: str = "\t",
    scp_bin: str = "scp",
) -> DataFrame:
    """S7 fetch → S1 load in one call (the reference's download-then-
    ``pd.read_csv`` sequence, mira_data.py → mira_loader.py): stage one
    remote TSV via :func:`fetch_scp`, parse on the driver, ship rows to
    the cluster via createDataFrame — cluster-safe like the other
    driver-side sources (a driver-local temp path handed to
    ``spark.read`` would be unreadable from executors)."""
    import pandas as pd

    local = fetch_scp(remote, dest_dir, scp_bin=scp_bin)[0]
    return spark.createDataFrame(pd.read_csv(local, sep=sep))
