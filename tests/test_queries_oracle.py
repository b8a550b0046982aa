"""Mini-driver: run every queries() entry vs its DuckDB oracle at sf0.001.

Replicates the driver's correctness gate (row-count + schema-width +
order-insensitive value compare) so oracle breakage is caught locally
before the round's CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, bool):
                vals.append(str(v).lower())
            elif isinstance(v, float):
                vals.append("0.0" if v == 0 else f"{v:.4f}" if math.isfinite(v) else str(v))
            elif isinstance(v, (list, tuple)):
                vals.append(str(list(v)))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


ALL = sorted(entrymod.queries())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = entrymod.queries()[name]
    df = q(spark, sf_dir)
    got_cols = [c.lower() for c in df.columns]
    got = [tuple(r[c] for c in df.columns) for r in df.collect()]

    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert len(got) >= 0  # rows-only check (driver's weaker gate)
        return
    res = duck.execute(oracle)
    want_cols = [d[0].lower() for d in res.description]
    want = res.fetchall()

    assert got_cols == want_cols, f"{name}: column names differ"
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    # order-insensitive value compare, column order normalized by name
    order = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
    g = normalize([tuple(r[i] for i in order) for r in got])
    w = normalize([tuple(r[i] for i in order) for r in want])
    assert g == w, f"{name}: values differ; first spark={g[:2]} duck={w[:2]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]
