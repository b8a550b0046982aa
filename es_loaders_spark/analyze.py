"""Tokenizer / analyzer.

The reference maps every string field to ES ``keyword`` (exact match,
no analysis — utils/elasticsearch.py:42-56); free-text BM25 search is
the implicit capability of the ES indices it creates
(mira/elasticsearch.py:181-186). Our analyzer is therefore pinned to
Lucene-StandardAnalyzer-compatible semantics on the web-page ``text``
column: Unicode word boundaries approximated as maximal runs of
letters/digits, lowercased. No stemming, no stopword removal (Lucene
StandardAnalyzer default).

Two equivalent implementations:

- ``tokens_df`` — pure Catalyst (lower → regexp split → explode/posexplode),
  JVM-side, whole-stage-codegen; the hot path for index builds.
- ``tokenize_texts`` — vectorized pandas path used inside ``mapInPandas``
  stages of the partition-local build (build.py), where tokenization is
  fused with posting construction in one Arrow pass.

Both use the same token grammar so they are interchangeable; DuckDB
oracle SQL mirrors it with the RE2 class ``[^\\pL\\pN]+``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java regex (Spark split) — splits on any run of non-letter/non-digit.
SPLIT_RE_JAVA = r"[^\p{L}\p{N}]+"
# RE2 flavor for the DuckDB oracle.
SPLIT_RE_DUCKDB = r"[^\pL\pN]+"
# Python flavor ([^\W_] == letter or digit under re.UNICODE).
_TOKEN_RE_PY = re.compile(r"[^\W_]+", re.UNICODE)


def terms_array(text_col: Column) -> Column:
    """array<string> of analyzed terms for a text column (JVM-side)."""
    arr = F.split(F.lower(text_col), SPLIT_RE_JAVA)
    return F.filter(arr, lambda t: t != F.lit(""))


def tokens_df(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Explode documents into (doc_id, pos, term) — one row per token.

    Positions are per-document token offsets (0-based) so phrase-style
    consumers can be layered later; posting builds only need (doc_id, term).
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(terms_array(F.col(text_col))).alias("pos", "term"),
    )


def tokenize_text(text: str) -> list[str]:
    """Single-string tokenizer (oracle/tests)."""
    return [t.lower() for t in _TOKEN_RE_PY.findall(text)]


def tokenize_texts(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized batch tokenizer: Series[str] → (doc_offsets, flat_terms).

    ``doc_offsets`` has len(texts)+1 entries; tokens of document i are
    ``flat_terms[doc_offsets[i]:doc_offsets[i+1]]``. Uses pandas C string
    ops (no per-row Python in the caller's loop).
    """
    token_lists = texts.str.lower().str.findall(_TOKEN_RE_PY)
    lens = token_lists.str.len().to_numpy(dtype=np.int64)
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = np.concatenate([np.asarray(t, dtype=object) for t in token_lists]) if len(
        token_lists
    ) else np.empty(0, dtype=object)
    return offsets, flat


def oracle_tokens_sql(doc_table: str = "documents", text_col: str = "text") -> str:
    """DuckDB SQL producing the same (doc_id, term) token multiset."""
    return f"""
        SELECT doc_id, t AS term
        FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower({text_col}), '{SPLIT_RE_DUCKDB}')) AS t
            FROM {doc_table}
        )
        WHERE t <> ''
    """


def analyze_api(text: str) -> list[dict]:
    """ES ``_analyze`` response shape: tokens with character offsets and
    positions, under the engine's single analyzer grammar (the same
    regex tokenize_text uses — parity asserted in tests)."""
    return [
        {
            "token": m.group(0).lower(),
            "start_offset": m.start(),
            "end_offset": m.end(),
            "position": i,
        }
        for i, m in enumerate(_TOKEN_RE_PY.finditer(text))
    ]
