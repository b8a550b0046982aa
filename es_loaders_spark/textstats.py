"""Text analysis operators for a large-scale training-data pipeline.

Language-ID (marker-token heuristic), quality scoring (length/punct/
stopword ratios), token counting, and document fingerprinting — all pure
Catalyst expressions (JVM, whole-stage codegen; no Python in the hot
path), each with a DuckDB-expressible twin in queries.py so the driver's
oracle gate covers them.

The reference's analogues are its scalar normalization functions
(SURVEY §2.8: ratio F5, rounding F8, string encode F3/F4) — same shape,
applied to web text instead of QC metrics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .analyze import SPLIT_RE_JAVA

# stopword-class markers per language (closed lists shared with the oracle)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "is", "for"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "de", "que", "los", "las"],
    "de": ["der", "die", "und", "das", "nicht"],
}

STOPWORDS_EN = ["the", "of", "and", "to", "a", "in", "is", "for", "on", "that"]


def token_count_col(text_col: Column) -> Column:
    """Number of analyzer tokens (JVM split, matches analyze.py grammar)."""
    return F.size(
        F.filter(F.split(F.lower(text_col), SPLIT_RE_JAVA), lambda t: t != F.lit(""))
    )


def _marker_hits(text_col: Column, markers: list[str]) -> Column:
    """How many tokens of ``text`` are in ``markers`` (count occurrences)."""
    toks = F.filter(F.split(F.lower(text_col), SPLIT_RE_JAVA), lambda t: t != F.lit(""))
    return F.size(F.filter(toks, lambda t: t.isin(markers)))


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc marker-hit counts per language + predicted language.

    Argmax with deterministic tie-break on language code (alphabetical).
    """
    cols = [
        _marker_hits(F.col(text_col), m).alias(f"hits_{lang}")
        for lang, m in sorted(LANG_MARKERS.items())
    ]
    scored = df.select("doc_id", *cols)
    # argmax via greatest + chained when (ties → first alphabetical lang)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = None
    for lang in langs:
        cond = F.col(f"hits_{lang}") == best
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return scored.withColumn("pred_lang", pred)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: lengths, punctuation ratio, stopword ratio.

    All ratios rounded to 4 decimals (engine-wide comparison surface).
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    n_tokens = token_count_col(text)
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    n_stop = _marker_hits(text, STOPWORDS_EN)
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 4).alias("chars_per_token"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic content fingerprint: md5 of lowercased trimmed text.

    md5 (not xxhash64) so the DuckDB oracle computes the identical value.
    """
    return df.select(
        "doc_id",
        F.md5(F.encode(F.lower(F.trim(F.col(text_col))), "utf-8")).alias("fp"),
    )
