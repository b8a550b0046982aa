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


# --- r6c: BPE-ish token counting + rolling-hash fingerprints ------------

# GPT-2-style pre-tokenizer subset, restricted to syntax BOTH regex
# dialects (Java in Spark, RE2 in DuckDB) execute identically: the
# contraction suffixes, space-prefixed letter runs, space-prefixed digit
# runs, space-prefixed punctuation runs. (The full GPT-2 pattern's
# \s+(?!\S) lookahead is not RE2-expressible — whitespace runs between
# tokens are simply not counted, which is what a tokens-per-doc budget
# wants anyway.) Whitespace is an EXPLICIT ASCII class, not \s: Java's
# \s includes vertical tab, RE2's does not, so \s would make the two
# engines disagree on documents containing \x0B.
BPE_SPLIT_RE = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
    r"| ?[^A-Za-z0-9 \t\n\r\f\x0B]+"
)

# rolling-hash parameters (Rabin–Karp over the analyzer token stream):
# per-token value = portable md5 hash mod M, combined acc = (acc·B + h)
# mod M. M = 2^31−1 keeps acc·B < 2^51, exact in int64 in both engines.
ROLL_BASE = 1_000_003
ROLL_MOD = 2_147_483_647


def bpe_token_count_col(text_col: Column) -> Column:
    """LLM token-budget estimate: count of BPE-ish pre-tokenizer pieces
    (a real BPE would split rare words further; this regex matches the
    GPT-2 pre-tokenizer's piece boundaries for ASCII text). Raw case —
    BPE vocabularies are case-sensitive."""
    return F.size(F.regexp_extract_all(text_col, F.lit(BPE_SPLIT_RE), 0))


def _tokens_arr(text_col: Column) -> Column:
    return F.filter(
        F.split(F.lower(text_col), SPLIT_RE_JAVA), lambda t: t != F.lit("")
    )


def _phash_mod(t: Column) -> Column:
    # ONE hash definition engine-wide (dedup.portable_hash60 — the
    # documented DuckDB md5 expression), reduced mod ROLL_MOD
    from .dedup import portable_hash60

    return portable_hash60(t) % F.lit(ROLL_MOD)


def rolling_hash_col(text_col: Column) -> Column:
    """Rabin–Karp rolling hash of the analyzer token stream — one
    F.aggregate HOF, zero shuffle, O(tokens) per doc. Unlike the md5
    fingerprint (whole-text), the polynomial form is INCREMENTAL: the
    hash of chunk A ++ chunk B is derivable from the chunks' hashes and
    lengths, so a 100-TB ingest can fingerprint streamed chunks and
    combine, never holding a document in one buffer. DuckDB twin:
    list_reduce over the identical arithmetic."""
    return F.aggregate(
        _tokens_arr(text_col),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(ROLL_BASE) + _phash_mod(t))
        % F.lit(ROLL_MOD),
    )


def winnow_fingerprints(
    df: DataFrame, k: int = 5, w: int = 4, text_col: str = "text"
) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every k-token shingle, slide a window of w hashes,
    keep each window's MINIMUM, emit the distinct survivors as
    (doc_id, fp) rows.

    Guarantee: any shared token run of length >= w + k - 1 between two
    documents shares at least one fingerprint — bounded-density
    substring matching, the classic document-fingerprinting complement
    to MinHash's set-similarity (dedup.py). Pure array HOFs until the
    final explode: zero shuffle, O(tokens) per doc."""
    empty = F.array().cast("array<long>")
    toks = _tokens_arr(F.col(text_col))
    n = F.size(toks)
    # guard short docs: Spark's sequence(1, 0) DESCENDS instead of being
    # empty, which would index past the array — emit no fingerprints for
    # docs shorter than k (and windows shorter than w) instead
    shingle_hashes = F.when(
        n >= F.lit(k),
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: _phash_mod(F.concat_ws(" ", F.slice(toks, i, k))),
        ),
    ).otherwise(empty)
    m = F.size(shingle_hashes)
    mins = F.when(
        m >= F.lit(w),
        F.transform(
            F.sequence(F.lit(1), m - F.lit(w - 1)),
            lambda j: F.array_min(F.slice(shingle_hashes, j, w)),
        ),
    ).otherwise(empty)
    return (
        df.select("doc_id", F.explode(F.array_distinct(mins)).alias("fp"))
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Both token budgets per doc: analyzer/whitespace tokens and the
    BPE-ish pre-tokenizer count (the LLM cost estimate)."""
    return df.select(
        "doc_id",
        token_count_col(F.col(text_col)).alias("ws_tokens"),
        bpe_token_count_col(F.col(text_col)).alias("bpe_tokens"),
    )
