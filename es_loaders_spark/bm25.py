"""Exact BM25 top-k scorer as a pure Catalyst plan (SURVEY §7 step 3).

Semantics pinned to Lucene's BM25Similarity (the scoring ES applies
implicitly on every ``search`` the reference issues — SURVEY §2.6 T3,
§2.9 X4):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm     = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q, d) = Σ_{t ∈ unique(q)} idf(t) * tf_norm(t, d)
    k1 = 1.2, b = 0.75; ties broken by doc_id ascending.

Duplicate query terms are deduplicated (documented divergence from
Lucene's per-occurrence boost; fixed and mirrored in the oracle).

Plan shape: postings ⨝ broadcast(query terms) ⨝ doc_lens → per-term
score → groupBy(doc_id) sum → TakeOrderedAndProject(k). Every
expression is a built-in function (whole-stage codegen); the only
Python is plan construction. This scorer is the rank-identity reference
for the block-max WAND engine (wand.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analyze import SPLIT_RE_DUCKDB, tokenize_text
from .postings import B, K1, CorpusStats

SCORE_DECIMALS = 4  # rounding applied on comparison surfaces (float hashing)


def bm25_score_expr(stats: CorpusStats, k1: float = K1, b: float = B):
    """Per-(term,doc) BM25 contribution; needs columns tf, df, dl."""
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(stats.n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    norm = F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.lit(float(stats.avgdl))
    return idf * tf * F.lit(k1 + 1.0) / (tf + F.lit(k1) * norm)


def bm25_scores(
    spark: SparkSession,
    postings: DataFrame,
    doc_lens: DataFrame,
    tdf: DataFrame,
    stats: CorpusStats,
    query: str,
    rounded: bool = True,
) -> DataFrame:
    """Full scored relation (doc_id, score) — every doc matching ≥1 query
    term, NO order / NO limit. ``rounded=False`` keeps the raw float sum:
    compound scoring transforms (function_score, dis_max, boosting,
    rescore) must transform the RAW score and round once at the end —
    multiplying an already-4dp-rounded score by a constant like 0.3 puts
    every doc whose 4th decimal is 5 exactly on a decimal round-half
    boundary, where Spark's BigDecimal HALF_UP and DuckDB's double
    rounding systematically disagree. Raw sums keep boundary hits
    measure-zero, the same property the plain bm25 gate relies on.

    This is the building block for compound scoring queries whose final
    order is NOT the BM25 order (function_score, boosting, collapse,
    rescore, dis_max): truncating the base query at k before the score
    transform would silently drop docs the transform promotes, so those
    operators must start from the un-truncated relation. Cost equals the
    exact join scorer's aggregation (the limit was never pushed below
    the groupBy anyway); the block-max WAND path cannot serve these —
    per-doc multipliers break its score upper bounds, exactly why ES
    disables dynamic pruning for function_score too.
    """
    # query may be a raw string (default StandardAnalyzer grammar) or a
    # pre-analyzed term list — the caller's analysis chain (stopwords /
    # synonyms / stemmer, analyze.AnalysisChain.tokens) applied upstream
    if isinstance(query, (list, tuple)):
        terms = sorted(set(query))
    else:
        terms = sorted(set(tokenize_text(query)))
    qterms = spark.createDataFrame([(t,) for t in terms], "term string")
    total = F.sum("contrib")
    if rounded:
        total = F.round(total, SCORE_DECIMALS)
    # ONE broadcast join restricts postings to the query terms AND
    # attaches df: tdf ⋈ qterms is already exactly the query terms
    # present in the corpus, so the r6 plan's extra broadcast(qterms)
    # join was redundant — one fewer BroadcastExchange/AQE stage per
    # query, which on a warm-cache corpus is mostly driver planning time
    # (guide §2.4; measured: execution 0.12 s vs 1.6 s per fresh query)
    return (
        postings.join(F.broadcast(tdf.join(qterms, "term")), "term")
        .join(doc_lens, "doc_id")
        .withColumn("contrib", bm25_score_expr(stats))
        .groupBy("doc_id")
        .agg(total.alias("score"))
    )


def bm25_topk(
    spark: SparkSession,
    postings: DataFrame,
    doc_lens: DataFrame,
    tdf: DataFrame,
    stats: CorpusStats,
    query: str,
    k: int = 10,
) -> DataFrame:
    """Top-k (doc_id, score) for a free-text query, exact join scorer."""
    scored = bm25_scores(spark, postings, doc_lens, tdf, stats, query)
    # order by the ROUNDED score then doc_id: float sums are order-sensitive
    # at the ulp level, so ranking on raw sums is not reproducible across
    # engines/plans; rounding defines the tie surface (SURVEY §7 "What's hard")
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def bm25_explain(
    spark: SparkSession,
    postings: DataFrame,
    doc_lens: DataFrame,
    tdf: DataFrame,
    stats: CorpusStats,
    query: str,
    doc_id: int,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """ES ``_explain`` analogue: the per-term BM25 breakdown for ONE doc.

    One row per query term PRESENT in the doc: (term, tf, df, dl, idf,
    tf_norm, weight) with weight = idf * tf_norm — the summands of
    bm25_topk's score (``round(sum(weight), 4)`` reproduces it). Same
    plan shape as the scorer, restricted to one doc_id (a pushdown
    predicate on the postings scan), so explain costs one pruned read,
    not a re-score of the corpus.
    """
    terms = sorted(set(tokenize_text(query)))
    qterms = spark.createDataFrame([(t,) for t in terms], "term string")
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(stats.n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    norm = F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.lit(float(stats.avgdl))
    tf_norm = tf * F.lit(k1 + 1.0) / (tf + F.lit(k1) * norm)
    return (
        postings.filter(F.col("doc_id") == int(doc_id))
        .join(F.broadcast(tdf.join(qterms, "term")), "term")
        .join(doc_lens.filter(F.col("doc_id") == int(doc_id)), "doc_id")
        .select(
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("dl").cast("long").alias("dl"),
            F.round(idf, 6).alias("idf"),
            F.round(tf_norm, 6).alias("tf_norm"),
            F.round(idf * tf_norm, 4).alias("weight"),
        )
        .orderBy("term")
    )


def bm25_explain_oracle_sql(
    query: str,
    doc_id: int,
    doc_table: str = "documents",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> str:
    """DuckDB twin of bm25_explain (same components, same rounding)."""
    terms = sorted(set(tokenize_text(query)))
    terms_values = ", ".join(f"('{t}')" for t in terms)
    return f"""
        WITH toks AS (
            SELECT doc_id, t AS term
            FROM (SELECT doc_id,
                         unnest(regexp_split_to_array(lower({text_col}),
                                                      '{SPLIT_RE_DUCKDB}')) AS t
                  FROM {doc_table})
            WHERE t <> ''
        ),
        q(term) AS (VALUES {terms_values}),
        dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dls),
        tfs AS (
            SELECT term, count(*) AS tf FROM toks
            WHERE doc_id = {int(doc_id)} AND term IN (SELECT term FROM q)
            GROUP BY term
        ),
        dfs AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM toks
            WHERE term IN (SELECT term FROM q) GROUP BY term
        )
        SELECT t.term, t.tf, d.df, l.dl,
               round(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)), 6) AS idf,
               round(t.tf * ({k1} + 1.0)
                     / (t.tf + {k1} * (1.0 - {b} + {b} * l.dl / s.avgdl)), 6)
                   AS tf_norm,
               round(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                     * (t.tf * ({k1} + 1.0)
                        / (t.tf + {k1} * (1.0 - {b} + {b} * l.dl / s.avgdl))),
                     4) AS weight
        FROM tfs t
        JOIN dfs d USING (term)
        JOIN dls l ON l.doc_id = {int(doc_id)}
        CROSS JOIN stats s
        ORDER BY t.term
    """


def bm25_topk_filtered(
    spark: SparkSession,
    postings: DataFrame,
    doc_lens: DataFrame,
    tdf: DataFrame,
    stats: CorpusStats,
    query: str,
    filter_term: str,
    k: int = 10,
) -> DataFrame:
    """ES bool query: relevance scoring under a non-scoring term filter.

    The reference composes exactly this shape — ``bool.filter.term``
    around a query (mira/elasticsearch.py:104-124) — and ES semantics are
    that FILTER context does not contribute to (or change) BM25 scores:
    corpus stats and dfs stay global; the filter only restricts the
    candidate set. Implemented as a left-semi join against the filter
    term's postings (index-shaped lookup, no text scan).
    """
    allowed = postings.filter(F.col("term") == filter_term).select("doc_id")
    return bm25_topk(
        spark,
        postings.join(allowed.hint("broadcast"), "doc_id", "left_semi"),
        doc_lens,
        tdf,
        stats,
        query,
        k,
    )


def bm25_topk_oracle_sql(
    query: str,
    k: int = 10,
    doc_table: str = "documents",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    filter_term: str | None = None,
    candidate_clause: str | None = None,
    raw: bool = False,
    chain=None,
) -> str:
    """DuckDB SQL computing the identical top-k (rank-identity oracle).

    ``candidate_clause``: optional raw boolean SQL over ``p.doc_id``
    (the ``tokens``/``postings``/``doc_lens`` CTEs are in scope) that
    restricts the scored candidate set — the twin of a Spark-side
    semi/anti-join restriction (simple_query_string, operator=and).

    ``raw=True`` returns the full UN-rounded, UN-ordered scored relation
    (``k`` ignored) — the twin of ``bm25_scores(rounded=False)`` for
    compound scoring transforms, which must round once at the end.

    ``chain`` (analyze.AnalysisChain): applies the index's configured
    stop/synonym/stem filters to BOTH the tokens CTE (doc side — dl
    counts survivors, Lucene norm semantics) and the query terms, the
    DuckDB twin of a chained index build + chained query analysis.
    """
    if chain is not None:
        terms = sorted(set(chain.tokens(query)))
        keep = chain.sql_keep("t")
        tokens_sel = f"{chain.sql_term('t')} AS term"
        tokens_where = f"WHERE t <> '' AND {keep}"
    else:
        terms = sorted(set(tokenize_text(query)))
        tokens_sel = "t AS term"
        tokens_where = "WHERE t <> ''"
    terms_values = ", ".join(f"('{t}')" for t in terms)
    conds = []
    if filter_term:
        conds.append(
            "p.doc_id IN (SELECT doc_id FROM postings WHERE term = "
            f"'{filter_term}')"
        )
    if candidate_clause:
        conds.append(f"({candidate_clause})")
    filter_clause = f"WHERE {' AND '.join(conds)}" if conds else ""
    return f"""
WITH tokens AS (
    SELECT doc_id, {tokens_sel}
    FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower({text_col}), '{SPLIT_RE_DUCKDB}')) AS t
        FROM {doc_table}
    ) {tokens_where}
),
postings AS (
    SELECT term, doc_id, count(*)::DOUBLE AS tf FROM tokens GROUP BY term, doc_id
),
doc_lens AS (
    SELECT doc_id, count(*)::DOUBLE AS dl FROM tokens GROUP BY doc_id
),
stats AS (
    SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM doc_lens
),
tdf AS (
    SELECT term, count(*)::DOUBLE AS df FROM postings GROUP BY term
),
qterms(term) AS (VALUES {terms_values}),
scored AS (
    SELECT p.doc_id,
           sum(
             ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5))
             * p.tf * ({k1} + 1)
             / (p.tf + {k1} * (1 - {b} + {b} * d.dl / s.avgdl))
           ) AS score
    FROM postings p
    JOIN qterms q USING (term)
    JOIN tdf f USING (term)
    JOIN doc_lens d USING (doc_id)
    CROSS JOIN stats s
    {filter_clause}
    GROUP BY p.doc_id
)
{"SELECT doc_id, score FROM scored" if raw else f'''SELECT doc_id, round(score, {SCORE_DECIMALS}) AS score
FROM scored
ORDER BY round(score, {SCORE_DECIMALS}) DESC, doc_id ASC
LIMIT {k}'''}
"""
