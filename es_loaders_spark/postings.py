"""Long-format posting lists + corpus statistics.

This is the uncompressed logical form of the inverted index the
reference delegates to Elasticsearch/Lucene (SURVEY §2.9 X1): the
MatrixMarket COO triples the reference streams (gene_idx, cell_idx,
log_count — mira/mira_loader.py:141-146) have exactly this shape with
(term, doc_id, tf).

All plans here are pure Catalyst: tokenize (JVM), groupBy partial+final
hash agg, no Python in the hot path. The compressed block form lives in
codec.py/build.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analyze import tokens_df

K1 = 1.2
B = 0.75


def postings_long(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chain=None,
) -> DataFrame:
    """(term, doc_id, tf) — one row per distinct (term, doc).

    ``chain`` (analyze.AnalysisChain) applies the index's configured
    stop/synonym/stem filters — scan-path twin of a chained index build.
    """
    return (
        tokens_df(docs, text_col, id_col, chain=chain)
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chain=None,
) -> DataFrame:
    """(doc_id, dl) — token count per document (Lucene's field length).

    With ``chain``, dl counts SURVIVING tokens (stopwords removed), the
    Lucene norm semantics."""
    from .analyze import terms_array

    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(terms_array(F.col(text_col), chain=chain)).alias("dl"),
    )


def term_df(postings: DataFrame) -> DataFrame:
    """(term, df) — document frequency per term."""
    return postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


@dataclass(frozen=True)
class CorpusStats:
    n_docs: int
    avgdl: float


def corpus_stats(doc_lens: DataFrame) -> CorpusStats:
    row = doc_lens.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return CorpusStats(n_docs=int(row["n"]), avgdl=float(row["avgdl"] or 0.0))
