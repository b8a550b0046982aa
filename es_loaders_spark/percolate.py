"""ES percolator analogue: stored queries as DATA, matched in one pass.

ES's percolator registers queries in an index and answers "which stored
queries match this document?" (the alerting / saved-search primitive).
The reference's users reach it through the same ES client surface the
reference wraps (utils/elasticsearch.py builds that client); re-expressed
Spark-first the problem INVERTS: the stored queries live in a TYPED
DataFrame — one row per query with (kind, field, value, values, gte,
lte, operator) columns — and percolating a document compiles the doc
into literal expressions ONCE, then evaluates every stored query with a
single whole-stage-codegen filter pass over the queries table.

Scale shape: the document payload is O(doc) literals baked into the
plan; the queries table is the scan — a million stored queries
percolate as one filtered columnar scan, partition-parallel, no shuffle,
no driver loop, no Python in the row path. (ES evaluates candidate
queries per shard after a term-based pre-selection; the analogue of that
pre-selection here is plain predicate pushdown on `kind`/`field` if the
queries table is stored partitioned by them.)

Supported stored-query kinds (the leaf surface the reference's bodies
use, flattened): term, terms, range, match (operator and/or),
match_phrase, prefix, exists.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

from .analyze import SPLIT_RE_DUCKDB, tokenize_text

QUERIES_SCHEMA = StructType([
    StructField("query_id", LongType()),
    StructField("kind", StringType()),
    StructField("field", StringType()),
    StructField("value", StringType()),
    StructField("values", ArrayType(StringType())),
    StructField("gte", DoubleType()),
    StructField("lte", DoubleType()),
    StructField("operator", StringType()),
])


def queries_from_bodies(
    spark: SparkSession, bodies: list[tuple[int, dict[str, Any]]]
) -> DataFrame:
    """Flatten (query_id, ES leaf body) pairs into the typed queries table.

    Registration is driver-side and O(stored queries) — the same cost ES
    pays indexing a percolator query — and happens once; percolation
    itself never touches Python again.
    """
    rows = []
    for qid, body in bodies:
        (kind, sub), = body.items()
        row: dict[str, Any] = {
            "query_id": int(qid), "kind": kind, "field": None, "value": None,
            "values": None, "gte": None, "lte": None, "operator": None,
        }
        if kind in ("term", "prefix"):
            (fld, v), = sub.items()
            if isinstance(v, dict):
                v = v["value"]
            row["field"], row["value"] = fld, str(v)
        elif kind == "terms":
            (fld, vs), = sub.items()
            row["field"], row["values"] = fld, [str(v) for v in vs]
        elif kind == "range":
            (fld, conds), = sub.items()
            row["field"] = fld
            if "gte" in conds:
                row["gte"] = float(conds["gte"])
            if "gt" in conds:
                raise ValueError("percolator range supports gte/lte bounds")
            if "lte" in conds:
                row["lte"] = float(conds["lte"])
            if "lt" in conds:
                raise ValueError("percolator range supports gte/lte bounds")
        elif kind in ("match", "match_phrase"):
            (fld, v), = sub.items()
            if isinstance(v, dict):
                row["operator"] = v.get("operator")
                v = v["query"]
            row["field"], row["value"] = fld, str(v)
        elif kind == "exists":
            row["field"] = sub["field"]
        else:
            raise ValueError(f"unsupported percolator query kind {kind!r}")
        rows.append(row)
    return spark.createDataFrame(rows, QUERIES_SCHEMA)


def _doc_literal_maps(doc: dict[str, Any]):
    """Compile the candidate document into map literals (once, O(doc))."""
    skeys, svals = [], []      # field → canonical string value
    nkeys, nvals = [], []      # field → numeric value
    tkeys, tvals = [], []      # field → analyzed token array
    pkeys, pvals = [], []      # field → " tok tok " phrase haystack
    for fld, v in doc.items():
        if isinstance(v, bool):
            skeys.append(F.lit(fld)); svals.append(F.lit("true" if v else "false"))
        elif isinstance(v, (int, float)):
            skeys.append(F.lit(fld)); svals.append(F.lit(f"{v:g}" if isinstance(v, float) else str(v)))
            nkeys.append(F.lit(fld)); nvals.append(F.lit(float(v)))
        else:
            s = str(v)
            toks = tokenize_text(s)
            skeys.append(F.lit(fld)); svals.append(F.lit(s))
            tkeys.append(F.lit(fld))
            tvals.append(F.array(*[F.lit(t) for t in toks]).cast("array<string>"))
            pkeys.append(F.lit(fld)); pvals.append(F.lit(" " + " ".join(toks) + " "))

    def mk(ks, vs, vtype):
        if not ks:
            return F.lit(None).cast(f"map<string,{vtype}>")
        return F.map_from_arrays(F.array(*ks), F.array(*vs))

    return (
        mk(skeys, svals, "string"),
        mk(nkeys, nvals, "double"),
        mk(tkeys, tvals, "array<string>"),
        mk(pkeys, pvals, "string"),
    )


def percolate(
    queries: DataFrame, doc: dict[str, Any], id_col: str = "query_id"
) -> DataFrame:
    """Which stored queries match ``doc``? One codegen filter pass.

    Text fields of the doc are analyzed with the engine's token grammar
    (analyze.py) on the driver — O(one document); stored match /
    match_phrase query text is analyzed PER ROW, JVM-side, with the same
    grammar (`terms_array`), so query registration needs no
    pre-tokenization.
    """
    smap, nmap, tmap, pmap = _doc_literal_maps(doc)
    sval = F.element_at(smap, F.col("field"))
    nval = F.element_at(nmap, F.col("field"))
    tval = F.element_at(tmap, F.col("field"))
    pval = F.element_at(pmap, F.col("field"))

    from .analyze import terms_array

    qtoks = terms_array(F.col("value"))
    match_or = F.arrays_overlap(qtoks, tval)
    match_and = F.forall(qtoks, lambda t: F.array_contains(tval, t))
    match_pred = F.when(F.col("operator") == "and", match_and).otherwise(match_or)
    phrase_pred = pval.contains(
        F.concat(F.lit(" "), F.concat_ws(" ", qtoks), F.lit(" "))
    )
    range_pred = (
        (F.col("gte").isNull() | (nval >= F.col("gte")))
        & (F.col("lte").isNull() | (nval <= F.col("lte")))
        & nval.isNotNull()
    )
    k = F.col("kind")
    # same numeric-equality fallback as percolate_batch's _match_cond:
    # a stored {"term": {"size": 17.0}} must match doc size=17 on both
    # percolation paths (ADVICE r05 — the two paths disagreed)
    term_pred = (sval == F.col("value")) | (
        nval.isNotNull() & (nval == F.col("value").try_cast("double"))
    )
    cond = (
        ((k == "term") & term_pred)
        | ((k == "terms") & F.array_contains(F.col("values"), sval))
        | ((k == "range") & range_pred)
        | ((k == "match") & match_pred)
        | ((k == "match_phrase") & phrase_pred)
        | ((k == "prefix") & sval.startswith(F.col("value")))
        | ((k == "exists") & (sval.isNotNull() | tval.isNotNull()))
    )
    return (
        queries.filter(F.coalesce(cond, F.lit(False)))
        .select(id_col)
        .orderBy(id_col)
    )


def percolate_oracle_sql(
    doc: dict[str, Any], queries_rel: str, id_col: str = "query_id"
) -> str:
    """DuckDB-SQL twin of ``percolate`` over a queries relation.

    Emits the same predicate logic with the doc inlined as CASE tables,
    using the oracle flavor of the analyzer regex — so a driver/oracle
    can verify percolation end-to-end on any queries relation.
    """
    def esc(s: str) -> str:
        return s.replace("'", "''")

    scase_parts, ncase_parts, tcase_parts, pcase_parts = [], [], [], []
    for fld, v in doc.items():
        f = esc(str(fld))
        if isinstance(v, bool):
            scase_parts.append(f"WHEN '{f}' THEN '{'true' if v else 'false'}'")
        elif isinstance(v, (int, float)):
            sv = f"{v:g}" if isinstance(v, float) else str(v)
            scase_parts.append(f"WHEN '{f}' THEN '{esc(sv)}'")
            ncase_parts.append(f"WHEN '{f}' THEN {float(v)!r}")
        else:
            s = str(v)
            toks = tokenize_text(s)
            lst = "[" + ", ".join(f"'{esc(t)}'" for t in toks) + "]"
            scase_parts.append(f"WHEN '{f}' THEN '{esc(s)}'")
            tcase_parts.append(f"WHEN '{f}' THEN {lst}")
            pcase_parts.append(f"WHEN '{f}' THEN ' {esc(' '.join(toks))} '")

    def case(parts, default_type):
        if not parts:
            return f"CAST(NULL AS {default_type})"
        return "CASE field " + " ".join(parts) + " ELSE NULL END"

    sval = case(scase_parts, "VARCHAR")
    nval = case(ncase_parts, "DOUBLE")
    tval = case(tcase_parts, "VARCHAR[]")
    pval = case(pcase_parts, "VARCHAR")
    qtoks = (
        "list_filter(string_split_regex(lower(value), "
        f"'{SPLIT_RE_DUCKDB}'), x -> x <> '')"
    )
    return f"""
SELECT {id_col} FROM {queries_rel}
WHERE coalesce(
      (kind = 'term'   AND ((({sval}) = value)
                        OR (({nval}) IS NOT NULL
                            AND ({nval}) = try_cast(value AS DOUBLE))))
   OR (kind = 'terms'  AND list_contains("values", {sval}))
   OR (kind = 'range'  AND (gte IS NULL OR ({nval}) >= gte)
                       AND (lte IS NULL OR ({nval}) <= lte)
                       AND ({nval}) IS NOT NULL)
   OR (kind = 'match'  AND CASE WHEN operator = 'and'
                           THEN list_has_all({tval}, {qtoks})
                           ELSE list_has_any({tval}, {qtoks}) END)
   OR (kind = 'match_phrase'
                       AND contains({pval},
                            ' ' || array_to_string({qtoks}, ' ') || ' '))
   OR (kind = 'prefix' AND starts_with({sval}, value))
   OR (kind = 'exists' AND (({sval}) IS NOT NULL OR ({tval}) IS NOT NULL))
   , false)
ORDER BY {id_col}
"""


def _doc_side_maps(doc_cols: list[str], text_cols: list[str]):
    """Doc-side value maps built from COLUMNS (not literals) — the
    evaluator for percolating a whole relation/stream of documents."""
    from .analyze import terms_array

    skeys, svals, nkeys, nvals, tkeys, tvals, pkeys, pvals = (
        [], [], [], [], [], [], [], [])
    for c in doc_cols:
        if c in text_cols:
            skeys.append(F.lit(c)); svals.append(F.col(c).cast("string"))
            toks = terms_array(F.col(c))
            tkeys.append(F.lit(c)); tvals.append(toks)
            pkeys.append(F.lit(c))
            pvals.append(F.concat(F.lit(" "), F.concat_ws(" ", toks), F.lit(" ")))
        else:
            skeys.append(F.lit(c)); svals.append(F.col(c).cast("string"))
            nkeys.append(F.lit(c))
            nvals.append(F.col(c).cast("string").try_cast("double"))

    def mk(ks, vs, vtype):
        if not ks:
            return F.lit(None).cast(f"map<string,{vtype}>")
        return F.map_from_arrays(F.array(*ks), F.array(*vs))

    return (
        mk(skeys, svals, "string"),
        mk(nkeys, nvals, "double"),
        mk(tkeys, tvals, "array<string>"),
        mk(pkeys, pvals, "string"),
    )


def _match_cond(smap, nmap, tmap, pmap) -> Column:
    """The stored-query predicate over doc-side maps (shared by the
    one-doc literal path and the batch/stream relation path)."""
    from .analyze import terms_array

    sval = F.element_at(smap, F.col("field"))
    nval = F.element_at(nmap, F.col("field"))
    tval = F.element_at(tmap, F.col("field"))
    pval = F.element_at(pmap, F.col("field"))
    qtoks = terms_array(F.col("value"))
    match_or = F.arrays_overlap(qtoks, tval)
    match_and = F.forall(qtoks, lambda t: F.array_contains(tval, t))
    match_pred = F.when(F.col("operator") == "and", match_and).otherwise(match_or)
    phrase_pred = pval.contains(
        F.concat(F.lit(" "), F.concat_ws(" ", qtoks), F.lit(" "))
    )
    range_pred = (
        (F.col("gte").isNull() | (nval >= F.col("gte")))
        & (F.col("lte").isNull() | (nval <= F.col("lte")))
        & nval.isNotNull()
    )
    k = F.col("kind")
    # term over a numeric doc column: compare NUMERICALLY when both
    # sides parse (no string-canonicalization games — "17" matches 17.0)
    term_pred = (sval == F.col("value")) | (
        nval.isNotNull() & (nval == F.col("value").try_cast("double"))
    )
    return (
        ((k == "term") & term_pred)
        | ((k == "terms") & F.array_contains(F.col("values"), sval))
        | ((k == "range") & range_pred)
        | ((k == "match") & match_pred)
        | ((k == "match_phrase") & phrase_pred)
        | ((k == "prefix") & sval.startswith(F.col("value")))
        | ((k == "exists") & (sval.isNotNull() | tval.isNotNull()))
    )


def percolate_batch(
    docs: DataFrame,
    queries: DataFrame,
    doc_id_col: str = "doc_id",
    text_cols: tuple[str, ...] | None = None,
    id_col: str = "query_id",
) -> DataFrame:
    """Percolate a RELATION of documents (alerting shape): which stored
    queries match each doc?

    One broadcast cross-join (queries are alerting rules — small next to
    a document stream) with the SAME codegen predicate as the one-doc
    path, doc values read from columns instead of literals. Works
    unchanged on a STREAMING docs frame: this is a stream-static join,
    so `stream.transform(lambda b: percolate_batch(b, rules))` →
    writeStream gives continuous percolation with no custom state.

    Returns (doc_id_col, query_id), one row per match.
    """
    cols = [c for c in docs.columns if c != doc_id_col]
    if text_cols is None:
        # same convention as the one-doc path: every string field is
        # analyzed text (match/phrase-able), everything else scalar
        from pyspark.sql.types import StringType

        text_cols = tuple(
            f.name for f in docs.schema.fields
            if isinstance(f.dataType, StringType) and f.name != doc_id_col
        )
    smap, nmap, tmap, pmap = _doc_side_maps(cols, list(text_cols))
    side = docs.select(
        F.col(doc_id_col),
        smap.alias("__s"), nmap.alias("__n"),
        tmap.alias("__t"), pmap.alias("__p"),
    )
    cond = _match_cond(
        F.col("__s"), F.col("__n"), F.col("__t"), F.col("__p")
    )
    return (
        side.crossJoin(F.broadcast(queries))
        .filter(F.coalesce(cond, F.lit(False)))
        .select(doc_id_col, id_col)
    )
