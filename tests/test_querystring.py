"""query_string: parser, occur-flag assignment, and DuckDB rank-identity."""

from __future__ import annotations

import duckdb
import pytest

from es_loaders_spark import dsl
from es_loaders_spark.querystring import (
    MUST,
    MUST_NOT,
    SHOULD,
    Group,
    Leaf,
    parse_query_string,
    query_string_oracle_sql,
)


def occurs(q, default_operator="or"):
    g = parse_query_string(q, "text", default_operator)
    return [c.occur for c in g.clauses]


class TestParser:
    def test_default_or_bare_terms_are_should(self):
        assert occurs("a b c") == [SHOULD, SHOULD, SHOULD]

    def test_default_and_bare_terms_are_must(self):
        assert occurs("a b c", "and") == [MUST, MUST, MUST]

    def test_and_upgrades_previous_clause(self):
        # Lucene addClause: 'a AND b' makes BOTH must, even under OR default
        assert occurs("a AND b") == [MUST, MUST]
        assert occurs("a b AND c") == [SHOULD, MUST, MUST]

    def test_or_downgrades_previous_under_and_default(self):
        assert occurs("a OR b", "and") == [SHOULD, SHOULD]
        assert occurs("a b OR c", "and") == [MUST, SHOULD, SHOULD]

    def test_modifiers(self):
        assert occurs("+a -b c") == [MUST, MUST_NOT, SHOULD]
        assert occurs("NOT a b") == [MUST_NOT, SHOULD]
        assert occurs("a AND NOT b") == [MUST, MUST_NOT]

    def test_and_never_upgrades_prohibited(self):
        assert occurs("-a AND b") == [MUST_NOT, MUST]

    def test_boost_and_fields(self):
        g = parse_query_string('lang:en^2 "a b"^0.5', "text", "or")
        assert g.clauses[0].boost == 2.0 and g.clauses[1].boost == 0.5
        assert isinstance(g.clauses[0].node, Leaf)
        assert g.clauses[0].node.kind == "kwterm"
        assert g.clauses[1].node.kind == "phrase"

    def test_range_parse(self):
        g = parse_query_string("n:[1 TO 5} m:{* TO 2]", "text", "or")
        assert g.clauses[0].node.value == (1, 5, True, False)
        assert g.clauses[1].node.value == (None, 2, False, True)

    def test_nested_groups(self):
        g = parse_query_string("(a OR b) AND c", "text", "or")
        assert [c.occur for c in g.clauses] == [MUST, MUST]
        assert isinstance(g.clauses[0].node, Group)

    def test_shared_leaf_ids(self):
        from es_loaders_spark.querystring import _collect_leaves

        g = parse_query_string("a AND a", "text", "or")
        leaves = []
        _collect_leaves(g, leaves)
        assert len(leaves) == 1  # one column, two clauses

    def test_loud_rejections(self):
        for bad in (
            "a~2", "mid*dle", "wh?t", "field:(a b)", "(a OR b",
            "a )", "a AND", "+", '""', "a:[1 TO]",
        ):
            with pytest.raises(ValueError):
                parse_query_string(bad, "text", "or")

    def test_multi_token_term_rejected(self):
        with pytest.raises(ValueError, match="quote it"):
            parse_query_string("foo-bar", "text", "or")


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con


QUERIES = [
    "spark AND merge",
    'spark OR "key order"^2',
    "(spark OR batch) AND NOT lang:zh",
    "index* -lang:de n_chars:[100 TO 300]",
    "+spark -merge source:src3",
    "NOT lang:en",
    "spark AND (merge OR sort) AND n_chars:{100 TO *]",
]


class TestRankIdentity:
    @pytest.mark.parametrize("q", QUERIES)
    def test_matches_duckdb(self, spark, documents, duck, q):
        body = {"query": {"query_string": {"query": q}}, "size": 15}
        got = [
            (r.doc_id, r.score)
            for r in dsl.search(spark, documents, body).collect()
        ]
        want = [
            (int(a), float(b))
            for a, b in duck.execute(query_string_oracle_sql(q, k=15)).fetchall()
        ]
        assert got == want, q

    def test_default_operator_and(self, spark, documents, duck):
        q = "spark merge OR sort"
        body = {
            "query": {"query_string": {"query": q, "default_operator": "and"}},
            "size": 15,
        }
        got = [
            (r.doc_id, r.score)
            for r in dsl.search(spark, documents, body).collect()
        ]
        want = [
            (int(a), float(b))
            for a, b in duck.execute(
                query_string_oracle_sql(q, k=15, default_operator="and")
            ).fetchall()
        ]
        assert got == want

    def test_filter_context_restricts_not_rescales(self, spark, documents):
        # scores under a bool.filter must equal the unfiltered scores for
        # the surviving docs (ES filter context: stats stay global)
        free = {"query": {"query_string": {"query": "spark merge"}}, "size": 500}
        allf = {
            r.doc_id: r.score
            for r in dsl.search(spark, documents, free).collect()
        }
        filt = {
            "query": {
                "bool": {
                    "must": [{"query_string": {"query": "spark merge"}}],
                    "filter": [{"term": {"lang": "en"}}],
                }
            },
            "size": 50,
        }
        out = dsl.search(spark, documents, filt).collect()
        assert out, "filtered query returned nothing"
        for r in out:
            assert allf[r.doc_id] == r.score

    def test_pure_negative_is_complement(self, spark, documents):
        n_en = documents.filter("lang = 'en'").count()
        n = documents.count()
        body = {"query": {"query_string": {"query": "NOT lang:en"}}, "size": 50000}
        assert dsl.search(spark, documents, body).count() == n - n_en

    def test_highlight_refused(self, spark, documents):
        body = {
            "query": {"query_string": {"query": "spark"}},
            "highlight": {"fields": {"text": {}}},
        }
        with pytest.raises(ValueError, match="highlight"):
            dsl.search(spark, documents, body)
