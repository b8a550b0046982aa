"""Search-hit highlighting (ES ``highlight`` API analogue).

ES wraps query-term occurrences in the stored field with
``pre_tags``/``post_tags`` (default ``<em>``/``</em>``) and returns
fragments per hit. The reference never highlights (its dashboards
consume keyword fields), but a migrating user's search UI does — this
is the standard ES search-response surface.

Implementation is pure Catalyst string expressions (regexp_replace /
regexp_extract) — no Python in the executed plan, and the exact same
regexes run in the DuckDB oracle, so highlighted output is
hash-comparable across engines:

- **whole-field mode** (``number_of_fragments: 0``, the default here):
  every term occurrence in the field is wrapped; NULL when nothing
  matches (ES omits the ``highlight`` key for such hits).
- **first-fragment mode** (``number_of_fragments: 1`` +
  ``fragment_size``): a ``fragment_size``-char window starting at the
  first match, highlighted within. (ES defaults to 5 ranked fragments;
  ranked multi-fragment selection is sized-down to the deterministic
  first window — documented deviation, same tags/format.)

Term patterns come from the SAME analyzer grammar as the index
(analyze.py): terms are maximal letter/digit runs, so ``\\b`` word
boundaries delimit exactly the analyzed token edges for ASCII text;
matching is case-insensitive, preserving the document's original
casing inside the tags. Phrase queries highlight the contiguous phrase
by joining terms with the analyzer's separator class.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .analyze import tokenize_text

# separator between adjacent analyzed tokens (same class the analyzer
# splits on) — Java regex flavor and RE2 both accept these escapes
_SEP_JAVA = r"[^\p{L}\p{N}]+"
_SEP_RE2 = r"[^\pL\pN]+"


def _alternation(terms: list[str]) -> str:
    if not terms:
        raise ValueError("highlight needs at least one analyzed query term")
    return "|".join(re.escape(t) for t in sorted(set(terms)))


def term_pattern(terms: list[str], flavor: str = "java") -> str:
    """Case-insensitive pattern matching any analyzed query term at
    token boundaries; group 1 is the matched text."""
    return rf"(?i)\b({_alternation(terms)})\b"


def phrase_pattern(terms: list[str], flavor: str = "java") -> str:
    """Pattern matching the CONTIGUOUS phrase (terms separated by the
    analyzer's separator class); group 1 is the whole matched span."""
    if not terms:
        raise ValueError("highlight needs a non-empty phrase")
    sep = _SEP_JAVA if flavor == "java" else _SEP_RE2
    body = sep.join(re.escape(t) for t in terms)
    return rf"(?i)\b({body})\b"


def highlight_expr(
    field: str,
    terms: list[str],
    *,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
    number_of_fragments: int = 0,
    fragment_size: int = 100,
    phrase: bool = False,
) -> Column:
    """Column producing the highlighted field (NULL when no term hits).

    ``phrase=True`` highlights the contiguous phrase instead of
    individual terms (match_phrase / match_phrase_prefix hits).
    """
    qterms = [t for t in terms if t]
    pat = phrase_pattern(qterms) if phrase else term_pattern(qterms)
    col = F.col(field)
    replacement = f"{pre_tag}$1{post_tag}"
    if number_of_fragments == 0:
        lit = F.regexp_replace(col, pat, replacement)
        return F.when(col.rlike(pat), lit)
    if number_of_fragments != 1:
        raise ValueError(
            "number_of_fragments must be 0 (whole field) or 1 (first "
            f"fragment); got {number_of_fragments}"
        )
    # offset of the first match = length of the lazy prefix group; the
    # fragment is the fragment_size-char window from there
    prefix = F.regexp_extract(col, rf"(?s)^(.*?){pat}", 1)
    frag = F.substring(col, F.length(prefix) + 1, fragment_size)
    return F.when(col.rlike(pat), F.regexp_replace(frag, pat, replacement))


def oracle_highlight_sql(
    field: str,
    terms: list[str],
    *,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
    number_of_fragments: int = 0,
    fragment_size: int = 100,
    phrase: bool = False,
) -> str:
    """DuckDB twin of highlight_expr (RE2 flavor, same tags/window).

    DuckDB single-quoted literals pass backslashes through verbatim, so
    regex escapes need no doubling — only quotes are doubled.
    """
    qterms = [t for t in terms if t]
    pat = (
        phrase_pattern(qterms, "re2") if phrase else term_pattern(qterms, "re2")
    )
    pat_sql = pat.replace("'", "''")
    rep = f"{pre_tag}\\1{post_tag}".replace("'", "''")
    if number_of_fragments == 0:
        return (
            f"CASE WHEN regexp_matches({field}, '{pat_sql}') THEN "
            f"regexp_replace({field}, '{pat_sql}', '{rep}', 'g') END"
        )
    if number_of_fragments != 1:
        raise ValueError("number_of_fragments must be 0 or 1")
    # fold the dotall + case-insensitive flags into one leading group
    # (RE2 takes inline flags anywhere, but up-front reads cleanest);
    # pat starts with "(?i)" — strip it and re-lead with "(?si)"
    prefix_pat = f"(?si)^(.*?){pat_sql[4:]}".replace("'", "''")
    prefix = f"regexp_extract({field}, '{prefix_pat}', 1)"
    frag = f"substr({field}, length({prefix}) + 1, {fragment_size})"
    return (
        f"CASE WHEN regexp_matches({field}, '{pat_sql}') THEN "
        f"regexp_replace({frag}, '{pat_sql}', '{rep}', 'g') END"
    )
