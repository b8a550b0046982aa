"""Extraction byte-equality over the full corpus (north_star requirement)."""

from __future__ import annotations

from pyspark.sql import functions as F

from es_loaders_spark.extract import extract_text, extract_text_bytes


def test_extract_bytes_unit():
    html = b"<html><head><title>t</title></head><body>hello world</body></html>"
    assert extract_text_bytes(html) == b"hello world"
    nested = b"<body class='x'>a <b>bold</b> c</body>"
    assert extract_text_bytes(nested) == b"a bold c"


def test_extraction_byte_equality_full_corpus(spark, web_pages):
    mismatches = (
        web_pages.withColumn("ext", extract_text(F.col("html")))
        .filter(F.col("ext") != F.col("text"))
        .count()
    )
    assert mismatches == 0


def test_extract_strips_script_style_comments_entities():
    """Hardened extraction (VERDICT r01 item 8): script/style CONTENTS,
    comments, and entities must never leak into text."""
    html = (
        b"<html><head><style>body { color: red; }</style>"
        b"<script>var x = '<body>fake</body>';</script></head>"
        b"<!-- comment with </body> inside -->"
        b"<body>real <script type='text/js'>alert('leak')</script>text"
        b"<style media='all'>.c{}</style> &amp; entities &lt;ok&gt; &#65;&#x42;"
        b" &unknown; &#xZZ; stay</body></html>"
    )
    got = extract_text_bytes(html)
    assert got == b"real text & entities <ok> AB &unknown; &#xZZ; stay"
    assert b"alert" not in got and b"color" not in got and b"fake" not in got


def test_extract_adversarial_never_leaks_tags():
    """Property: for random tag soup built from a closed alphabet, no
    output byte sequence comes from inside a tag, script, style, or
    comment."""
    import itertools
    import random

    rnd = random.Random(7)
    words = [b"alpha", b"beta", b"gamma", b"delta"]
    for _ in range(200):
        parts = [b"<body>"]
        expected = []
        for _ in range(rnd.randint(1, 8)):
            kind = rnd.randrange(5)
            w = rnd.choice(words)
            if kind == 0:
                parts.append(w)
                expected.append(w)
            elif kind == 1:
                parts.append(b"<script>SECRET" + w + b"</script>")
            elif kind == 2:
                parts.append(b"<style>HIDden" + w + b"</style>")
            elif kind == 3:
                parts.append(b"<!--NOPE" + w + b"-->")
            else:
                parts.append(b"<div class='" + w + b"'>")
        parts.append(b"</body>")
        got = extract_text_bytes(b"".join(parts))
        assert got == b"".join(expected)
        for bad in (b"SECRET", b"HIDden", b"NOPE", b"div"):
            assert bad not in got
