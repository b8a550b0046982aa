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


def test_jvm_extraction_matches_bytes_path(spark):
    """The whole-stage-codegen extraction path must be byte-identical to
    the hardened bytes decoder — INCLUDING numeric character references
    and invalid-codepoint passthrough (VERDICT r02 #5: the divergence
    list is now empty)."""
    import random

    from es_loaders_spark.extract import extracted_jvm

    cases = [
        b"<body>&amp;lt; &lt; &#65; &#x41; &amp;amp; &quot;&apos; plain"
        b" &unknown; &#xZZ; &#1114112; &#55296;</body>",
        b"<body>a&amp;b&gt;c</body>",
        b"<body>&amp;#65;</body>",   # amp-decode must NOT re-feed numeric decode
        b"<body>&#38;lt;</body>",    # numeric-decode must NOT re-feed named decode
        b"<body>&#x263A;&#9731; &#128512; &#127;&#128;&#2047;&#2048;"
        b"&#65535;&#65536;</body>",  # all four UTF-8 widths
        b"<body>&;&#;&# ;& amp; &&&amp&amp;;</body>",
        b"<body>&#x10FFFF;&#xD7FF;&#xE000;&#xDFFF;&#xD800;</body>",  # surrogates stay
        b"<body>&nbsp;&NBSP;&Amp;&LT;</body>",
        b"<body>&#00000000065;&#x0000041;</body>",
    ]
    rng = random.Random(7)
    alphabet = list("abc&#;x0123456789ABCDEF ltgampquosnb")
    for _ in range(100):
        t = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        cases.append(f"<body>{t}</body>".encode())
    df = spark.createDataFrame([(c,) for c in cases], "html binary").withColumn(
        "jvm", extracted_jvm(F.col("html"))
    )
    for row, c in zip(df.collect(), cases):
        assert row["jvm"] == extract_text_bytes(c).decode("utf-8"), c


def test_with_extracted_text_split_parity(spark):
    """The ingest-scale DataFrame split (codegen branch + HOF branch) is
    byte-identical to the bytes decoder and loses no rows."""
    import random

    from es_loaders_spark.extract import with_extracted_text

    rng = random.Random(11)
    alphabet = list("abc&#;x0123456789 ltgampquos")
    cases = [
        b"<body>plain named &amp; &lt; only</body>",
        b"<body>numeric &#65;&#x42; route</body>",
        b"<body>no entities at all</body>",
    ]
    for _ in range(100):
        t = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 50)))
        cases.append(f"<body>{t}</body>".encode())
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "id long, html binary"
    )
    out = {r["id"]: r["text"] for r in with_extracted_text(df).collect()}
    assert len(out) == len(cases)
    for i, c in enumerate(cases):
        assert out[i] == extract_text_bytes(c).decode("utf-8"), c
