"""HTML → text extraction: heuristic behavior + expr/Arrow twin
equivalence (the hash gate proves expr == DuckDB; this proves
arrow == expr on adversarial snippets)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from revtron_utils_spark.functions import html as H

CASES = [
    # head/script/style content vanish; body paragraph survives
    (
        "<html><head><title>T</title><script>var a='<p>x</p>';</script>"
        "<style>p{}</style></head><body><p>alpha beta gamma</p></body></html>",
        "alpha beta gamma",
    ),
    # nav / footer / aside / form are boilerplate elements
    (
        "<body><nav>home about contact pricing</nav><p>real content lives here</p>"
        "<footer>copyright two thousand</footer></body>",
        "real content lives here",
    ),
    # comments removed even when they contain tags
    ("<p>keep these words</p><!-- <p>ghost block here</p> -->", "keep these words"),
    # short blocks (< 3 words) dropped
    ("<p>too short</p><p>this one is long enough</p>", "this one is long enough"),
    # link-dense blocks dropped (2*anchors > words)
    (
        '<p><a href="/x">one</a> <a href="/y">two</a> three</p>'
        "<p>plain prose with a single <a href='/z'>link</a> inside it</p>",
        "plain prose with a single link inside it",
    ),
    # entities decoded, && decoded last (no double decode)
    ("<p>fish &amp; chips &amp;lt; pie</p>", "fish & chips &lt; pie"),
    # br and headings are block boundaries; whitespace collapsed
    (
        "<div>first   block \n words<br/>tiny bit</div><h2>second block here</h2>",
        "first block words second block here",
    ),
    # inline tags stripped without splitting the block
    ("<p>one <b>two</b> three <span class='x'>four</span></p>", "one two three four"),
    # empty / tag-only documents
    ("<p></p><div><br/></div>", ""),
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], "id long, html string"
    )


def test_main_text_expr_heuristics(frame):
    got = {
        r["id"]: r["t"]
        for r in frame.select("id", H.main_text("html").alias("t")).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_main_text_arrow_matches_expr(frame):
    rows = frame.select(
        H.main_text("html", impl="expr").alias("e"),
        H.main_text("html", impl="arrow").alias("a"),
    ).collect()
    for r in rows:
        assert r["e"] == r["a"]


def test_main_text_arrow_matches_expr_on_corpus(spark, sf_dir):
    from revtron_utils_spark.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    wrapped = docs.select(
        F.concat(
            F.lit("<body><nav>a b c</nav><h1>"),
            F.col("source"),
            F.lit(" heading words</h1><p>"),
            F.col("text"),
            F.lit("</p></body>"),
        ).alias("html")
    )
    diff = wrapped.select(
        (H.main_text("html") == H.main_text("html", impl="arrow")).alias("same")
    )
    assert diff.filter(~F.col("same")).count() == 0


def test_html_extract_null_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "id long, html string")
    out = H.html_extract(df, "html").collect()[0]
    assert out["main_text"] is None
    out_a = H.html_extract(df, "html", impl="arrow").collect()[0]
    assert out_a["main_text"] is None


def test_html_extract_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "<p>a b c</p>")], "id long, html string")
    plan = H.html_extract(df, "html")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_fix_mojibake_roundtrip(spark):
    """encode(utf-8)→decode(cp1252)→fix == identity for the covered
    character set, Spark and python chains agreeing."""
    from pyspark.sql import functions as F

    from revtron_utils_spark.functions.text import (
        MOJIBAKE_CHARS,
        fix_mojibake,
        fix_mojibake_py,
    )

    samples = [
        "plain ascii stays untouched",
        " café’s — naïve ‘quote’ … ½ price übrig",
        "señor Ökonomie œuvre «guillemets» 3°±1 ™",
        MOJIBAKE_CHARS,  # every covered char at once
    ]
    rows = [(i, s.encode("utf-8").decode("cp1252")) for i, s in enumerate(samples)]
    df = spark.createDataFrame(rows, "i: int, bad: string")
    got = {r.i: r.fixed for r in df.select("i", fix_mojibake("bad").alias("fixed")).collect()}
    for i, s in enumerate(samples):
        assert got[i] == s, (i, got[i], s)
        assert fix_mojibake_py(rows[i][1]) == s


def test_fix_mojibake_leaves_legit_text(spark):
    """Already-correct text containing accented chars is not damaged
    (no covered char's correct form is itself a mojibake sequence)."""
    from revtron_utils_spark.functions.text import fix_mojibake_py

    legit = "café naïve ‘quote’ — …"
    assert fix_mojibake_py(legit) == legit
