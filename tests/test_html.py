"""HTML boilerplate extraction: adversarial fixtures for the cascade
(nested tags, entities, script/style bodies with fake markup, comments,
whitespace soup) plus the synthesized-page round trip the registered
query grades against ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.functions.html import (
    html_extract_text,
    synth_html,
)

# (markup, expected plain text) — each case targets one cascade-order
# failure mode.
CASES = [
    # nested tags + attribute soup
    (
        '<div class="a"><b><i>deep</i> text</b></div>',
        "deep text",
    ),
    # script body containing fake tags and < > comparisons — must be
    # removed WHOLE, before the generic tag strip
    (
        '<script type="text/javascript">if(a<b&&c>d){x="<p>no</p>";}</script>yes',
        "yes",
    ),
    # style body containing a quoted fake paragraph
    (
        '<style>.x{content:"<p>no</p>"}</style>kept',
        "kept",
    ),
    # commented-out markup — removed whole, including the fake tag
    (
        "before<!-- <p>ghost</p> -->after",
        "before after",
    ),
    # entities decode AFTER tag strip: &lt;b&gt; survives as literal <b>
    (
        "<p>&lt;b&gt; is not bold &amp;&#39;quoted&#39; &quot;q&quot;</p>",
        "<b> is not bold &'quoted' \"q\"",
    ),
    # ampersand decoded LAST: &amp;lt; is the literal string "&lt;"
    (
        "<p>&amp;lt;</p>",
        "&lt;",
    ),
    # multiline + whitespace collapse
    (
        "<div>\n  one\n\t two  </div>\n <p>three</p>",
        "one two three",
    ),
    # case-insensitive block removal
    (
        "<SCRIPT>var x=1;</SCRIPT><STYLE>.y{}</STYLE>ok",
        "ok",
    ),
    # multiline script body (dotall)
    (
        "<script>\nline1();\nline2();\n</script>text",
        "text",
    ),
    # empty body
    ("<html><body></body></html>", ""),
]


def test_extract_adversarial_fixtures(spark):
    df = spark.createDataFrame(
        [(i, html) for i, (html, _) in enumerate(CASES)], "i long, html string"
    )
    got = {
        r.i: r.out
        for r in df.select(
            "i", html_extract_text(F.col("html")).alias("out")
        ).collect()
    }
    for i, (html, expected) in enumerate(CASES):
        assert got[i] == expected, f"case {i}: {html!r} -> {got[i]!r}"


def test_synth_roundtrip_recovers_text(spark):
    """The registered query's synthesized page recovers exactly the
    known plain text — INCLUDING texts that themselves contain raw
    markup characters (the synth step entity-escapes them, the cascade
    decodes them back), so the oracle's raw-text expectation holds for
    any fixture content, not just word soup."""
    texts = [
        "hello world",
        "",
        "a  b",
        "one",
        "x < y and z > w",
        "tom & jerry",
        "literal &amp; stays",
        "<script>evil()</script> inside text",
        "a<b>c</b>d",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.body
        for r in df.select(
            "doc_id",
            html_extract_text(
                synth_html(F.col("doc_id"), F.col("text"))
            ).alias("body"),
        ).collect()
    }
    for i, t in enumerate(texts):
        expected = f"d{i} Doc & Title {i} <lead> " + " ".join(t.split())
        assert out[i] == expected.strip(), (i, out[i], expected)
