"""HTML boilerplate extraction — the CCNet/RefinedWeb ingest front
step (strip tags/chrome, keep body text) feeding q_text_normalize and
the quality/dedup families downstream.

Beyond-reference surface: the reference ingests embedded JSON out of
scraped HTML pages (`collect_raw_data.py` pulls script payloads with
Playwright) but never extracts *text* from markup; this is the stage
every web-corpus LLM pipeline runs first (CCNet, RefinedWeb, Dolma),
re-expressed as a native ``regexp_replace`` cascade — JVM-side,
codegen'd, zero Python in the hot path.

Extraction contract (documented limits of a regex-cascade extractor —
the production trade-off CCNet itself makes before handing off to a
real parser for the long tail):

* comments, then ``<script>``, then ``<style>`` blocks are removed
  WHOLE (dotall, case-insensitive) — their bodies may contain fake
  tags, ``<``/``>`` comparisons, or quoted markup, which is exactly
  why they must go before the generic tag strip;
* the generic tag strip assumes attribute values contain no raw
  ``>`` (true of well-formed, entity-encoded markup);
* the five standard entities are decoded AFTER tag stripping (so
  ``&lt;tag&gt;`` in text cannot be eaten as markup), with ``&amp;``
  decoded LAST (so ``&amp;lt;`` yields the literal ``&lt;``, never a
  double decode);
* whitespace collapses to single spaces, trimmed.

The query synthesizes deterministic adversarial markup AROUND each
document's text (nested tags, entities, a style body with a fake
``<p>``, a script body with ``<``/``&&`` soup, a commented-out
paragraph; the text itself is entity-ESCAPED like any well-formed
page, so the round trip is total — a document containing raw ``<``,
``>``, ``&``, or even markup survives extraction byte-for-byte, with
no assumption about what the fixture text contains) and must recover
the known plain text; the oracle computes that expected text DIRECTLY
from the source table — ground truth, not a replay of the cascade —
so an extraction or escape bug anywhere (order of the cascade, entity
decode, whitespace) flips the hash.

Scale: pure per-row projection, no shuffle, no UDF; parallelism is
the scan's. fan_out first — like the shingle pipeline, regex over
every document is CPU-bound and a single-file scan would pin it to
one core.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fan_out, load_table
from ..registry import query

# Literal markup segments (plain strings, NOT f-strings — the style
# body contains braces).
_PRE_TITLE = '<html lang="en"><head><title>d'
_POST_TITLE = (
    "</title>"
    '<style type="text/css">.x{content:"<p>nope</p>"}</style>'
    '<script>if(a<b&&c>d){emit("<div>nope</div>");}</script>'
    '</head><body data-x="1"><div id="doc"><h1>Doc &amp; Title '
)
_PRE_LEAD = '</h1><p class="lead">&lt;lead&gt;</p><p>'
_POST_TEXT = "</p></div><!-- <p>ghost</p> --></body></html>"


def html_escape_text(text: Column) -> Column:
    """Entity-encode text content the way a well-formed page does
    (``&`` FIRST, then ``<``/``>``). This is what makes the synthesized
    round trip total: the cascade's entity DECODE inverts it exactly,
    so a document whose text contains raw ``<``, ``>``, or ``&`` (or
    even a literal ``&amp;``) survives extraction byte-for-byte — no
    silent fixture precondition."""
    t = F.regexp_replace(text, r"&", "&amp;")
    t = F.regexp_replace(t, r"<", "&lt;")
    return F.regexp_replace(t, r">", "&gt;")


def synth_html(doc_id: Column, text: Column) -> Column:
    """Deterministic adversarial page around a document's text (the
    text is entity-escaped, as in real markup)."""
    return F.concat(
        F.lit(_PRE_TITLE),
        doc_id,
        F.lit(_POST_TITLE),
        doc_id,
        F.lit(_PRE_LEAD),
        html_escape_text(text),
        F.lit(_POST_TEXT),
    )


def html_extract_text(html: Column) -> Column:
    """Tag-soup → plain text, per the module-docstring contract.
    Cascade ORDER is load-bearing: comments/script/style before the
    tag strip, entities after it, ampersand last."""
    t = F.regexp_replace(html, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"<[^>]*>", " ")
    t = F.regexp_replace(t, r"&lt;", "<")
    t = F.regexp_replace(t, r"&gt;", ">")
    t = F.regexp_replace(t, r"&quot;", '"')
    t = F.regexp_replace(t, r"&#39;", "'")
    t = F.regexp_replace(t, r"&amp;", "&")
    return F.trim(F.regexp_replace(t, r"\s+", " "))


# Ground truth, computed from the SOURCE text — never the cascade.
_HTML_ORACLE = r"""
SELECT doc_id,
       trim('d' || CAST(doc_id AS VARCHAR) || ' Doc & Title '
            || CAST(doc_id AS VARCHAR) || ' <lead> '
            || trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g')))
           AS body_text,
       CAST(length(trim('d' || CAST(doc_id AS VARCHAR) || ' Doc & Title '
            || CAST(doc_id AS VARCHAR) || ' <lead> '
            || trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g'))))
           AS BIGINT) AS n_out
FROM documents
"""


@query("q_html_extract", oracle=_HTML_ORACLE, tags=("llm", "text", "ingest"))
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize an adversarial HTML page around every document's
    text, then recover the plain text through the extraction cascade.
    The oracle states the EXPECTED text closed-form from the source
    table, so the cascade is graded against ground truth — mis-ordered
    steps (tag strip before script removal, entity decode before tag
    strip, ampersand decoded early) each produce a detectably
    different string."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    html = synth_html(F.col("doc_id"), F.coalesce(F.col("text"), F.lit("")))
    body = html_extract_text(html)
    return docs.select(
        "doc_id",
        body.alias("body_text"),
        F.length(body).cast("long").alias("n_out"),
    )
