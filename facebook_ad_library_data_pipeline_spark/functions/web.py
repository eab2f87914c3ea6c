"""Web/URL analytics: the per-domain quality-and-provenance stage every
web-scraped training corpus runs (CCNet / RefinedWeb-style URL
filtering — registrable-domain grouping, subdomain and path-shape
audits, query-parameter extraction).

The reference IS a web scraper (``collect_raw_data.py`` drives a
browser against library URLs built from page ids); its URL handling is
string concatenation on the way OUT. This module covers the inverse —
parsing URLs on the way IN with Spark's native ``parse_url``
(HOST/PATH/QUERY part extraction, JVM-side, codegen-friendly) — which
the scraper's downstream consumers need the moment more than one site
is crawled.

Oracle strategy: the URL column is SYNTHESIZED deterministically from
events columns (subdomain from event_type, site/TLD from user_id
arithmetic, path shape from event_id parity, query params carrying
user_id and a small checksum). The Spark side must recover every
component by PARSING the assembled string; the DuckDB oracle recomputes
the same components directly from the source arithmetic, never parsing.
Any parse_url deviation — port/fragment leaking into HOST, query-param
misextraction, path truncation — lands in an aggregate and flips the
hash.

Reference anchor: /root/reference/collect_raw_data.py:30-44 (the
scraper's URL construction); the parse direction is the mandated
beyond-reference inverse.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def _synth_url(df: DataFrame) -> DataFrame:
    """Deterministic URL per event. Shapes covered: optional subdomain
    (view→www, click→cdn, others bare), 3 TLDs, deep vs shallow paths,
    two query params, a fragment parse_url must NOT leak into QUERY."""
    sub = (
        F.when(F.col("event_type") == "view", F.lit("www."))
        .when(F.col("event_type") == "click", F.lit("cdn."))
        .otherwise(F.lit(""))
    )
    site = F.concat(F.lit("site"), (F.col("user_id") % 97).cast("string"))
    tld = F.element_at(
        F.array(F.lit("com"), F.lit("org"), F.lit("net")),
        (F.col("user_id") % 3 + 1).cast("int"),
    )
    path = (
        F.when(
            F.col("event_id") % 2 == 0,
            F.concat(
                F.lit("/"),
                F.col("event_type"),
                F.lit("/items/"),
                (F.col("event_id") % 1000).cast("string"),
            ),
        ).otherwise(F.concat(F.lit("/"), (F.col("event_id") % 1000).cast("string")))
    )
    url = F.concat(
        F.lit("https://"),
        sub,
        site,
        F.lit("."),
        tld,
        path,
        F.lit("?uid="),
        F.col("user_id").cast("string"),
        F.lit("&t="),
        (F.col("event_id") % 7).cast("string"),
        F.lit("#sec"),
        (F.col("event_id") % 5).cast("string"),
    )
    return df.withColumn("url", url)


def parse_components(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Recover host / registrable domain / path depth / query params
    from a URL string column — all native parse_url + string ops, no
    Python. Registrable domain ≈ last two labels (the public-suffix
    list is a broadcast join in production; the 2-label rule is exact
    for the synthesized .com/.org/.net corpus here)."""
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    return (
        df.withColumn("host", host)
        .withColumn("domain", F.substring_index(F.col("host"), ".", -2))
        .withColumn("path", F.parse_url(F.col(url_col), F.lit("PATH")))
        # leading '/' splits to a leading '' — depth = segments - 1
        .withColumn(
            "path_depth", F.size(F.split(F.col("path"), "/")) - F.lit(1)
        )
        .withColumn(
            "uid",
            F.parse_url(F.col(url_col), F.lit("QUERY"), F.lit("uid")).cast("long"),
        )
        .withColumn(
            "t_param",
            F.parse_url(F.col(url_col), F.lit("QUERY"), F.lit("t")).cast("long"),
        )
    )


_URL_ORACLE = """
WITH synth AS (
    SELECT 'site' || CAST(user_id % 97 AS VARCHAR) || '.' ||
           CASE user_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END
               AS domain,
           CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END AS has_sub,
           CASE WHEN event_id % 2 = 0 THEN 3 ELSE 1 END AS path_depth,
           user_id AS uid,
           event_id % 7 AS t
    FROM events
)
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT uid) AS BIGINT) AS n_users,
       CAST(sum(t) AS BIGINT) AS t_checksum,
       CAST(sum(has_sub) AS BIGINT) AS n_subdomain,
       CAST(sum(path_depth) AS BIGINT) AS depth_sum
FROM synth
GROUP BY domain
"""


@query("q_url_host_stats", oracle=_URL_ORACLE, tags=("web", "text", "agg"))
def q_url_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain crawl statistics, every component
    recovered by PARSING the URL: events → synthesize url → parse_url
    HOST/PATH/QUERY → group by the 2-label registrable domain →
    event count, distinct users (from the parsed uid param, not the
    source column), query-param checksum, subdomain share, path-depth
    mass. The oracle rebuilds each component arithmetically without
    parsing, so HOST capturing the fragment, QUERY missing a key, or
    a path-depth off-by-one flips the hash. Plan: narrow scan → one
    codegen'd projection stage (parse_url is JVM-side) → single
    groupBy shuffle on ≤ 291 domain keys — scan-bound at 100 TB."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    parsed = parse_components(_synth_url(ev))
    return parsed.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("uid").alias("n_users"),
        F.sum("t_param").alias("t_checksum"),
        F.sum(
            F.when(F.col("host") != F.col("domain"), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_subdomain"),
        F.sum("path_depth").alias("depth_sum"),
    )


# ----------------------------------------- URL canonicalization + dedup

# The CCNet/RefinedWeb crawl-dedup FRONT step: the same resource
# arrives under many surface forms (http vs https, optional www.,
# host case, trailing slash, utm_* tracking params, fragments) and
# must collapse to ONE canonical key before any content is fetched or
# hashed. Synthesis follows the module pattern: the mess bits are
# event-arithmetic-derived, so the oracle can state each row's
# canonical form CLOSED-FORM without ever parsing a string — Spark
# must earn the same answer by actually normalizing the messy URL.
_TRACKING_PREFIX = "utm_"


def canonicalize_url(url: Column) -> Column:
    """Messy URL → canonical key, all native (parse_url + array ops):
    lowercase host, strip a leading ``www.``, drop the scheme, drop
    the fragment (parse_url never returns it), drop ``utm_*`` params
    while PRESERVING real params and their order, strip one trailing
    slash from the path."""
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_replace(F.parse_url(url, F.lit("PATH")), r"/$", "")
    query = F.parse_url(url, F.lit("QUERY"))
    kept = F.array_join(
        F.filter(
            F.split(F.coalesce(query, F.lit("")), "&"),
            lambda kv: (kv != "") & ~kv.startswith(_TRACKING_PREFIX),
        ),
        "&",
    )
    return F.concat(
        host,
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )


def _synth_messy_url(df: DataFrame) -> DataFrame:
    """One messy URL per event; every mess bit keyed on arithmetic the
    oracle replays. Underlying resource: site(user_id%50).com
    /p/(event_id%200) ?id=(user_id%10)."""
    e = F.col("event_id")
    host_core = F.concat(F.lit("site"), (F.col("user_id") % 50).cast("string"))
    host = F.concat(
        F.when(e % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.when(e % 11 == 0, F.upper(host_core)).otherwise(host_core),
        F.lit(".com"),
    )
    url = F.concat(
        F.when(e % 2 == 0, F.lit("https://")).otherwise(F.lit("http://")),
        host,
        F.lit("/p/"),
        (e % 200).cast("string"),
        F.when(e % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?id="),
        (F.col("user_id") % 10).cast("string"),
        F.when(e % 4 == 0, F.lit("&utm_source=ads")).otherwise(F.lit("")),
        F.when(e % 7 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    return df.withColumn("url", url)


_CANON_ORACLE = """
WITH canon AS (
    SELECT event_id,
           'site' || CAST(user_id % 50 AS VARCHAR) || '.com/p/'
                  || CAST(event_id % 200 AS VARCHAR)
                  || '?id=' || CAST(user_id % 10 AS VARCHAR) AS canonical_url
    FROM events
)
SELECT canonical_url,
       CAST(count(*) AS BIGINT) AS n_variants,
       CAST(min(event_id) AS BIGINT) AS first_event
FROM canon
GROUP BY canonical_url
"""


@query("q_url_canonical_dedup", oracle=_CANON_ORACLE, tags=("web", "llm", "dedup", "ingest"))
def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + keep-first dedup — the crawl-frontier
    collapse every web corpus runs before fetching/hashing content:
    scheme and fragment dropped, host lowercased and de-www'd, one
    trailing slash stripped, utm_* tracking params removed with real
    params preserved in order, then group on the canonical key with
    the representative pinned as min(event_id). The oracle states each
    row's canonical form closed-form from the source arithmetic (it
    never parses), so a normalization miss — case-sensitive host
    compare, tracking param kept, slash retained, fragment leaking in
    — splits or merges a group and flips the hash. Plan: narrow scan →
    one codegen'd parse/normalize projection → ONE groupBy exchange on
    the canonical key; scan-bound at 100 TB, exactly like production
    frontier dedup."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    messy = _synth_messy_url(ev)
    return (
        messy.select(
            "event_id", canonicalize_url(F.col("url")).alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_variants"),
            F.min("event_id").cast("long").alias("first_event"),
        )
    )
