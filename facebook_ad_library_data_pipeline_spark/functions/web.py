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
