"""Report-stage derivations + top-k — parity with the reference's
``generate_report.py`` (R2-R9), re-expressed on orders.

Semantics replicated exactly (SURVEY.md §2):
* R2 link concat (``generate_report.py:23``)
* R3 epoch↔timestamp casts (``:24``)
* R4 conditional null-out of end when missing/equal-to-start (``:25-30``)
* R5 coalesce with computed fallback — the reference evaluates
  ``now()`` per row (``:13-17``); the engine takes an explicit ``AS_OF``
  parameter for determinism (documented deviation).
* R6 half-to-EVEN rounding of hours (pandas ``.round(0)`` is banker's;
  ``:32``) → Spark ``bround``, emulated in the SQL oracle.
* R7 filter (``:34``), R8 top-10 with deterministic tie-break (``:35``),
  R9 final projection (``:37-48``).

Scale: all native expressions; top-10 via orderBy().limit() →
TakeOrderedAndProject, no full sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

# Fixed as-of instant (half-past midnight so as-of-derived durations hit
# exact .5-hour boundaries — exercises banker's rounding).
AS_OF = "2026-01-01 00:30:00"


def bround_sql(x: str) -> str:
    """DuckDB emulation of half-to-even rounding to integer for
    non-negative x (pandas .round(0) / Spark bround parity)."""
    return (
        f"CAST(CASE WHEN ({x}) - floor({x}) = 0.5 "
        f"THEN floor({x}) + (CAST(floor({x}) AS BIGINT) % 2) "
        f"ELSE floor(({x}) + 0.5) END AS BIGINT)"
    )


_DERIVED_SQL = f"""
    SELECT o_orderkey,
           concat('https://orders.example/?id=', o_orderkey) AS order_link,
           CAST(epoch(o_orderdate) AS BIGINT) AS start_epoch,
           CASE WHEN o_orderstatus = 'O' OR (o_orderkey % 90) = 0
                THEN NULL
                ELSE o_orderdate + (o_orderkey % 90) * INTERVAL 1 DAY
           END AS end_date,
           CASE WHEN o_orderstatus = 'F'
                THEN (o_orderkey % 90) * 86400
           END AS total_active_sec,
           o_orderstatus,
           o_orderpriority
    FROM orders
"""

_REPORT_ORACLE = f"""
WITH derived AS ({_DERIVED_SQL}),
timed AS (
    SELECT *,
           coalesce(total_active_sec,
                    CAST(epoch(TIMESTAMP '{AS_OF}') AS BIGINT) - start_epoch)
               AS seconds_passed
    FROM derived
)
SELECT o_orderkey,
       order_link,
       start_epoch,
       end_date,
       seconds_passed,
       {bround_sql("seconds_passed / 3600.0")} AS hours_passed
FROM timed
WHERE o_orderpriority <> '5-LOW'
ORDER BY hours_passed DESC, o_orderkey
LIMIT 10
"""


def _derived(orders: DataFrame) -> DataFrame:
    """R2-R5 derivation block (shared by the report query and tests)."""
    end_date = F.when(
        (F.col("o_orderstatus") == "O") | (F.col("o_orderkey") % 90 == 0),
        F.lit(None).cast("timestamp"),
    ).otherwise(
        F.timestamp_add("DAY", (F.col("o_orderkey") % 90).cast("int"), F.col("o_orderdate"))
    )
    total_active = F.when(
        F.col("o_orderstatus") == "F", (F.col("o_orderkey") % 90) * 86400
    ).cast("long")
    return orders.select(
        "o_orderkey",
        F.concat(F.lit("https://orders.example/?id="), F.col("o_orderkey")).alias("order_link"),
        F.unix_timestamp("o_orderdate").alias("start_epoch"),
        end_date.alias("end_date"),
        total_active.alias("total_active_sec"),
        "o_orderstatus",
        "o_orderpriority",
    )


def hours_passed(seconds: Column) -> Column:
    """R6: banker's rounding of seconds→hours (pandas parity)."""
    return F.bround(seconds / 3600.0, 0).cast("long")


@query("q_report_derive_topk", oracle=_REPORT_ORACLE, tags=("parity", "report", "topk"))
def q_report_derive_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2-R9 end-to-end: derive → coalesce-fallback ageing with fixed
    AS_OF → banker's-rounded hours → filter → top-10 with key tie-break."""
    orders = load_table(spark, sf_dir, "orders")
    d = _derived(orders)
    seconds = F.coalesce(
        F.col("total_active_sec"),
        F.unix_timestamp(F.lit(AS_OF).cast("timestamp")) - F.col("start_epoch"),
    )
    return (
        d.withColumn("seconds_passed", seconds)
        .withColumn("hours_passed", hours_passed(F.col("seconds_passed")))
        .filter(F.col("o_orderpriority") != "5-LOW")
        .select(
            "o_orderkey",
            "order_link",
            "start_epoch",
            "end_date",
            "seconds_passed",
            "hours_passed",
        )
        .orderBy(F.desc("hours_passed"), F.asc("o_orderkey"))
        .limit(10)
    )


_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderstatus = 'O'
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@query("q_topk_global", oracle=_TOPK_ORACLE, tags=("parity", "topk"))
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7+R8: filter-active → global top-10 by metric with deterministic
    tie-break (keep-first parity for Spark's unordered shuffles)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ----------------------------------------------- multi-factor ranking

# The reference's OWN remaining wishlist line — "Think about ranking
# approach, now we have only 1 factor" (/root/reference/README.md:58):
# its report ranks ads by active-hours alone (generate_report.py:35).
# This is the multi-signal version a real ads/doc ranker runs: an
# integer-scaled weighted composite over the same ad-lifecycle shape
# (orders, reusing the R2-R6 derivation verbatim), with every factor's
# contribution emitted as its own pinned column so the score is
# auditable, a deterministic key tie-break, and top-k via
# TakeOrderedAndProject (never a full sort).
#
# Factors (all exact integer arithmetic — nothing on the hash path is
# a float):
#   active   w=3   banker's-rounded active hours, capped at 90 days
#                  (still-running ads all age to the cap — diminishing
#                  returns, and the cap keeps one factor from drowning
#                  the rest)
#   recency  w=2   days since the campaign epoch (1992-01-01) — newer
#                  campaigns score higher, monotone in start date
#   media    w=400 media-mix richness class 0-3 (image/video flags the
#                  P5 classification way, derived from key arithmetic
#                  like every other ads-parity column)
#   text     w=10  creative text quality: token count of the joined
#                  creative document, capped at 200 tokens
RANK_W_ACTIVE = 3
RANK_W_RECENCY = 2
RANK_W_MEDIA = 400
RANK_W_TEXT = 10
RANK_CAP_HOURS = 2160  # 90 days
RANK_EPOCH = "1992-01-01"
RANK_TEXT_TOKEN_CAP = 200
RANK_TOPK = 15

_HOURS_SQL = bround_sql("seconds_passed / 3600.0")

_MULTIFACTOR_ORACLE = f"""
WITH derived AS ({_DERIVED_SQL}),
nd AS (SELECT count(*) AS n_docs FROM documents),
timed AS (
    SELECT o_orderkey, o_orderpriority,
           coalesce(total_active_sec,
                    CAST(epoch(TIMESTAMP '{AS_OF}') AS BIGINT) - start_epoch)
               AS seconds_passed,
           (start_epoch
            - CAST(epoch(TIMESTAMP '{RANK_EPOCH} 00:00:00') AS BIGINT))
               // 86400 AS age_days,
           CASE WHEN o_orderkey % 2 = 0 AND o_orderkey % 5 = 0 THEN 3
                WHEN o_orderkey % 5 = 0 THEN 2
                WHEN o_orderkey % 2 = 0 THEN 1
                ELSE 0 END AS richness,
           CASE WHEN o_orderkey % 2 = 0 AND o_orderkey % 5 = 0 THEN 'image+video'
                WHEN o_orderkey % 5 = 0 THEN 'video'
                WHEN o_orderkey % 2 = 0 THEN 'image'
                ELSE 'text-only' END AS media_mix
    FROM derived
),
creative AS (
    SELECT t.*,
           coalesce(least(len(string_split(d.text, ' ')),
                          {RANK_TEXT_TOKEN_CAP}), 0) AS tq
    FROM timed t
    CROSS JOIN nd
    LEFT JOIN documents d ON d.doc_id = t.o_orderkey % nd.n_docs
),
scored AS (
    SELECT o_orderkey, media_mix,
           CAST({RANK_W_ACTIVE} * least({_HOURS_SQL}, {RANK_CAP_HOURS})
                AS BIGINT) AS score_active,
           CAST({RANK_W_RECENCY} * age_days AS BIGINT) AS score_recency,
           CAST({RANK_W_MEDIA} * richness AS BIGINT) AS score_media,
           CAST({RANK_W_TEXT} * tq AS BIGINT) AS score_text
    FROM creative
    WHERE o_orderpriority <> '5-LOW'
)
SELECT o_orderkey, media_mix,
       score_active, score_recency, score_media, score_text,
       score_active + score_recency + score_media + score_text AS score_total
FROM scored
ORDER BY score_total DESC, o_orderkey
LIMIT {RANK_TOPK}
"""


@query("q_rank_multifactor", oracle=_MULTIFACTOR_ORACLE, tags=("parity", "report", "topk", "ranking"))
def q_rank_multifactor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted multi-factor ad ranking (reference wishlist
    README.md:58 — "now we have only 1 factor"): integer-scaled
    composite of active-hours, recency, media-mix richness, and
    creative text quality, each contribution a pinned column, top-15
    with deterministic key tie-break.

    Plan shape at scale: the derivation and three of the four factors
    are codegen'd per-row projections on the orders scan; the creative
    lookup is ONE join keyed on o_orderkey % |documents| (the corpus
    count broadcasts as a 1-row aggregate, like q_negative_sampling);
    the top-15 is TakeOrderedAndProject — no global sort, no window
    over the full table."""
    orders = load_table(spark, sf_dir, "orders")
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("creative_id"),
        F.least(
            F.size(F.split(F.col("text"), " ")), F.lit(RANK_TEXT_TOKEN_CAP)
        ).alias("tq_raw"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))

    d = _derived(orders).filter(F.col("o_orderpriority") != "5-LOW")
    seconds = F.coalesce(
        F.col("total_active_sec"),
        F.unix_timestamp(F.lit(AS_OF).cast("timestamp")) - F.col("start_epoch"),
    )
    k = F.col("o_orderkey")
    richness = (
        F.when((k % 2 == 0) & (k % 5 == 0), 3)
        .when(k % 5 == 0, 2)
        .when(k % 2 == 0, 1)
        .otherwise(0)
    )
    media_mix = (
        F.when((k % 2 == 0) & (k % 5 == 0), "image+video")
        .when(k % 5 == 0, "video")
        .when(k % 2 == 0, "image")
        .otherwise("text-only")
    )
    timed = (
        d.crossJoin(F.broadcast(n_docs))
        .select(
            "o_orderkey",
            media_mix.alias("media_mix"),
            (
                RANK_W_ACTIVE
                * F.least(
                    hours_passed(seconds), F.lit(RANK_CAP_HOURS).cast("long")
                )
            ).cast("long").alias("score_active"),
            (
                RANK_W_RECENCY
                * (
                    (
                        F.col("start_epoch")
                        - F.unix_timestamp(
                            F.lit(f"{RANK_EPOCH} 00:00:00").cast("timestamp")
                        )
                    )
                    / F.lit(86400)
                ).cast("long")
            ).cast("long").alias("score_recency"),
            (RANK_W_MEDIA * richness).cast("long").alias("score_media"),
            (k % F.col("n_docs")).alias("creative_id"),
        )
    )
    scored = timed.join(docs, "creative_id", "left").select(
        "o_orderkey",
        "media_mix",
        "score_active",
        "score_recency",
        "score_media",
        (RANK_W_TEXT * F.coalesce(F.col("tq_raw"), F.lit(0)))
        .cast("long")
        .alias("score_text"),
    )
    return (
        scored.withColumn(
            "score_total",
            F.col("score_active")
            + F.col("score_recency")
            + F.col("score_media")
            + F.col("score_text"),
        )
        .orderBy(F.desc("score_total"), F.asc("o_orderkey"))
        .limit(RANK_TOPK)
    )
