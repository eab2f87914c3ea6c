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
