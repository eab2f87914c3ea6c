"""CDC / upsert patterns without a table format: MERGE emulated as
anti-join + union (the pre-Delta idiom), SCD2-style change tracking via
windows — the "snapshot diffing between scrape runs" capability
(SURVEY.md §2.B set-ops row) taken to its full shape.

The reference re-scrapes and overwrites its raw file each run
(collect_raw_data.py:195-204); these operators are what a production
version of that overwrite becomes at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

# "target" = orders before 1999; "source" (new scrape) = orders 1998+.
# The overlap year exercises the update path, pre-1998 the keep path,
# 1999+ the insert path.
_MERGE_ORACLE = """
WITH target AS (
    SELECT o_orderkey, o_totalprice, o_orderstatus, 'old' AS version
    FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
), source AS (
    SELECT o_orderkey, o_totalprice, o_orderstatus, 'new' AS version
    FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_orderkey, o_totalprice, o_orderstatus, version FROM source
UNION ALL
SELECT t.o_orderkey, t.o_totalprice, t.o_orderstatus, t.version
FROM target t
WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
"""


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT, as
    anti-join + union-all: source wins on key collision, unmatched
    target rows survive. Two shuffles worst case (anti join); with both
    sides bucketed on the key, zero."""
    survivors = target.join(source.select(key), key, "left_anti")
    return source.unionByName(survivors)


@query("q_merge_upsert", oracle=_MERGE_ORACLE, tags=("cdc", "setop"))
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert a new scrape snapshot over the previous one."""
    o = load_table(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")).select(
        "o_orderkey", "o_totalprice", "o_orderstatus", F.lit("old").alias("version")
    )
    source = o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")).select(
        "o_orderkey", "o_totalprice", "o_orderstatus", F.lit("new").alias("version")
    )
    return merge_upsert(target, source, "o_orderkey")


_SCD_ORACLE = """
SELECT o_custkey,
       o_orderkey,
       o_orderstatus,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS valid_to,
       CASE WHEN lead(o_orderdate) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey) IS NULL
            THEN 1 ELSE 0 END AS is_current
FROM orders
"""


@query("q_scd2_intervals", oracle=_SCD_ORACLE, tags=("cdc", "window"))
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals: each customer state version is valid
    until the next one begins (lead over the change sequence); the open
    interval is the current row."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


_EXCEPT_ALL_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
"""


@query("q_except_all", oracle=_EXCEPT_ALL_ORACLE, tags=("setop",))
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL (bag semantics: per-key multiplicities
    subtract) — complements the distinct q_except."""
    o = load_table(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    pending_c = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return open_c.exceptAll(pending_c)


_INTERSECT_ALL_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


@query("q_intersect_all", oracle=_INTERSECT_ALL_ORACLE, tags=("setop",))
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL (min of multiplicities per key)."""
    o = load_table(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    filled_c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.intersectAll(filled_c)
