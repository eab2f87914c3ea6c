"""Set operations — the reference's buffer append (collect_raw_data.py:171)
is a union in spirit; the full family is north-star surface.

UNION ALL is shuffle-free (plan concatenation). INTERSECT / EXCEPT
compile to semi/anti joins over distinct inputs — one shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_UNION_ORACLE = """
SELECT c_custkey AS entity_key, c_acctbal AS balance, 'customer' AS kind
FROM customer WHERE c_acctbal > 8000
UNION ALL
SELECT s_suppkey AS entity_key, s_acctbal AS balance, 'supplier' AS kind
FROM supplier WHERE s_acctbal > 1000
"""


@query("q_union_all", oracle=_UNION_ORACLE, tags=("setop",))
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName of two filtered scans (schema aligned by alias)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cust = c.filter(F.col("c_acctbal") > 8000).select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_acctbal").alias("balance"),
        F.lit("customer").alias("kind"),
    )
    supp = s.filter(F.col("s_acctbal") > 1000).select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_acctbal").alias("balance"),
        F.lit("supplier").alias("kind"),
    )
    return cust.unionByName(supp)


_INTERSECT_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


@query("q_intersect", oracle=_INTERSECT_ORACLE, tags=("setop",))
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers with both open AND filled orders."""
    o = load_table(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    filled_c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.intersect(filled_c)


_EXCEPT_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
"""


@query("q_except", oracle=_EXCEPT_ORACLE, tags=("setop",))
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): open-order customers with no pending orders."""
    o = load_table(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    pending_c = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return open_c.subtract(pending_c)


_DIFF_ORACLE = """
WITH before AS (SELECT o_orderkey, o_totalprice FROM orders
                WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
     after  AS (SELECT o_orderkey, o_totalprice FROM orders
                WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00')
SELECT o_orderkey, o_totalprice FROM after
EXCEPT
SELECT o_orderkey, o_totalprice FROM before
"""


@query("q_snapshot_diff", oracle=_DIFF_ORACLE, tags=("setop",))
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diffing between two scrape runs (the reference re-scrapes
    and overwrites; EXCEPT gives the delta) — SURVEY.md §2.B set-ops row."""
    o = load_table(spark, sf_dir, "orders")
    before = o.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")).select(
        "o_orderkey", "o_totalprice"
    )
    after = o.filter(F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp")).select(
        "o_orderkey", "o_totalprice"
    )
    return after.subtract(before)
