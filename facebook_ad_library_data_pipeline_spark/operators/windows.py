"""Window-function family — the reference has only the running max
(P4); full family mandated by the north star (SURVEY.md §2.B).

Determinism rule for oracle parity: every ORDER BY inside a window is
made TOTAL by appending the unique key (o_orderkey) — a window over a
non-total order is shuffle-order-dependent (learned the hard way on
q_running_max; see operators/transform.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_PACK_ORACLE = """
SELECT o_orderkey,
       o_custkey,
       o_totalprice,
       row_number()  OVER w_price AS rn_price,
       rank()        OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS rank_prio,
       dense_rank()  OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS dense_rank_prio,
       lag(o_totalprice)  OVER w_time AS prev_price,
       lead(o_totalprice) OVER w_time AS next_price,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_revenue,
       first_value(o_orderkey) OVER w_time AS first_order_key
FROM orders
WINDOW w_price AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
       w_time  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@query("q_window_pack", oracle=_PACK_ORACLE, tags=("window",))
def q_window_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / lag / lead / running sum /
    first_value in one pass. Two window specs share the partition key →
    one shuffle on o_custkey, two sorts."""
    o = load_table(spark, sf_dir, "orders")
    w_price = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    w_prio = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    w_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w_time.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w_price).alias("rn_price"),
        F.rank().over(w_prio).alias("rank_prio"),
        F.dense_rank().over(w_prio).alias("dense_rank_prio"),
        F.lag("o_totalprice").over(w_time).alias("prev_price"),
        F.lead("o_totalprice").over(w_time).alias("next_price"),
        F.round(F.sum("o_totalprice").over(w_run), 2).alias("running_revenue"),
        F.first("o_orderkey").over(w_time).alias("first_order_key"),
    )


_TOPK_GROUP_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
) WHERE rn <= 3
"""


@query("q_topk_per_group", oracle=_TOPK_GROUP_ORACLE, tags=("window", "topk"))
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: the scalable per-group top-k (one
    shuffle on the group key; rank filter prunes before any downstream
    op). Never collect-and-sort per group."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


_DIST_ORACLE = """
SELECT o_orderkey,
       o_totalprice,
       ntile(4)       OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cume
FROM orders
WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
"""


@query("q_window_distribution", oracle=_DIST_ORACLE, tags=("window",))
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over a global total order.

    NOTE an unpartitioned window is a single-task sort — fine for a
    report-sized frame, wrong for a 100 TB fact table (there you bucket
    first or use approx quantiles; see q_percentiles)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


_GAP_ORACLE = """
SELECT o_custkey,
       o_orderkey,
       o_orderdate,
       datediff('day',
                lag(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS days_since_prev
FROM orders
"""


@query("q_window_gap", oracle=_GAP_ORACLE, tags=("window",))
def q_window_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag-based gap analysis (days between consecutive orders per
    customer) — the building block for sessionization."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("days_since_prev"),
    )
