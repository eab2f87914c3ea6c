"""Flagship query: the reference's entire analytical payload re-shaped
onto the testdata star schema.

Reference parity: ``generate_report.py:20-48`` is scan → derive →
filter(active) → top-10 by an activity metric. Here: scan lineitem +
orders → derive per-order revenue (partial-agg before the join, so the
join input is already reduced) → filter open orders → top-10 by
revenue with a deterministic key tie-break (R8 keep-first semantics,
``generate_report.py:35``).

Scale posture: the groupBy is a single hash shuffle on l_orderkey with
map-side partial aggregation; the join co-shuffles on the same key; the
top-10 is ``orderBy().limit(10)`` → TakeOrderedAndProject (per-partition
heap, never a full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_FLAGSHIP_ORACLE = """
SELECT o_orderkey,
       o_orderdate,
       o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderstatus = 'O'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@query("q_flagship", oracle=_FLAGSHIP_ORACLE, tags=("flagship", "join", "agg", "topk"))
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 open orders by lineitem revenue (scan→agg→join→filter→top-k)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    per_order = lineitem.groupBy("l_orderkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .join(per_order, orders.o_orderkey == per_order.l_orderkey)
        .select("o_orderkey", "o_orderdate", "o_orderpriority", "revenue", "n_items")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )
