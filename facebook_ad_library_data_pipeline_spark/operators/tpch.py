"""TPC-H-shaped analytical queries over the testdata tables (Q1 lives in
operators/aggregates.py, Q3 in operators/subqueries.py).

The reference has no joins or aggregations at all (SURVEY.md §2.B —
verified grep: the only join-like token in the whole repo is
``os.path.join`` at utils/logging.py:15), so this pack is part of the
relational-completeness mandate, not parity. Queries are adapted where
the driver testdata lacks a TPC-H column (no l_commitdate /
l_receiptdate / l_shipmode; noted per query).

Scale notes (the reason each plan looks the way it does):
- Date/segment filters are plain parquet-pushable predicates — at
  100 TB they prune row groups before any join.
- nation/region are tiny and broadcast; the big joins
  (customer×orders, orders×lineitem) shuffle on their keys, which is
  the right plan when both sides are large.
- Final small ORDER BY outputs are either full aggregates (a few
  groups) or LIMIT-ed (TakeOrderedAndProject) — nothing sorts the fact
  table globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.money import (
    dec_sum,
    dec_sum_sql,
    det_round,
    det_round_sql,
    money_sum,
    money_sum_sql,
)
from ..registry import query

# Per-row double products are IEEE-identical across engines; summing
# them as DECIMAL(18,6) makes every money aggregate order-independent
# (functions/money.py — the q_join_multiway round-1 lesson applied
# fleet-wide before the driver's hash reaches these queries).
_REV = "l_extendedprice * (1 - l_discount)"

_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q_tpch_q4", oracle=_Q4_ORACLE, tags=("tpch", "subquery", "agg"))
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), adapted: testdata lineitem
    has no l_commitdate/l_receiptdate, so "late line" is re-expressed
    as shipped >60 days after the order date. Shape preserved: quarter
    filter on orders, correlated EXISTS → LEFT SEMI join on orderkey,
    tiny grouped count. The semi join needs only (l_orderkey,
    l_shipdate) — column pruning reaches the lineitem scan."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q5_ORACLE = f"""
SELECT n_name, {money_sum_sql(_REV)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@query("q_tpch_q5", oracle=_Q5_ORACLE, tags=("tpch", "join", "agg"))
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): 6-way join where the customer
    and supplier must share a nation. nation⋈region broadcast into
    supplier; the fact-side joins shuffle on custkey/orderkey. The
    c_nationkey = s_nationkey condition rides along the l_suppkey
    equi-join — no extra shuffle."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = load_table(spark, sf_dir, "supplier")
    asia_supp = s.join(
        F.broadcast(n.join(r, F.col("n_regionkey") == F.col("r_regionkey"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey", "n_name")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(asia_supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


_Q6_ORACLE = f"""
SELECT {money_sum_sql("l_extendedprice * l_discount")} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("q_tpch_q6", oracle=_Q6_ORACLE, tags=("tpch", "agg", "pushdown"))
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): pure scan-filter-aggregate.
    The whole WHERE clause is parquet-pushable (range predicates on
    three columns) and the scan reads only 4 columns — at 100 TB this
    is a row-group-skipping embarrassingly-parallel partial-agg with a
    1-row final combine. The canonical 'pushdown wins' query."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


_Q10_ORACLE = f"""
SELECT c_custkey, c_name, {money_sum_sql(_REV)} AS revenue,
       round(c_acctbal, 2) AS acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q_tpch_q10", oracle=_Q10_ORACLE, tags=("tpch", "join", "agg", "topk"))
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting), adapted to the testdata's
    customer columns (no address/phone/comment). Quarter + returnflag
    filters push to the scans; nation broadcasts; top-20 via
    TakeOrderedAndProject with c_custkey tie-break so revenue ties
    can't diverge from the oracle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_PROMO_REV = f"CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE 0 END"
_Q14_RATIO = f"100.0 * {dec_sum_sql(_PROMO_REV)} / {dec_sum_sql(_REV)}"
_Q14_ORACLE = f"""
SELECT {det_round_sql(_Q14_RATIO, 4)} AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


@query("q_tpch_q14", oracle=_Q14_ORACLE, tags=("tpch", "join", "agg"))
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect), adapted: testdata p_type is a flat
    category ('PROMO' exact, not 'PROMO%...' prefixed). part broadcasts
    into the month-filtered lineitem; conditional aggregation computes
    both sums in ONE pass (no second scan, no self-join)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            det_round(
                100.0
                * dec_sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))).cast(
                    "double"
                )
                / dec_sum(rev).cast("double"),
                4,
            ).alias("promo_revenue_pct")
        )
    )


_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year, {money_sum_sql("volume")} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
  WHERE r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE'
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                       AND TIMESTAMP '1997-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("q_tpch_q7", oracle=_Q7_ORACLE, tags=("tpch", "join", "agg"))
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping), adapted: the classic two-nation pair
    is empty at tiny SF (10 suppliers over 25 nations), so the filter is
    region-to-region (ASIA suppliers -> EUROPE customers). Both
    nation⋈region dims broadcast; the fact chain shuffles on
    suppkey/orderkey/custkey only."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    supp_dim = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_dim = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(supp_dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_dim, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q8_NATION_VOL = "CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END"
_Q8_RATIO = f"{dec_sum_sql(_Q8_NATION_VOL)} / {dec_sum_sql('volume')}"
_Q8_ORACLE = f"""
SELECT o_year,
       {det_round_sql(_Q8_RATIO, 6)} AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                        AND TIMESTAMP '1997-12-31 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@query("q_tpch_q8", oracle=_Q8_ORACLE, tags=("tpch", "join", "agg"))
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3's share of ECONOMY-part
    revenue sold into ASIA, by order year. Conditional-sum ratio in one
    aggregation pass; part and the two nation dims broadcast."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_dim = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_dim = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_dim, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            det_round(
                dec_sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
                ).cast("double")
                / dec_sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_Q9_ORACLE = f"""
SELECT nation, o_year, {money_sum_sql("amount")} AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount)
           - 0.6 * p_retailprice * l_quantity AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_type IN ('STANDARD', 'PROMO')
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@query("q_tpch_q9", oracle=_Q9_ORACLE, tags=("tpch", "join", "agg"))
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit), adapted: no partsupp table in the
    testdata, so supply cost is proxied as 0.6 * p_retailprice (the
    shape — revenue minus cost rolled up by supplier nation × order
    year — is preserved). part carries the retailprice into the fact
    join via broadcast."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type").isin("STANDARD", "PROMO")
    ).select("p_partkey", "p_retailprice")
    supp_dim = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(money_sum(amount).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


_Q11_ORACLE = f"""
SELECT l_partkey, {money_sum_sql(_REV)} AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING {dec_sum_sql(_REV)} >
       0.0006 * (SELECT {dec_sum_sql(_REV)} FROM lineitem)
ORDER BY part_value DESC, l_partkey
"""


@query("q_tpch_q11", oracle=_Q11_ORACLE, tags=("tpch", "agg", "subquery"))
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock), adapted: no partsupp, so 'value' is
    lineitem revenue per part, kept when above a fixed fraction of total
    revenue. The scalar total is a 1-row aggregate broadcast into the
    HAVING — two passes over the same scan, no self-join shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    # ONE decimal sum per group; part_value rounds that exact decimal
    # (ADVICE r02: rounding the double-cast sum can diverge once a
    # per-part sum stops round-tripping through double) and raw_value
    # projects it unrounded for the HAVING comparison — two views of a
    # single aggregate, not two aggregates.
    per_part = li.groupBy("l_partkey").agg(dec_sum(F.col("rev")).alias("dec_value"))
    per_part = per_part.select(
        "l_partkey",
        F.round("dec_value", 2).cast("double").alias("part_value"),
        F.col("dec_value").cast("double").alias("raw_value"),
    )
    total = li.agg(dec_sum(F.col("rev")).cast("double").alias("total_rev"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("raw_value") > 0.0006 * F.col("total_rev"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("q_tpch_q13", oracle=_Q13_ORACLE, tags=("tpch", "join", "agg"))
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution), adapted: the
    comment-pattern exclusion becomes an order-priority exclusion. Left
    outer join so zero-order customers survive with c_count = 0;
    count(o_orderkey) skips the null right side exactly like SQL. The
    second aggregate is over ≤ a few dozen distinct counts — trivially
    small shuffle."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_orderkey", "o_custkey")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {money_sum_sql(_REV)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@query("q_tpch_q15", oracle=_Q15_ORACLE, tags=("tpch", "agg", "subquery"))
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
    the max. Revenue is rounded BEFORE the max-equality so the
    comparison is on stable 2-dp values in both engines. The aggregate
    is supplier-cardinality (tiny) — its max broadcasts back in."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q17_ORACLE = f"""
SELECT {det_round_sql(dec_sum_sql("l_extendedprice") + " / 7.0", 2)} AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (
      SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


@query("q_tpch_q17", oracle=_Q17_ORACLE, tags=("tpch", "subquery", "agg"))
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue), adapted to the flat
    p_brand domain (no p_container). The correlated per-part avg is
    decorrelated into one groupBy over lineitem joined back on partkey —
    the classic rewrite Catalyst itself would produce; brand-filtered
    part broadcasts into both sides."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3").select(
        "p_partkey"
    )
    brand_li = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    part_avg = (
        brand_li.groupBy(F.col("l_partkey").alias("avg_partkey"))
        .agg((0.2 * F.avg("l_quantity")).alias("qty_cutoff"))
    )
    return (
        brand_li.join(F.broadcast(part_avg), F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cutoff"))
        .agg(
            det_round(dec_sum(F.col("l_extendedprice")).cast("double") / 7.0, 2).alias(
                "avg_yearly"
            )
        )
    )


_Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       sum(l_quantity) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


@query("q_tpch_q18", oracle=_Q18_ORACLE, tags=("tpch", "subquery", "agg", "topk"))
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large volume customers): IN-subquery on an aggregate
    HAVING → left-semi join against the grouped qty filter. The heavy
    orderkeys list is small after HAVING (top fraction of orders) and
    broadcasts; o_orderkey added to the sort for a deterministic top
    100 under totalprice ties."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("sum_qty")).filter(
        F.col("sum_qty") > 300
    ).select(F.col("l_orderkey").alias("big_orderkey"))
    o = load_table(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == F.col("big_orderkey"), "left_semi"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


_Q19_ORACLE = f"""
SELECT {money_sum_sql(_REV)} AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


@query("q_tpch_q19", oracle=_Q19_ORACLE, tags=("tpch", "join", "pushdown"))
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue — disjunctive predicates), adapted
    to flat brand/size/quantity domains. The OR-of-ANDs spans both join
    sides, but Catalyst derives the per-side prunable residuals
    (p_brand IN (...) to the part scan, l_quantity range union to the
    lineitem scan) before evaluating the full disjunction post-join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


_Q22_ORACLE = """
SELECT c_mktsegment, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("q_tpch_q22", oracle=_Q22_ORACLE, tags=("tpch", "subquery", "agg"))
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: phone-prefix
    country buckets become c_mktsegment, and 'never ordered' becomes
    'no order since 2000-01-01' (every testdata customer has old
    orders). Scalar avg broadcasts; the NOT EXISTS is a left-anti join
    against date-filtered orders — the anti side is pre-shrunk by the
    pushed date predicate before the shuffle."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("avg_bal"))
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("numcust"), F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
        .orderBy("c_mktsegment")
    )


_Q12_ORACLE = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


@query("q_tpch_q12", oracle=_Q12_ORACLE, tags=("tpch", "join", "agg"))
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / order priority), adapted: testdata
    has no l_shipmode or commit/receipt dates, so the mode bucket is
    l_linestatus and 'late' reduces to the ship-year filter. The
    priority CASE rides the join; one hash aggregate on a 2-value
    key."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


_Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@query("q_tpch_q21", oracle=_Q21_ORACLE, tags=("tpch", "subquery", "agg", "topk"))
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: no
    commit/receipt dates, so 'late' = shipped > 60 days after order
    date. The EXISTS/NOT-EXISTS pair is decorrelated by hand into one
    shared 'late lines of F orders' frame: a left-semi join against
    other-supplier lines (multi-supplier orders) and a left-anti join
    against other-supplier LATE lines (sole blame) — both shuffle on
    l_orderkey with the supplier-inequality as residual, the exact
    plan Catalyst produces for the SQL form."""
    o_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(o_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    all_other = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_other = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    blamed = (
        late.join(
            all_other,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            late_other,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# ------------------------------------------------------------------ Q2/Q16/Q20
# The last three public TPC-H shapes, blocked until r02 on the absent
# partsupp table. Adaptation: lineitem's observed (l_partkey, l_suppkey)
# pairs ARE the part-supplier catalog (reference Q2's ps_supplycost →
# min observed unit price; Q20's ps_availqty → shipped quantity).

_Q2_ORACLE = """
WITH cost AS (
    SELECT l_partkey AS partkey, l_suppkey AS suppkey,
           min(l_extendedprice / l_quantity) AS supplycost
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
),
eur AS (
    SELECT c.partkey, c.suppkey, c.supplycost,
           s.s_acctbal, s.s_name, n.n_name
    FROM cost c
    JOIN supplier s ON c.suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
)
SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type, e.supplycost
FROM part p
JOIN eur e ON p.p_partkey = e.partkey
WHERE p.p_size = 15
  AND p.p_type = 'STANDARD'
  AND e.supplycost = (SELECT min(e2.supplycost) FROM eur e2
                      WHERE e2.partkey = p.p_partkey)
ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
LIMIT 100
"""


@query("q_tpch_q2", oracle=_Q2_ORACLE, tags=("tpch", "join", "subquery", "topk"))
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum cost supplier), adapted: no partsupp, so the
    part-supplier catalog is the DISTINCT observed (l_partkey,
    l_suppkey) pairs and supply cost is the min observed unit price —
    min() is order-independent, so the double is bit-identical across
    engines with no rounding needed. Shape preserved: the correlated
    'cost = (SELECT min(...))' decorrelates into a per-part min-agg
    joined back on (partkey, cost) equality; nation/region broadcast;
    final TakeOrderedAndProject top-100."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    cost = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min("unit_price").alias("supplycost"))
    supp_dim = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eur = cost.join(F.broadcast(supp_dim), F.col("suppkey") == F.col("s_suppkey"))
    # Per-part min via window, not agg + self-join: the self-join shape
    # re-executes the whole lineitem cost aggregation for the min
    # branch (verified in the formatted plan — two full exchanges); the
    # window reads the aggregated eur once. Each part has a handful of
    # suppliers, so the partkey partitions are tiny — no skew.
    w = Window.partitionBy("partkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_type")
    return (
        eur.withColumn("min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#2'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 3)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query("q_tpch_q16", oracle=_Q16_ORACLE, tags=("tpch", "join", "subquery", "agg"))
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted: partsupp → the
    distinct observed (l_partkey, l_suppkey) pairs; the 'customer
    complaints' supplier exclusion → negative account balance. Shape
    preserved: NOT IN anti-join against a tiny broadcast list, distinct
    supplier count per (brand, type, size), count-desc ordering."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    complainers = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 3))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        ps.join(F.broadcast(complainers), ps.l_suppkey == complainers.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


_Q20_ORACLE = """
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
  AND s.s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '2001-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
      HAVING sum(l_quantity) > 30
  )
ORDER BY s.s_name
"""


@query("q_tpch_q20", oracle=_Q20_ORACLE, tags=("tpch", "subquery", "agg"))
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted: no ps_availqty,
    so the '>50% of availqty' test becomes 'shipped >30 units of a red
    part in 2000' — the IN-over-aggregated-subquery shape (grouped
    HAVING feeding a semi join) is what matters. sum(l_quantity) is
    exact (integer-valued doubles), so the HAVING threshold is
    order-independent without decimal help."""
    red_parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    qualified = (
        li.join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
        .distinct()
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    return (
        s.join(qualified, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
