"""Join family — absent from the reference (verified: the only
join-token in /root/reference is ``os.path.join``, utils/logging.py:15);
mandated by the north star (SURVEY.md §2.B).

Scale posture per join:
* dimension joins (region/nation/supplier/part at TPC-H ratios) are
  explicitly ``F.broadcast`` — no shuffle of the fact side;
* fact-fact joins (orders⋈lineitem) co-shuffle on the key, AQE handles
  skew;
* semi/anti joins never materialize the probe payload;
* the band/range join broadcasts the tiny band side →
  BroadcastNestedLoopJoin, never a shuffled cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.money import money_sum, money_sum_sql
from ..registry import query

_REGION_REV_ORACLE = """
SELECT r_name,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
"""


@query("q_join_broadcast_dims", oracle=_REGION_REV_ORACLE, tags=("join", "agg"))
def q_join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact → broadcast dims (customer/nation/region), then
    aggregate. The fact side is never shuffled for the joins."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
    )


_LEFT_ORACLE = f"""
SELECT c_custkey,
       c_mktsegment,
       count(o_orderkey) AS n_big_open_orders,
       coalesce({money_sum_sql("o_totalprice")}, 0.0) AS open_revenue
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey
                AND o_orderstatus = 'O'
                AND o_totalprice > 300000
GROUP BY c_custkey, c_mktsegment
"""


@query("q_join_left_outer", oracle=_LEFT_ORACLE, tags=("join",))
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with a filtered right side: unmatched customers keep
    count 0 / revenue 0 (null-aware aggregation over the outer side)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big_open = orders.filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 300000)
    )
    return (
        customer.join(big_open, customer.c_custkey == big_open.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_big_open_orders"),
            F.coalesce(money_sum(F.col("o_totalprice")), F.lit(0.0)).alias("open_revenue"),
        )
    )


_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderpriority = '1-URGENT'
      AND o_orderstatus = 'O'
)
"""


@query("q_join_semi", oracle=_SEMI_ORACLE, tags=("join",))
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi = EXISTS: probe payload never materialized."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent_open = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "O")
    )
    return customer.join(
        urgent_open, customer.c_custkey == urgent_open.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


_ANTI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderpriority = '1-URGENT'
      AND o_orderstatus = 'O'
)
"""


@query("q_join_anti", oracle=_ANTI_ORACLE, tags=("join",))
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti = NOT EXISTS (complement of q_join_semi)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent_open = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "O")
    )
    return customer.join(
        urgent_open, customer.c_custkey == urgent_open.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


_MULTIWAY_ORACLE = f"""
SELECT p_brand,
       s_name,
       {money_sum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
       round(sum(l_quantity), 2) AS total_qty
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_type = 'PROMO'
GROUP BY p_brand, s_name
"""


@query("q_join_multiway", oracle=_MULTIWAY_ORACLE, tags=("join", "agg"))
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ two broadcast dims with a dim-side filter — Catalyst
    pushes p_type='PROMO' below the join (dim pre-filtered before
    broadcast). Revenue sums in exact decimal (see functions/money.py):
    2,409 (brand, supplier) groups is exactly the granularity where a
    double sum's order-dependent last ulp flips a rounded cent."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


_BAND_ORACLE = """
SELECT band_name,
       count(*) AS n_parts,
       round(avg(p_retailprice), 4) AS avg_price
FROM part
JOIN (VALUES ('900-905', 900.0, 905.0),
             ('905-910', 905.0, 910.0),
             ('910-915', 910.0, 915.0),
             ('915-920', 915.0, 920.0)) AS bands(band_name, lo, hi)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band_name
"""


@query("q_join_range_band", oracle=_BAND_ORACLE, tags=("join", "range"))
def q_join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: inequality join against a tiny broadcast band
    table → BroadcastNestedLoopJoin, never a shuffled cartesian. The
    general range-join recipe at scale: bucketize the range key,
    equi-join on bucket, post-filter."""
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("900-905", 900.0, 905.0), ("905-910", 905.0, 910.0),
         ("910-915", 910.0, 915.0), ("915-920", 915.0, 920.0)],
        "band_name string, lo double, hi double",
    )
    cond = (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi"))
    return (
        part.join(F.broadcast(bands), cond)
        .groupBy("band_name")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
    )


_NULL_SAFE_ORACLE = """
WITH lhs AS (
    SELECT o_orderkey, nullif(o_orderpriority, '1-URGENT') AS prio_n
    FROM orders
),
dim AS (
    SELECT DISTINCT nullif(o_orderpriority, '1-URGENT') AS prio_n,
           coalesce(nullif(o_orderpriority, '1-URGENT'), 'UNSPECIFIED') AS prio_label
    FROM orders
)
SELECT d.prio_label, count(*) AS n_orders
FROM lhs l JOIN dim d ON l.prio_n IS NOT DISTINCT FROM d.prio_n
GROUP BY d.prio_label
ORDER BY d.prio_label
"""


@query("q_join_null_safe", oracle=_NULL_SAFE_ORACLE, tags=("join", "nulls"))
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): a join
    key derived with nullif (the testdata itself is null-free) so the
    NULL group must MATCH its dim row rather than fall out of the join
    — the semantics a plain equi-join silently breaks (NULL = NULL is
    NULL, dropping every null-keyed fact). The join-side sibling of
    the D2 null-collapse dedup parity. EqualNullSafe keys stay
    hash-partitionable, so the plan is an ordinary broadcast/shuffled
    hash join, not a nested loop; every order lands in exactly one
    group (row-conservation asserted by the count totals)."""
    o = load_table(spark, sf_dir, "orders")
    prio_n = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    lhs = o.select("o_orderkey", prio_n.alias("prio_n"))
    dim = (
        o.select(prio_n.alias("prio_n"))
        .distinct()
        .select("prio_n", F.coalesce("prio_n", F.lit("UNSPECIFIED")).alias("prio_label"))
    )
    return (
        lhs.join(F.broadcast(dim), lhs["prio_n"].eqNullSafe(dim["prio_n"]))
        .groupBy("prio_label")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("prio_label")
    )
