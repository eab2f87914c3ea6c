"""Data-governance audits: k-anonymity / l-diversity over
quasi-identifier classes — the privacy gate a training-data pipeline
runs before releasing or joining user-derived tables.

k-anonymity: every combination of quasi-identifiers (attributes an
adversary can link externally — here nation, market segment, and a
generalized account-balance band) must describe at least k distinct
individuals, or the class is re-identifiable and must be suppressed or
generalized further. l-diversity strengthens it: within a class, the
SENSITIVE attribute (here the customer's order-priority profile) must
take at least l distinct values, or membership alone leaks the
sensitive value (the homogeneity attack).

Both are pure relational shapes — a groupBy over the QI tuple with
count-distinct aggregates — so they scale exactly like any aggregation:
one shuffle on the QI key, map-side partials, no Python. The balance
band uses the integer-cent discipline (floor(bal·100+0.5) → band =
floor(cents/100000.0)) so Spark and DuckDB bucket borderline values
identically.

Reference anchor: the reference pipeline redistributes scraped
PERSON-ASSOCIATED ad data (page ids, funding entities —
transform_raw_data.py:littered with advertiser identity fields) with no
privacy audit; this is the mandated beyond-reference governance stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

K_MIN = 5  # minimum class size
L_MIN = 2  # minimum sensitive-value diversity


def anonymity_classes(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """QI classes with k (distinct individuals) and l (distinct
    sensitive values). Sensitive attribute: the customer's order
    priorities, 'NONE' for customers with no orders (the left join
    keeps them — absence is itself a sensitive fact)."""
    cents = F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)")
    cust = customer.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(cents / F.lit(100000.0)).cast("long").alias("bal_band"),
    )
    sens = orders.select("o_custkey", "o_orderpriority")
    joined = cust.join(
        sens, cust.c_custkey == sens.o_custkey, "left"
    ).withColumn("sensitive", F.coalesce("o_orderpriority", F.lit("NONE")))
    return joined.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.countDistinct("c_custkey").alias("k_size"),
        F.countDistinct("sensitive").alias("l_div"),
    )


_KANON_ORACLE = f"""
WITH cust AS (
    SELECT c_custkey, c_nationkey, c_mktsegment,
           CAST(floor(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) / 100000.0)
                AS BIGINT) AS bal_band
    FROM customer
), joined AS (
    SELECT c.c_nationkey, c.c_mktsegment, c.bal_band, c.c_custkey,
           coalesce(o.o_orderpriority, 'NONE') AS sensitive
    FROM cust c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
)
SELECT c_nationkey, c_mktsegment, bal_band,
       CAST(count(DISTINCT c_custkey) AS BIGINT) AS k_size,
       CAST(count(DISTINCT sensitive) AS BIGINT) AS l_div,
       (count(DISTINCT c_custkey) < {K_MIN} OR count(DISTINCT sensitive) < {L_MIN})
           AS at_risk
FROM joined
GROUP BY 1, 2, 3
"""


@query("q_k_anonymity", oracle=_KANON_ORACLE, tags=("governance", "agg", "join"))
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit of the customer table under the
    QI tuple (nation, market segment, balance band), sensitive
    attribute = order-priority profile: per-class k, l, and the
    at-risk verdict (k < 5 or l < 2) the release gate acts on.
    The oracle recomputes every class relationally, so a dropped
    no-order customer (broken left join), a band boundary off by a
    cent, or a count-distinct shortcut flips the hash. Plan: one join
    shuffle on custkey (orders side aggregated map-side by AQE) + one
    aggregate shuffle on the QI tuple — both scale linearly; no
    Python, no driver state."""
    classes = anonymity_classes(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
    )
    return classes.withColumn(
        "at_risk", (F.col("k_size") < K_MIN) | (F.col("l_div") < L_MIN)
    )


_FORGET_MOD = 53  # deterministic "deletion request" set: custkey % 53 == 0

_FORGET_ORACLE = f"""
WITH forgotten AS (
    SELECT c_custkey FROM customer WHERE c_custkey % {_FORGET_MOD} = 0
), purged_orders AS (
    SELECT o_orderkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM forgotten)
)
SELECT 'customer' AS tbl,
       (SELECT count(*) FROM customer) AS rows_before,
       (SELECT count(*) FROM customer
        WHERE c_custkey NOT IN (SELECT c_custkey FROM forgotten)) AS rows_after,
       (SELECT count(*) FROM forgotten) AS rows_purged,
       0 AS orphans_after
UNION ALL
SELECT 'orders',
       (SELECT count(*) FROM orders),
       (SELECT count(*) FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM purged_orders)),
       (SELECT count(*) FROM purged_orders),
       (SELECT count(*) FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM purged_orders)
          AND o_custkey IN (SELECT c_custkey FROM forgotten))
UNION ALL
SELECT 'lineitem',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM purged_orders)),
       (SELECT count(*) FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM purged_orders)),
       (SELECT count(*) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM purged_orders)
          AND l_orderkey IN (SELECT o_orderkey FROM purged_orders))
"""


@query("q_forget_cascade", oracle=_FORGET_ORACLE, tags=("governance", "join", "cdc"))
def q_forget_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade: a deterministic deletion-request
    set (custkey % 53 == 0) is propagated customer → orders → lineitem
    via anti-joins, and the audit row every deletion job must emit is
    produced per table: rows before/after, rows purged, and the
    orphans_after reconciliation (surviving children still referencing
    a purged parent — MUST be 0; a semi/anti join swapped or a cascade
    level skipped makes it nonzero and flips the hash, which is the
    point of emitting it). Plan: the forgotten-key set is a filter on
    the dim (broadcast to both fact anti-joins); purged order keys
    broadcast into the lineitem anti-join; three scans, no wide
    shuffle — the same shape at 100 TB, where the deletion set is
    always the small side."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    forgotten = cust.filter(F.col("c_custkey") % _FORGET_MOD == 0).select(
        "c_custkey"
    )
    cust_after = cust.join(
        F.broadcast(forgotten), "c_custkey", "left_anti"
    )
    purged_orders = orders.join(
        F.broadcast(forgotten),
        orders.o_custkey == forgotten.c_custkey,
        "left_semi",
    ).select("o_orderkey")
    orders_after = orders.join(
        F.broadcast(purged_orders), "o_orderkey", "left_anti"
    )
    li_after = lineitem.join(
        F.broadcast(purged_orders),
        lineitem.l_orderkey == purged_orders.o_orderkey,
        "left_anti",
    )
    li_purged = lineitem.join(
        F.broadcast(purged_orders),
        lineitem.l_orderkey == purged_orders.o_orderkey,
        "left_semi",
    )
    # orphan reconciliation on the SURVIVORS (must be empty)
    orphan_orders = orders_after.join(
        F.broadcast(forgotten),
        orders_after.o_custkey == forgotten.c_custkey,
        "left_semi",
    )
    orphan_li = li_after.join(
        F.broadcast(purged_orders),
        li_after.l_orderkey == purged_orders.o_orderkey,
        "left_semi",
    )

    def audit(tbl: str, before: DataFrame, after: DataFrame,
              purged: DataFrame, orphans: DataFrame) -> DataFrame:
        return (
            before.agg(F.count(F.lit(1)).alias("rows_before"))
            .crossJoin(after.agg(F.count(F.lit(1)).alias("rows_after")))
            .crossJoin(purged.agg(F.count(F.lit(1)).alias("rows_purged")))
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("orphans_after")))
            .select(
                F.lit(tbl).alias("tbl"),
                "rows_before", "rows_after", "rows_purged", "orphans_after",
            )
        )

    empty = cust.limit(0)  # customer has no parent: orphans vacuously 0
    return (
        audit("customer", cust, cust_after, forgotten, empty)
        .unionByName(audit("orders", orders, orders_after, purged_orders,
                           orphan_orders))
        .unionByName(audit("lineitem", lineitem, li_after, li_purged,
                           orphan_li))
    )


_FK_EDGES = [
    # (edge label, child table, child key, parent table, parent key)
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    # events are APP telemetry, not warehouse-loaded: user_id is not
    # FK-guaranteed against customer — the audit's live edge
    ("events->customer", "events", "user_id", "customer", "c_custkey"),
]

_FK_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{label}' AS edge,
       (SELECT count(*) FROM {child} WHERE {ckey} IS NOT NULL) AS n_child,
       (SELECT count(*) FROM {child}
        WHERE {ckey} IS NOT NULL
          AND {ckey} NOT IN (SELECT {pkey} FROM {parent})) AS n_dangling,
       (SELECT count(*) FROM {child}
        WHERE {ckey} IS NOT NULL
          AND {ckey} NOT IN (SELECT {pkey} FROM {parent})) = 0 AS ok"""
    for label, child, ckey, parent, pkey in _FK_EDGES
)


@query("q_referential_audit", oracle=_FK_ORACLE, tags=("governance", "quality", "join"))
def q_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse-wide foreign-key integrity audit: every FK edge in the
    schema checked for dangling child keys (child value absent from
    the parent), one row per edge with child count, dangling count,
    and the ok verdict — the load-gate report that runs after every
    ingest batch. The events→customer edge is deliberately
    NOT-guaranteed (telemetry user_ids vs warehouse customers), so the
    audit exercises both verdicts on real data. Plan: per edge, one
    distinct-key anti-join — dims broadcast, the two fact-to-fact
    edges shuffle on the key with the child side pre-distinct'd
    (dangling detection needs distinct child keys only, so the
    shuffle carries keys, not rows); 8 independent scans that
    parallelize across the cluster."""
    rows = []
    for label, child, ckey, parent, pkey in _FK_EDGES:
        c = load_table(spark, sf_dir, child).filter(F.col(ckey).isNotNull())
        p = load_table(spark, sf_dir, parent).select(pkey)
        # distinct child keys with their multiplicities: the anti-join
        # then moves |distinct keys| rows, and the dangling row count
        # is recovered exactly from the multiplicities
        keys = c.groupBy(ckey).agg(F.count(F.lit(1)).alias("mult"))
        dangling = keys.join(
            p, keys[ckey] == p[pkey], "left_anti"
        ).agg(F.coalesce(F.sum("mult"), F.lit(0)).alias("n_dangling"))
        total = c.agg(F.count(F.lit(1)).alias("n_child"))
        rows.append(
            total.crossJoin(dangling).select(
                F.lit(label).alias("edge"),
                "n_child",
                "n_dangling",
                (F.col("n_dangling") == 0).alias("ok"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
