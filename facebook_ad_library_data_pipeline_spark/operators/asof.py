"""As-of (point-in-time) join — Spark has no native ASOF JOIN; this is
the scalable union-tag formulation (SURVEY.md §2.B "range/as-of via
window"):

1. UNION the probe stream (events) and the build stream (orders),
   tagged, projected to a common (key, t, payload) shape;
2. one window over (key) ordered by (t, tag DESC, payload) —
   orders sort before events at equal t (inclusive as-of) and the
   last-non-null carry-forward picks max(t), then max(payload);
3. keep probe rows.

Cost: ONE shuffle on the key — versus a per-group pd.merge_asof
(Arrow transfer) or an inequality join (quadratic per key). This is
the 100 TB shape.

Semantics: for each event, the most recent order of that customer with
o_orderdate <= ts; date ties broken toward the highest o_orderkey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_time: str,
    build_time: str,
    build_payload: list[str],
) -> DataFrame:
    """Generic as-of: for each probe row, latest build row with
    build_time <= probe_time on the same key. One shuffle total."""
    p = probe.withColumn("__tag", F.lit(0))
    b = build.select(
        F.col(key),
        F.col(build_time).alias("__t"),
        *[F.col(c) for c in build_payload if c != key],
    ).withColumn("__tag", F.lit(1))

    probe_cols = [c for c in probe.columns]
    p = p.withColumn("__t", F.col(probe_time))
    for c in build_payload:
        p = p.withColumn(c, F.lit(None).cast(build.schema[c].dataType))
    for c in probe_cols:
        if c not in b.columns:
            b = b.withColumn(c, F.lit(None).cast(probe.schema[c].dataType))
    united = p.select(*probe_cols, "__t", "__tag", *build_payload).unionByName(
        b.select(*probe_cols, "__t", "__tag", *build_payload)
    )

    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t").asc(), F.col("__tag").desc(), *[F.col(c).asc() for c in build_payload])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the payload as ONE struct so the matched build row is
    # atomic: with per-column last(ignorenulls), a NULL payload column
    # in the newest build row would be silently backfilled from an
    # OLDER row, stitching two build rows together (ADVICE r01/r02
    # latent). The struct is non-null for every build row (a struct of
    # nulls is still a row), so last(ignorenulls) picks whole rows.
    payload_struct = F.when(
        F.col("__tag") == 1, F.struct(*[F.col(c) for c in build_payload])
    )
    carried = united.select(
        *probe_cols,
        "__tag",
        F.last(payload_struct, ignorenulls=True).over(w).alias("__asof"),
    )
    return (
        carried.filter(F.col("__tag") == 0)
        .select(
            *probe_cols,
            *[F.col("__asof").getField(c).alias(f"asof_{c}") for c in build_payload],
        )
    )


_ASOF_ORACLE = """
SELECT e.event_id,
       e.user_id,
       e.ts,
       (SELECT max(o_orderdate) FROM orders
         WHERE o_custkey = e.user_id AND o_orderdate <= e.ts) AS asof_o_orderdate,
       (SELECT max(o_orderkey) FROM orders
         WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
           AND o_orderdate = (SELECT max(o_orderdate) FROM orders
                               WHERE o_custkey = e.user_id AND o_orderdate <= e.ts))
           AS asof_o_orderkey
FROM events e
"""


@query("q_asof_join", oracle=_ASOF_ORACLE, tags=("join", "asof"))
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event: the customer's most recent order at event time.
    Oracle states the semantics independently (correlated subqueries)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("user_id"), "ts"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"
    )
    return asof_join(
        probe=events,
        build=orders,
        key="user_id",
        probe_time="ts",
        build_time="o_orderdate",
        build_payload=["o_orderdate", "o_orderkey"],
    )
