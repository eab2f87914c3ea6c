"""Cogrouped-map pandas UDF (``groupBy().cogroup().applyInPandas``) —
the last entry in Spark's pandas-UDF taxonomy (scalar, grouped-map,
grouped-agg, mapInPandas, applyInPandasWithState are covered
elsewhere; see SURVEY.md §2.C).

Demonstrated op: per-user as-of matching — every purchase joined to
the user's latest view at-or-before it via ``pandas.merge_asof``
inside the cogroup. This is the escape hatch for per-key logic that
needs BOTH sides' rows in memory at once (order-dependent matching,
interval sweeps) when a relational formulation is awkward; Spark
shuffles both inputs on the key and hands each key's two frames to
one Arrow-batched Python call. The relational twin lives in
operators/asof.py — same semantics, pure JVM; this one completes the
taxonomy and is oracle-checked against DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_OUT_SCHEMA = (
    "event_id long, user_id long, purchase_ts timestamp, last_view_ts timestamp"
)


def _asof_merge(purchases: pd.DataFrame, views: pd.DataFrame) -> pd.DataFrame:
    """merge_asof(direction='backward'): each purchase takes the
    greatest view ts <= its own ts; no view → NaT (left semantics)."""
    left = purchases.sort_values("purchase_ts")
    right = views.sort_values("view_ts")
    merged = pd.merge_asof(
        left, right, left_on="purchase_ts", right_on="view_ts", direction="backward"
    ).rename(columns={"view_ts": "last_view_ts"})
    return merged[["event_id", "user_id", "purchase_ts", "last_view_ts"]]


_COGROUP_ASOF_ORACLE = """
WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
     p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id,
       p.ts AS purchase_ts,
       v.ts AS last_view_ts
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
"""


@query(
    "q_cogroup_asof",
    oracle=_COGROUP_ASOF_ORACLE,
    tags=("pandas-udf", "cogroup", "asof", "join"),
)
def q_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases as-of-matched to the latest prior view, per user, via
    cogrouped applyInPandas. Scale shape: one shuffle of each side on
    user_id, then embarrassingly parallel per-key merges; state per
    task is bounded by the largest single user's history, never the
    table."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    views = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
    )
    # merge_asof needs only (view_ts) from the right; v_user avoids a
    # duplicate user_id column in the merged frame
    return (
        purchases.groupBy("user_id")
        .cogroup(views.groupBy("v_user"))
        .applyInPandas(
            lambda p, v: _asof_merge(p, v.drop(columns=["v_user"])),
            schema=_OUT_SCHEMA,
        )
    )
