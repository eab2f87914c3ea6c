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

# Cogroup on a HASH BUCKET of users, not on user_id itself: the per-call
# Python/Arrow framing (~5 ms) dominates when every key is its own tiny
# group (profiled at sf0.1: 1500 user-level groups ≈ 8-14 s; 64 buckets
# ≈ sub-second), and pandas.merge_asof(by=...) does the per-user
# matching vectorized inside the bucket anyway. Same shape at 100 TB:
# bucket count scales with cores, per-task state stays bounded by a
# bucket's history, and the semantics are unchanged.
N_COGROUPS = 64


def _asof_merge(purchases: pd.DataFrame, views: pd.DataFrame) -> pd.DataFrame:
    """Per-user merge_asof(direction='backward') within one bucket:
    each purchase takes the user's greatest view ts <= its own ts; no
    view → NaT (left semantics)."""
    left = purchases.sort_values("purchase_ts")
    right = views.rename(columns={"v_user": "user_id"}).sort_values("view_ts")
    merged = pd.merge_asof(
        left,
        right,
        left_on="purchase_ts",
        right_on="view_ts",
        by="user_id",
        direction="backward",
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
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.pmod("user_id", F.lit(N_COGROUPS)).alias("bucket"),
    )
    views = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.pmod("user_id", F.lit(N_COGROUPS)).alias("v_bucket"),
    )
    return (
        purchases.groupBy("bucket")
        .cogroup(views.groupBy("v_bucket"))
        .applyInPandas(
            lambda p, v: _asof_merge(
                p.drop(columns=["bucket"]), v.drop(columns=["v_bucket"])
            ),
            schema=_OUT_SCHEMA,
        )
    )
