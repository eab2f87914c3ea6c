"""Stream-static and stream-stream joins — the two Structured
Streaming join shapes, each with an oracle-checked batch twin.

The reference has no joins at all (SURVEY.md §2.B); these complete the
streaming surface mandated by the north star. Batch-first design as in
streaming/events.py: the same transformation function is applied to a
batch DataFrame (DuckDB-oracle-checked) and to the file-source stream
(rows-only; batch equivalence asserted in tests/test_streaming.py).

Scale posture:
- Stream-static: the static dim is broadcast to every task per
  micro-batch — no state store involved; dim refreshes are picked up at
  batch boundaries. This is THE pattern for enriching a 100 TB/day
  event firehose with a dimension table.
- Stream-stream: both sides buffered in state stores keyed by the join
  key; the watermark + the time-range condition bound how long each
  side is retained (without them state grows forever). The interval
  [0, +30 min] lets Spark evict a buffered left row once the watermark
  passes ts + 30 min.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.money import money_sum, money_sum_sql
from ..registry import query
from .events import load_events_stream, run_stream_to_memory

# ------------------------------------------------------- shared transforms


def enrich_with_segment(events: DataFrame, customers: DataFrame) -> DataFrame:
    """events ⋈ customer dim on user_id = c_custkey, rolled up by market
    segment. Dim side broadcast — works identically in batch and as a
    stream-static join."""
    dim = F.broadcast(customers.select("c_custkey", "c_mktsegment"))
    return (
        events.join(dim, events["user_id"] == dim["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), money_sum(F.col("value")).alias("total_value"))
    )


def view_purchase_pairs(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Same-user view→purchase conversions within 30 minutes: an
    interval (event-time range) join. Column-renamed sides so the
    condition is unambiguous in both batch and stream."""
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select("view_id", "purchase_id", F.col("v_user").alias("user_id"))


# ------------------------------------------------------------- batch twins

_ENRICH_ORACLE = f"""
SELECT c_mktsegment, count(*) AS n, {money_sum_sql("value")} AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


@query("q_join_events_dim", oracle=_ENRICH_ORACLE, tags=("join", "streaming", "agg"))
def q_join_events_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join."""
    return enrich_with_segment(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "customer")
    )


_PAIRS_ORACLE = """
SELECT a.event_id AS view_id, b.event_id AS purchase_id, a.user_id AS user_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'view' AND b.event_type = 'purchase'
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
"""


@query("q_interval_join_pairs", oracle=_PAIRS_ORACLE, tags=("join", "streaming", "interval"))
def q_interval_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join. The equi-key
    (user_id) carries the shuffle; the time range is a post-join
    residual — never a cross join."""
    ev = load_table(spark, sf_dir, "events")
    return view_purchase_pairs(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
    )


# ---------------------------------------------------------- true streaming


@query("q_stream_static_join", oracle=_ENRICH_ORACLE, tags=("streaming", "join"))
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join + global agg driven as a real streaming query
    (complete mode — non-windowed agg over the whole stream). The batch
    twin's oracle is the stream's oracle: money_sum makes the rollup
    independent of micro-batch partial-agg order."""
    events = load_events_stream(spark, sf_dir)
    out = enrich_with_segment(events, load_table(spark, sf_dir, "customer"))
    run_stream_to_memory(out, "stream_static_join_out", output_mode="complete")
    return spark.table("stream_static_join_out")


@query("q_stream_stream_join", oracle=_PAIRS_ORACLE, tags=("streaming", "join", "interval"))
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (append mode): both sides of the SAME
    file-source stream, watermarked 1 hour, joined on user within
    [0, +30 min]. The watermark + range bound state-store retention.
    The batch twin's oracle is the stream's oracle (integer keys only —
    no float representation risk across the join)."""
    events = load_events_stream(spark, sf_dir)
    views = events.filter(F.col("event_type") == "view").withWatermark("ts", "1 hour")
    purchases = events.filter(F.col("event_type") == "purchase").withWatermark("ts", "1 hour")
    out = view_purchase_pairs(views, purchases)
    run_stream_to_memory(out, "stream_stream_join_out", output_mode="append")
    return spark.table("stream_stream_join_out")
