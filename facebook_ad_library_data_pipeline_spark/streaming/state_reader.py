"""State-store BATCH introspection — Spark 4's `statestore` /
`state-metadata` read formats: the ops surface for a stateful pipeline
at 100 TB (inspect what a checkpoint holds, audit per-partition state
skew, debug a wedged watermark) without touching the running stream.

Reference scope note: the reference pipeline has no streaming state at
all (SURVEY §2.B mandates the streaming matrix); this module closes
the loop on OUR state stores — the same checkpoints
q_stream_tumbling/q_stream_tumbling_rocksdb write are re-opened here
as plain DataFrames and hash-checked against the relational oracle.

Why this is oracle-checkable at all: a COMPLETE-mode tumbling
aggregation never evicts (eviction belongs to append mode), so after
processAllAvailable the state store holds exactly one row per
(window, event_type) group whose aggregation buffer equals the batch
rollup — i.e. the STATE ITSELF, not just the sink, must hash-match
the batch twin's oracle. A buffer-layout regression, a lost partition,
or a store that dropped rows on restore all flip the hash.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from .events import _TUMBLING_ORACLE, load_events_stream, tumbling_counts

# One checkpoint per (app, sf_dir): the state read must see a FINISHED
# query's checkpoint; caching keeps the stream cost shared with repeat
# readers in the same session.
_CKPT_CACHE: dict[tuple[str, str], str] = {}


def tumbling_checkpoint(spark: SparkSession, sf_dir: str) -> str:
    """Drive the tumbling-count stream to completion against an
    explicit checkpoint dir and return that dir."""
    key = (spark.sparkContext.applicationId, sf_dir)
    ckpt = _CKPT_CACHE.get(key)
    if ckpt is None:
        ckpt = tempfile.mkdtemp(prefix="state_read_ckpt_")
        events = load_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
        agg = tumbling_counts(events)
        spark.sparkContext._jvm.System.gc()  # see run_stream_to_memory
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("state_read_src")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        _CKPT_CACHE[key] = ckpt
    return ckpt


@query("q_state_store_read", oracle=_TUMBLING_ORACLE, tags=("streaming", "state-store"))
def q_state_store_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the tumbling aggregation's STATE STORE as a batch
    DataFrame (`spark.read.format("statestore")`) and project the
    aggregation buffers back into the batch twin's shape — the state
    rows themselves must hash-match _TUMBLING_ORACLE (complete mode
    evicts nothing, so state == full rollup). The money sum lives in
    the buffer as the same DECIMAL the agg declares, so the projection
    is exact, not a float round trip."""
    ckpt = tumbling_checkpoint(spark, sf_dir)
    state = spark.read.format("statestore").option("path", ckpt).load()
    # key: struct<window:struct<start,end>, event_type>; value: the RAW
    # aggregation buffer struct<count, sum decimal(28,6), isEmpty> —
    # money_sum's final round-to-cents/cast-to-double is a RESULT
    # expression, not buffer state, so it's applied here to land in
    # the batch twin's exact shape.
    return state.select(
        F.col("key").getField("window").getField("start").alias("window_start"),
        F.col("key").getField("event_type").alias("event_type"),
        F.col("value").getField("count").alias("n"),
        F.round(F.col("value").getField("sum"), 2)
        .cast("double")
        .alias("total_value"),
    )


_STATE_META_ORACLE = """
SELECT 'stateStoreSave' AS operator_name,
       0 AS min_partition_id,
       3 AS max_partition_id,
       4 AS n_shards
"""


@query("q_state_metadata", oracle=_STATE_META_ORACLE, tags=("streaming", "state-store"))
def q_state_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The checkpoint's state-METADATA catalog
    (`spark.read.format("state-metadata")`): which stateful operators
    a checkpoint contains and how their state is sharded — what an
    operator needs before rescaling/repairing a production checkpoint.
    Pinned oracle: the tumbling agg is one stateStoreSave operator
    sharded across the 4 shuffle partitions the stream ran with."""
    ckpt = tumbling_checkpoint(spark, sf_dir)
    meta = spark.read.format("state-metadata").option("path", ckpt).load()
    return (
        meta.groupBy(F.col("operatorName").alias("operator_name"))
        .agg(
            F.min("minBatchId").cast("int").alias("_min_batch"),
            F.min("numPartitions").cast("int").alias("n_shards"),
        )
        .select(
            "operator_name",
            F.lit(0).alias("min_partition_id"),
            (F.col("n_shards") - 1).alias("max_partition_id"),
            "n_shards",
        )
    )
