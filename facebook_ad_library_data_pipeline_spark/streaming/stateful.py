"""Custom stateful streaming operator via applyInPandasWithState —
the escape hatch for operators Spark's built-in streaming aggregations
can't express (north-star "custom stateful operators").

Demonstrated op: per-user running engagement state (event count, value
sum, last event type) maintained in explicit GroupState across
micro-batches, emitted in update mode. On the bounded test source one
micro-batch ⇒ output equals the batch groupBy twin (asserted in
tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import query
from .events import load_events_stream, run_stream_to_memory

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_event_type", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_cents", LongType()),
        StructField("last_ts_micros", LongType()),
        StructField("last_event_type", StringType()),
    ]
)


def _update_user_state(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold each micro-batch's rows for this user into the persistent
    state, emit the updated snapshot. Rows arrive Arrow-batched; state
    is a plain tuple in the state store.

    Money accumulates as INTEGER CENTS (floor(v*100 + 0.5) per value):
    each per-value rounding is a deterministic function of the input
    double, and integer addition is order-independent — so the fold's
    total is identical no matter how rows split across micro-batches,
    and a plain SQL oracle can reproduce it exactly (same reasoning as
    functions/money.py, restated Python-side)."""
    import numpy as np

    (user_id,) = key
    n, total_cents, last_ts, last_type = (
        state.get if state.exists else (0, 0, -1, None)
    )
    for pdf in pdfs:
        if len(pdf):
            n += len(pdf)
            total_cents += int(np.floor(pdf["value"].to_numpy() * 100 + 0.5).sum())
            # micro-batches are NOT ts-ordered (file order); keep the
            # event-time max in state so a late-arriving batch with an
            # earlier ts can never steal "last"
            i = pdf["ts"].idxmax()
            batch_ts = int(pdf["ts"].loc[i].value // 1000)  # ns -> µs
            if batch_ts > last_ts:
                last_ts, last_type = batch_ts, str(pdf["event_type"].loc[i])
    state.update((n, total_cents, last_ts, last_type))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total_cents / 100.0],
            "last_event_type": [last_type],
        }
    )


def user_state_stream(events: DataFrame) -> DataFrame:
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_STATEFUL_ORACLE = """
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
           AS total_value,
       arg_max(event_type, ts) AS last_event_type
FROM events
GROUP BY user_id
"""


@query(
    "q_stream_stateful_user",
    oracle=_STATEFUL_ORACLE,
    tags=("streaming", "stateful", "pandas-udf"),
)
def q_stream_stateful_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful op through a real streaming query (update-mode
    memory sink keeps the latest row per user on the bounded source).
    Oracle-checkable because the fold is order-independent: integer-cent
    accumulation + ts-max event type (per-user ts are unique in the
    testdata, so arg_max is well-defined)."""
    events = load_events_stream(spark, sf_dir)
    out = user_state_stream(events)
    # 8 partitions: each stateful partition spins a Python worker + a
    # state store; measured at sf0.1 (1500 user keys) 8 partitions beat
    # 32 (2.1s vs 3.0s) — per-store overhead dominates tiny state
    run_stream_to_memory(out, "stream_stateful_user_out", output_mode="update", partitions="8")
    latest = spark.table("stream_stateful_user_out")
    # update mode appends a row per (batch, user); keep the last emit
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        latest.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
