"""TTL decay evidence: typed state SHRINKS under key churn.

The companion claim to tws_scale_evidence.py. That script pins "state
∝ keys, not rows" for a BOUNDED key universe; this one pins the guard
for the UNBOUNDED case: with a per-variable TTL
(`getValueState(..., ttlDurationMs=...)`), keys that go idle are
evicted, so retained state plateaus at (arrival rate × TTL) even as
the cumulative key universe grows without bound.

Method: sf0.1 events sliced into ts-ordered micro-batches with the
user_id REMAPPED per slice (each slice introduces a disjoint key set —
the transient-key firehose: session ids, request ids, one-shot
visitors). Three runs through a ValueState-per-key counter on RocksDB:

  1. 4 slices,  TTL 2 s  — small key universe (control for scale)
  2. 40 slices, TTL 2 s  — 10× the key universe, same arrival rate
  3. 40 slices, no TTL   — the failure mode: state == every key ever

Claim holds if final state in run 2 stays within a small factor of
run 1 (plateau: only keys younger than ~TTL survive) while run 3's
final state is ~10× run 1's cumulative keys. TTL is processing-time
(the public API's clock), so the plateau LEVEL varies with batch wall
time run-to-run; the evidence is the ORDER-OF-MAGNITUDE split between
run 2 (bounded) and run 3 (linear in keys), not an exact row count.

Usage: python scripts/ttl_decay_evidence.py [sf_dir]
Prints the markdown rows for SCALE_EVIDENCE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor
from pyspark.sql.types import LongType, StructField, StructType

from facebook_ad_library_data_pipeline_spark.catalog import load_table
from facebook_ad_library_data_pipeline_spark.session import get_spark
from facebook_ad_library_data_pipeline_spark.vendorpath import ensure_protobuf
from scripts.stream_scale_evidence import ROCKSDB, write_sliced

TTL_MS = 2_000
ROWS_PER_SLICE = 2_500

OUT_SCHEMA = StructType(
    [StructField("key", LongType()), StructField("n", LongType())]
)


class TtlCountProcessor(StatefulProcessor):
    """One ValueState row per key, optionally TTL'd. Each key's rows
    arrive in exactly one slice (disjoint remap), after which the key
    is idle forever — the TTL eviction target."""

    def __init__(self, ttl_ms: int | None):
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:
        self._n = handle.getValueState("n", "n bigint", ttlDurationMs=self._ttl_ms)

    def handleInputRows(self, key, rows, timer_values):
        n = self._n.get()[0] if self._n.exists() else 0
        for pdf in rows:
            n += len(pdf)
        self._n.update((n,))
        yield pd.DataFrame({"key": [key[0]], "n": [n]})

    def close(self) -> None:
        pass


def run_ttl_stream(spark, flat_dir: Path, name: str, ttl_ms: int | None, total: int) -> dict:
    schema = spark.read.parquet(str(flat_dir)).schema
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat_dir))
    )
    out = events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TtlCountProcessor(ttl_ms),
        outputStructType=OUT_SCHEMA,
        outputMode="Update",
        # TTL needs the processing-time clock; without TTL the bounded
        # run may self-quiesce, with it the operator keeps requesting
        # batches — both paths drain on the sink fixpoint below
        timeMode="ProcessingTime" if ttl_ms else "None",
    )
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    t0 = time.perf_counter()
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    # drain: every key emits from exactly one slice, so the sink's
    # sum(n) over keys reaches the source row count exactly once
    try:
        deadline = time.monotonic() + 600
        while time.monotonic() < deadline:
            got = spark.sql(
                f"SELECT coalesce(sum(n), 0) FROM "
                f"(SELECT key, max(n) AS n FROM {name} GROUP BY key)"
            ).collect()[0][0]
            if got == total:
                break
            if not q.isActive:
                exc = q.exception()
                if exc is not None:
                    raise exc
                break
            time.sleep(0.3)
        peak = final = batches = 0
        for p in q.recentProgress:
            batches += 1
            for so in p["stateOperators"]:
                peak = max(peak, int(so["numRowsTotal"]))
                final = int(so["numRowsTotal"])
        wall = time.perf_counter() - t0
    finally:
        # never leak a running ProcessingTime query into the next run
        q.stop()
    return dict(peak=peak, final=final, batches=batches, wall=wall)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ttl_decay_evidence")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_protobuf(spark)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "800")

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value", "ts")
        .orderBy("ts", "event_id")
    )

    def transient_keys(n_slices: int) -> tuple[Path, int, int]:
        """First n_slices × ROWS_PER_SLICE rows, user_id remapped so
        every slice's key set is disjoint (slice index in the high
        digits)."""
        from pyspark.sql import Window

        rows = n_slices * ROWS_PER_SLICE
        df = (
            ev.limit(rows)
            .withColumn(
                "rn", F.row_number().over(Window.orderBy("ts", "event_id")) - 1
            )
            .withColumn(
                "user_id",
                (F.col("rn") / ROWS_PER_SLICE).cast("bigint") * 1_000_000
                + F.col("user_id"),
            )
            .drop("rn")
        )
        n_keys = df.select("user_id").distinct().count()
        # write_sliced mkdirs the target itself; hand it a fresh subdir
        out = Path(tempfile.mkdtemp(prefix=f"ttl_decay_{n_slices}_")) / "sliced"
        total = write_sliced(df, out, n_slices)
        return out / "flat", total, n_keys

    small_dir, small_total, small_keys = transient_keys(4)
    big_dir, big_total, big_keys = transient_keys(40)

    r_small = run_ttl_stream(spark, small_dir, "ttl_small", TTL_MS, small_total)
    r_big = run_ttl_stream(spark, big_dir, "ttl_big", TTL_MS, big_total)
    r_nottl = run_ttl_stream(spark, big_dir, "ttl_off", None, big_total)

    print(
        "| stream | TTL | input rows | micro-batches | cumulative keys "
        "| peak state rows | final state rows | wall s |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for label, keys, total, r, ttl in (
        ("4 slices, transient keys", small_keys, small_total, r_small, f"{TTL_MS} ms"),
        ("40 slices, transient keys (10× universe)", big_keys, big_total, r_big, f"{TTL_MS} ms"),
        ("40 slices, transient keys (10× universe)", big_keys, big_total, r_nottl, "off"),
    ):
        print(
            f"| {label} | {ttl} | {total} | {r['batches']} | {keys} "
            f"| {r['peak']} | {r['final']} | {r['wall']:.1f} |"
        )
    print(
        f"\nkey universe grew {big_keys / max(1, small_keys):.1f}×; "
        f"final state with TTL grew {r_big['final'] / max(1, r_small['final']):.2f}× "
        f"(plateau claim holds if ≪ universe growth); "
        f"without TTL final state = {r_nottl['final']} "
        f"({r_nottl['final'] / max(1, big_keys):.2f}× of every key ever seen)"
    )


if __name__ == "__main__":
    main()
