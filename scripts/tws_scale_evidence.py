"""Typed-state (transformWithStateInPandas) state-bound evidence.

Claim under test: the typed-state operator's state is bounded by the
KEY CARDINALITY (distinct users), not by stream length — a 10× bigger
stream over the SAME users must hold peak/final state rows ~flat while
wall clock grows ~linearly with input.

Density replication is the honest scale axis here (unlike the
stream-stream join in stream_scale_evidence.py, whose state is
watermark-bound and therefore needs a 10× SPAN): ValueState/MapState
rows exist per key, so neither more rows per key nor a longer span
should move the state row count.

Method: sf0.1 events as-is vs ten id-offset replicas with UNCHANGED
user_id (10× rows, same 1 500 keys), both written as 20 time-ordered
file slices and driven with maxFilesPerTrigger=1 through the
UserEngagementProcessor (ValueState totals + MapState per-type counts,
timeMode None so the bounded run self-quiesces) on the RocksDB
provider — the backend every live typed-state query here pins. State
rows come from StreamingQueryProgress.stateOperators, Spark's own
metrics. Correctness ride-along: per-user n_events at 10× must be
exactly 10× the 1× value.

Usage: python scripts/tws_scale_evidence.py [sf_dir]
Prints the markdown rows for SCALE_EVIDENCE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.catalog import load_table
from facebook_ad_library_data_pipeline_spark.session import get_spark
from facebook_ad_library_data_pipeline_spark.vendorpath import ensure_protobuf
from scripts.stream_scale_evidence import ROCKSDB, write_sliced

N_SLICES = 20


def run_tws_stream(spark, flat_dir: Path, schema, name: str) -> dict:
    from facebook_ad_library_data_pipeline_spark.streaming.stateful import (
        user_engagement_tws,
    )

    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat_dir))
    )
    out = user_engagement_tws(events)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    t0 = time.perf_counter()
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    wall = time.perf_counter() - t0
    peak_state = final_state = input_rows = batches = 0
    for p in q.recentProgress:
        batches += 1
        input_rows += int(p["numInputRows"])
        for so in p["stateOperators"]:
            peak_state = max(peak_state, int(so["numRowsTotal"]))
            final_state = int(so["numRowsTotal"])
    per_user = {
        r["user_id"]: r["n_events"]
        for r in spark.sql(
            f"SELECT user_id, max(n_events) AS n_events FROM {name} "
            "GROUP BY user_id"
        ).collect()
    }
    q.stop()
    return dict(
        input_rows=input_rows,
        batches=batches,
        users=len(per_user),
        peak_state=peak_state,
        final_state=final_state,
        wall=wall,
        per_user=per_user,
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("tws_scale_evidence")
    ensure_protobuf(spark)
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(N_SLICES * 15)
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    mx = ev.agg(F.max("event_id")).collect()[0][0]
    base = Path(tempfile.mkdtemp(prefix="tws_scale_"))

    one_dir = base / "one"
    n1 = write_sliced(ev, one_dir, N_SLICES)

    # 10× DENSITY: ten id-offset replicas, user_id unchanged — same
    # key set, ten times the rows per key.
    parts = [
        ev.select(
            (F.col("event_id") + F.lit(k * (mx + 1))).alias("event_id"),
            "user_id",
            "event_type",
            "value",
            "ts",
        )
        for k in range(10)
    ]
    ten = parts[0]
    for p in parts[1:]:
        ten = ten.unionByName(p)
    ten_dir = base / "ten"
    n10 = write_sliced(ten, ten_dir, N_SLICES)

    schema = spark.read.parquet(str(one_dir / "flat")).schema
    r1 = run_tws_stream(spark, one_dir / "flat", schema, "tws_scale_one")
    r10 = run_tws_stream(spark, ten_dir / "flat", schema, "tws_scale_ten")

    print(
        "| stream | store | input rows | micro-batches | distinct keys "
        "| peak state rows | final state rows | wall s |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for label, r in (
        ("1× (sf0.1 events)", r1),
        ("10× density, same keys", r10),
    ):
        print(
            f"| {label} | RocksDB | {r['input_rows']} | {r['batches']} "
            f"| {r['users']} | {r['peak_state']} | {r['final_state']} "
            f"| {r['wall']:.1f} |"
        )
    growth = r10["peak_state"] / max(1, r1["peak_state"])
    print(
        f"\npeak-state growth at 10× input: {growth:.2f}× "
        f"(key-bounded claim holds if ~1×)"
    )
    exact = all(
        r10["per_user"].get(u) == 10 * n for u, n in r1["per_user"].items()
    )
    print(f"per-user n_events at 10× == 10× the 1× value: {exact}")


if __name__ == "__main__":
    main()
