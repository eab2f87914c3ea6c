"""Benchmark runner: times every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed to full materialization (count of a cached-free
plan) — no collect of payload to the driver beyond the count.

Per-query numbers are the MEDIAN of $SPARK_GRAFT_BENCH_REPEATS runs
(default 3): same-code runs on this VM showed 5-9x single-shot swings
(q_tpch_q11 1.17 s vs 10.49 s in back-to-back r03 runs), which made
regression detection guesswork. The median discards the outlier run;
the first repeat also absorbs any session-cache warm-up so repeated
benches agree.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from facebook_ad_library_data_pipeline_spark.registry import load_all
from facebook_ad_library_data_pipeline_spark.session import get_spark


def _cpu_jiffies() -> tuple[int, int] | None:
    """(steal, total) jiffies from /proc/stat line 1, or None off-Linux."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    jiffies0 = _cpu_jiffies()
    spark = get_spark("bench")
    registry = load_all()

    # JVM/codegen/scan warmup so the first timed query isn't charged
    # for session startup
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(10).count()

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    timings: dict[str, float] = {}
    total = 0.0
    # Measurement order is PINNED: all batch queries first (sorted),
    # then the streaming/state family (q_stream_*/q_state_*, sorted)
    # last. The family's multi-micro-batch churn (RocksDB store
    # commits, state-server round-trips, checkpoint builds) was
    # inflating whichever queries happened to sort after it by 10-30%
    # and drifting the committed map upward each round as the family
    # grew (BASELINE.md round-9 notes); running it last keeps the
    # batch section's environment stable run-over-run, and the extra
    # per-query GC below isolates the family's own numbers from one
    # another's store/checkpoint debris.
    ordered = sorted(registry)
    stream_family = [
        n for n in ordered if n.startswith(("q_stream_", "q_state_"))
    ]
    stream_set = set(stream_family)
    ordered = [n for n in ordered if n not in stream_set] + stream_family
    for i, name in enumerate(ordered):
        q = registry[name]
        if i % 15 == 0 or name in stream_set:
            # ContextCleaner only purges broadcast/shuffle state on GC;
            # over 100+ queries in one session the un-GC'd state causes
            # 2-10× slowdowns late in the run (see BASELINE.md). An
            # explicit GC every ~15 queries is ~100 ms and keeps
            # timings representative of a fresh session.
            spark.sparkContext._jvm.System.gc()
        samples: list[float] = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            try:
                df = q.fn(spark, sf_dir)
                df.count()
                samples.append(time.perf_counter() - t0)
            except Exception as e:  # a failing query must not kill the bench
                # keep any samples already collected: a repeat-only
                # flake (e.g. a tmp-dir race) shouldn't discard a valid
                # first timing — NaN only when EVERY repeat failed
                print(f"# bench error {name}: {e}", file=sys.stderr)
                break
        if samples:
            dt = sorted(samples)[len(samples) // 2]
        else:
            dt = float("nan")
        timings[name] = round(dt, 4)
        if dt == dt:
            total += dt

    payload = {
        "metric": "total_query_wall_seconds",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    # ADDITIVE observability (same one-line contract, extra keys):
    # hypervisor steal over the whole run — r16's driver bench ran
    # inside a 15-36% steal window and the numbers were uninterpretable
    # without this — plus the boot id so cross-boot maps aren't
    # silently compared.
    jiffies1 = _cpu_jiffies()
    if jiffies0 and jiffies1 and jiffies1[1] > jiffies0[1]:
        payload["steal_pct"] = round(
            100.0 * (jiffies1[0] - jiffies0[0]) / (jiffies1[1] - jiffies0[1]), 2
        )
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            payload["boot_id"] = f.read().strip()
    except OSError:
        pass
    print(json.dumps(payload))
    # The driver's recorded copy truncates the head of the per-query map
    # (alphabetically-early queries were invisible in BENCH_r01/r02);
    # persist the full map so rounds stay comparable. Only the canonical
    # sf0.1 run may write it — a smoke run at another scale must not
    # clobber the comparable artifact (happened twice in round 5).
    if sf == 0.1:
        try:
            here = os.path.dirname(os.path.abspath(__file__))
            with open(os.path.join(here, "BENCH_FULL.json"), "w") as f:
                json.dump(payload, f, indent=1, sort_keys=True)
        except OSError as e:
            print(f"# bench artifact write failed: {e}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
