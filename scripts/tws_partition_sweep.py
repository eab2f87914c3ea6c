"""Re-sweep the tws family's shuffle-partition knob after the
round-trip reductions (the knee was measured at 16 BEFORE the
processors stopped paying ~3-30 round-trips per key-batch; fewer
round-trips ⇒ less parallelism win ⇒ the per-partition store+worker
fixed cost may now dominate earlier).

Usage: python scripts/tws_partition_sweep.py 8 16 [--runs 3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from facebook_ad_library_data_pipeline_spark.registry import load_all
from facebook_ad_library_data_pipeline_spark.session import get_spark

FAMILY = [
    "q_stream_transform_with_state",
    "q_stream_tws_list_ttl",
    "q_stream_tws_timers",
    "q_stream_tws_event_timers",
    "q_stream_tws_map_spill",
    "q_stream_tws_initial_state",
    "q_stream_tws_reservoir",
]


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    settings = [a for a in args] or ["8", "16"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tws_partition_sweep")
    registry = load_all()
    spark.range(1000).selectExpr("sum(id)").collect()

    from facebook_ad_library_data_pipeline_spark.streaming import events as ev
    import facebook_ad_library_data_pipeline_spark.streaming.stateful as st

    orig = ev.run_stream_to_memory
    current = {"p": None}

    def forced(stream_df, name, **kw):
        if current["p"] is not None:
            kw["partitions"] = current["p"]
        return orig(stream_df, name, **kw)

    ev.run_stream_to_memory = forced
    st.run_stream_to_memory = forced
    try:
        # interleave settings per query so session drift hits both evenly
        for name in FAMILY:
            q = registry[name]
            line = [name]
            for p in settings:
                current["p"] = p
                samples = []
                for _ in range(runs):
                    t0 = time.perf_counter()
                    q.fn(spark, sf_dir).count()
                    samples.append(round(time.perf_counter() - t0, 2))
                med = sorted(samples)[len(samples) // 2]
                line.append(f"p{p}={med} {samples}")
            print("  ".join(line), flush=True)
    finally:
        ev.run_stream_to_memory = orig
        st.run_stream_to_memory = orig
    spark.stop()


if __name__ == "__main__":
    main()
