"""Phase-profile one typed-state streaming query: wall time split into
(source split prep, stream run, sink snap/projection) plus the engine's
own per-micro-batch durationMs breakdown from recentProgress.

Usage:
    python scripts/tws_profile.py q_stream_tws_map_spill [...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from facebook_ad_library_data_pipeline_spark.registry import load_all
from facebook_ad_library_data_pipeline_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tws_profile")
    registry = load_all()
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(10).count()

    # Intercept run_stream_to_memory to read progress before stop()
    from facebook_ad_library_data_pipeline_spark.streaming import events as ev

    orig = ev.run_stream_to_memory
    captured: list = []

    def wrapped(stream_df, name, **kw):
        spark_ = stream_df.sparkSession
        t0 = time.perf_counter()
        # replicate orig but capture progress: call orig, then the query
        # is stopped — so instead patch StreamingQuery.stop to grab
        # progress first.
        from pyspark.sql.streaming import StreamingQuery

        real_stop = StreamingQuery.stop

        def stop_capture(self):
            try:
                captured.append(list(self.recentProgress))
            except Exception:
                pass
            real_stop(self)

        StreamingQuery.stop = stop_capture
        try:
            orig(stream_df, name, **kw)
        finally:
            StreamingQuery.stop = real_stop
        captured.append(("stream_wall", time.perf_counter() - t0))

    for name in names:
        q = registry[name]
        for run in range(2):
            captured.clear()
            t0 = time.perf_counter()
            ev.run_stream_to_memory = wrapped
            # also patch the name imported into stateful/other modules
            import facebook_ad_library_data_pipeline_spark.streaming.stateful as st

            st.run_stream_to_memory = wrapped
            try:
                df = q.fn(spark, sf_dir)
                n = df.count()
            finally:
                ev.run_stream_to_memory = orig
                st.run_stream_to_memory = orig
            total = time.perf_counter() - t0
            print(f"\n=== {name} run{run}: total={total:.2f}s rows={n}")
            for item in captured:
                if isinstance(item, tuple):
                    print(f"  {item[0]}: {item[1]:.2f}s")
                    continue
                progresses = item
                print(f"  micro-batches: {len(progresses)}")
                for p in progresses:
                    d = p.get("durationMs", {})
                    rows = p.get("numInputRows", 0)
                    print(
                        f"    batch={p.get('batchId')} rows={rows} "
                        f"triggerExecution={d.get('triggerExecution')} "
                        f"addBatch={d.get('addBatch')} "
                        f"getBatch={d.get('getBatch')} "
                        f"latestOffset={d.get('latestOffset')} "
                        f"queryPlanning={d.get('queryPlanning')} "
                        f"commitOffsets={d.get('commitOffsets')} "
                        f"walCommit={d.get('walCommit')}"
                    )
    spark.stop()


if __name__ == "__main__":
    main()
