"""Per-batch RocksDB commit/snapshot metrics for one tws query, for
the changelog-checkpointing A/B: wall clock on this VM is steal-noisy,
so read the ENGINE's own stateOperators customMetrics (commit latency,
changelog/snapshot write times) from recentProgress instead.

Usage:
    SPARK_GRAFT_TWS_CHANGELOG=true python scripts/tws_commit_metrics.py q_stream_tws_map_spill
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from facebook_ad_library_data_pipeline_spark.registry import load_all
from facebook_ad_library_data_pipeline_spark.session import get_spark

KEYS = (
    "rocksdbCommitCheckpointLatency",
    "rocksdbCommitCompactLatency",
    "rocksdbCommitFileSyncLatencyMs",
    "rocksdbCommitFlushLatency",
    "rocksdbCommitWriteBatchLatency",
    "rocksdbTotalBytesWrittenByFlush",
    "rocksdbSstFileSize",
    "SnapshotLastUploaded.partition_0_default",
)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tws_commit_metrics")
    registry = load_all()
    spark.range(1000).selectExpr("sum(id)").collect()

    from facebook_ad_library_data_pipeline_spark.streaming import events as ev
    import facebook_ad_library_data_pipeline_spark.streaming.stateful as st

    orig = ev.run_stream_to_memory
    captured: list = []

    def wrapped(stream_df, name, **kw):
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

    # default must match stateful.py's effective default ("true"), or a
    # run without the env var prints changelog=false while the knob is
    # actually on (ADVICE r16)
    mode = os.environ.get("SPARK_GRAFT_TWS_CHANGELOG") or "true"
    for name in names:
        q = registry[name]
        for run in range(2):
            captured.clear()
            ev.run_stream_to_memory = wrapped
            st.run_stream_to_memory = wrapped
            t0 = time.perf_counter()
            try:
                df = q.fn(spark, sf_dir)
                df.count()
            finally:
                ev.run_stream_to_memory = orig
                st.run_stream_to_memory = orig
            total = time.perf_counter() - t0
            print(f"\n=== {name} changelog={mode} run{run}: total={total:.2f}s")
            for progresses in captured:
                if not isinstance(progresses, list):
                    continue
                for p in progresses:
                    d = p.get("durationMs", {})
                    ops = p.get("stateOperators", [])
                    line = (
                        f"  batch={p.get('batchId')} rows={p.get('numInputRows')} "
                        f"addBatch={d.get('addBatch')} "
                        f"commitOffsets={d.get('commitOffsets')}"
                    )
                    for op in ops:
                        cm = op.get("customMetrics", {})
                        line += (
                            f" | commitMs={op.get('commitTimeMs')}"
                            f" ckptLat={cm.get('rocksdbCommitCheckpointLatency')}"
                            f" syncMs={cm.get('rocksdbCommitFileSyncLatencyMs')}"
                            f" flushLat={cm.get('rocksdbCommitFlushLatency')}"
                            f" filesCopied={cm.get('rocksdbFilesCopied')}"
                            f" bytesCopied={cm.get('rocksdbBytesCopied')}"
                            f" zipLat={cm.get('rocksdbWriterZipFileLatencyMs', cm.get('rocksdbZipFileLatencyMs'))}"
                        )
                    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
