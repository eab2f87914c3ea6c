"""Custom Python DataSource contracts beyond the oracle sweep: the
sink's commit protocol must exclude orphan files, and the streaming
reader's replay contract must reproduce any offset range."""

from __future__ import annotations

import json
from pathlib import Path

from facebook_ad_library_data_pipeline_spark.sources.pysource import (
    SYNTH_ROWS_PER_SHARD,
    SYNTH_SHARDS,
    SyntheticEventsStreamReader,
    register_synth_source,
)


def test_sink_manifest_excludes_orphans(spark, tmp_path):
    from facebook_ad_library_data_pipeline_spark.sources.pysource import (
        register_synth_sink,
    )

    register_synth_source(spark)
    register_synth_sink(spark)
    out = tmp_path / "rows"
    df = (
        spark.read.format("synth_events")
        .option("shards", 2)
        .option("rows_per_shard", 100)
        .load()
    )
    df.write.format("synth_jsonl_sink").option("path", str(out)).mode("append").save()
    # simulate a failed task's leftover: an orphan file the commit never saw
    orphan = out / "part-deadbeef.jsonl"
    orphan.write_text('{"row_id": 999999, "shard": 9, "value": 0}\n')
    manifest = json.loads((out / "_MANIFEST").read_text())
    assert str(orphan) not in manifest["files"]
    assert manifest["n_rows"] == 200
    # reading ONLY manifest files sees exactly the committed rows
    back = spark.read.schema("row_id bigint, shard int, value bigint").json(
        manifest["files"]
    )
    assert back.count() == 200
    assert back.filter("shard = 9").count() == 0


def test_stream_reader_replay_matches_prefetch():
    r = SyntheticEventsStreamReader()
    start = r.initialOffset()
    it, end = r.read(start)
    prefetched = list(it)
    assert end["offset"] > start["offset"]
    replayed = list(r.readBetweenOffsets(start, end))
    assert replayed == prefetched  # exact-replay recovery contract
    # full drain covers every global row id exactly once
    seen = len(prefetched)
    off = end
    while off["offset"] < SYNTH_SHARDS * SYNTH_ROWS_PER_SHARD:
        it, off2 = r.read(off)
        seen += len(list(it))
        assert off2["offset"] > off["offset"]
        off = off2
    assert seen == SYNTH_SHARDS * SYNTH_ROWS_PER_SHARD
    # drained source returns an empty batch with an unmoved offset
    it, off3 = r.read(off)
    assert list(it) == [] and off3 == off


def test_python_stream_source_checkpoint_resume(spark, tmp_path):
    """Real recovery: one micro-batch committed under a checkpoint,
    then a RESTART from that checkpoint drains the rest — the resumed
    query must start from the committed offset (initialOffset is only
    read on first start) and the union of epochs must cover every
    global row id exactly once: nothing lost, nothing duplicated."""
    from facebook_ad_library_data_pipeline_spark.sources.pysource import (
        STREAM_BATCH_ROWS,
        STREAM_TOTAL_ROWS,
        register_synth_stream_source,
    )

    register_synth_stream_source(spark)
    sink = tmp_path / "rows"
    ckpt = str(tmp_path / "ckpt")

    def write_epoch(df, epoch_id):
        df.write.mode("overwrite").parquet(f"{sink}/epoch={epoch_id}")

    stream = spark.readStream.format("synth_events_stream").load()
    # phase 1: exactly ONE micro-batch, then stop
    q = (
        stream.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", ckpt)
        .trigger(once=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(str(sink)).count() == STREAM_BATCH_ROWS
    # phase 2: restart from the SAME checkpoint, drain the remainder
    q = (
        stream.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = spark.read.parquet(str(sink))
    assert back.count() == STREAM_TOTAL_ROWS
    assert back.select("row_id").distinct().count() == STREAM_TOTAL_ROWS
