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


def test_partitioned_stream_reader_plans_shard_cuts():
    """partitions(start, end) must split the admitted row-id range on
    shard boundaries (one shard per InputPartition, no gaps/overlaps)
    and the offset cursor must drain the bounded row space in
    STREAM_BATCH_ROWS steps — driver does bookkeeping only; every row
    is produced in read(partition) on executors."""
    from facebook_ad_library_data_pipeline_spark.sources.pysource import (
        STREAM_BATCH_ROWS,
        STREAM_TOTAL_ROWS,
        SyntheticEventsPartitionedStreamReader,
    )

    r = SyntheticEventsPartitionedStreamReader()
    assert r.initialOffset() == {"offset": 0}
    # The admission floor advances via commit() (mirroring the engine's
    # latestOffset → plan → commit loop) in batch-sized steps and
    # clamps at the end; repeated latestOffset probes within one
    # trigger are idempotent — the r07-advice fix for the mutating
    # cursor that silently admitted a never-planned batch.
    seen = [0]
    while seen[-1] < STREAM_TOTAL_ROWS:
        head = r.latestOffset()["offset"]
        assert r.latestOffset()["offset"] == head
        r.commit({"offset": head})
        seen.append(head)
    assert seen[1] - seen[0] == STREAM_BATCH_ROWS
    assert seen[-1] == STREAM_TOTAL_ROWS

    # A range spanning 2.5 shards cuts into exactly 3 single-shard parts.
    parts = r.partitions(
        {"offset": SYNTH_ROWS_PER_SHARD // 2}, {"offset": SYNTH_ROWS_PER_SHARD * 3}
    )
    spans = [(p.start, p.end) for p in parts]
    assert spans == [
        (SYNTH_ROWS_PER_SHARD // 2, SYNTH_ROWS_PER_SHARD),
        (SYNTH_ROWS_PER_SHARD, SYNTH_ROWS_PER_SHARD * 2),
        (SYNTH_ROWS_PER_SHARD * 2, SYNTH_ROWS_PER_SHARD * 3),
    ]
    # No gaps/overlaps, each confined to one shard.
    for (s, e) in spans:
        assert (e - 1) // SYNTH_ROWS_PER_SHARD == s // SYNTH_ROWS_PER_SHARD

    # read() is a pure function of the partition — executor-safe — and
    # reproduces the LCG closed form.
    batch = next(iter(r.read(parts[0])))
    import numpy as np

    rid = batch.column("row_id").to_numpy()
    val = batch.column("value").to_numpy()
    assert rid[0] == SYNTH_ROWS_PER_SHARD // 2 and len(rid) == SYNTH_ROWS_PER_SHARD // 2
    assert (val == (1103515245 * rid + 12345) % 2147483648).all()

    # Empty admit range still yields one (empty) partition.
    empty = r.partitions({"offset": 5}, {"offset": 5})
    assert len(empty) == 1 and empty[0].start == empty[0].end


def test_partitioned_stream_source_checkpoint_resume(spark, tmp_path):
    """The partitioned reader must survive a checkpoint restart without
    losing or duplicating rows: phase 1 processes one micro-batch and
    stops; phase 2 restarts from the same checkpoint and drains the
    rest. The offset cursor restarting at 0 is fine — ranges already
    committed re-plan as empty partitions until the cursor passes the
    checkpointed offset (closed-form rows make any replay idempotent
    anyway, but the row count proves nothing duplicates)."""
    from facebook_ad_library_data_pipeline_spark.sources.pysource import (
        STREAM_BATCH_ROWS,
        STREAM_TOTAL_ROWS,
        register_synth_stream_source,
    )

    register_synth_stream_source(spark)
    sink = tmp_path / "rows_part"
    ckpt = str(tmp_path / "ckpt_part")

    def write_epoch(df, epoch_id):
        df.write.mode("overwrite").parquet(f"{sink}/epoch={epoch_id}")

    stream = spark.readStream.format("synth_events_stream_part").load()
    q = (
        stream.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", ckpt)
        .trigger(once=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(str(sink)).count() == STREAM_BATCH_ROWS

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
