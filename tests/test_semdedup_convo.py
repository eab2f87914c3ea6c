"""Unit pins for semantic dedup (cluster-then-prune) and ordered
conversation assembly, beyond the registry oracle sweep: the keep
verdict on handmade duplicates, the cluster-boundary property SemDeDup
trades away, and the same-timestamp tie-break in sequence assembly.
"""

from __future__ import annotations

import hashlib
from datetime import datetime

from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.functions.semdedup import (
    assign_clusters,
    prune_within_clusters,
)


def test_semdedup_exact_dup_dropped_cross_cluster_kept(spark):
    """An exact duplicate lands in the SAME cluster (tie → lowest seed)
    and is pruned keeping the lowest id; a near-duplicate that is its
    own nearest seed survives — the cluster-boundary miss that is the
    documented SemDeDup trade (recall bought back by raising K or
    multi-probe, never by all-pairs)."""
    v = [1.0, 0.0, 0.0, 0.0]
    w = [0.999, 0.001, 0.0, 0.0]  # cos(v,w) > 0.9 but own nearest seed
    z = [0.0, 1.0, 0.0, 0.0]
    emb = spark.createDataFrame(
        [(0, v), (1, v), (2, w), (3, z)],
        "vec_id long, embedding array<float>",
    )
    out = {
        r.vec_id: r
        for r in prune_within_clusters(assign_clusters(emb)).collect()
    }
    assert out[0].keep and not out[1].keep  # exact dup: keep lowest id
    assert out[0].cluster_id == out[1].cluster_id == 0
    # w is its own seed (singleton cluster) -> survives despite cos>0.9
    assert out[2].keep and out[2].cluster_id == 2
    assert out[3].keep


def test_conversation_tiebreak_same_timestamp(spark):
    """Two events sharing a timestamp must order by event_id in the
    transcript — partition arrival order must not leak."""
    ts = datetime(2024, 1, 1, 12, 0, 0)
    ev = spark.createDataFrame(
        [(7, ts, 1, "b_second"), (5, ts, 1, "a_first")],
        "event_id long, ts timestamp, user_id long, event_type string",
    ).repartition(2)  # force cross-partition assembly
    seq = F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type")))
    transcript = F.array_join(
        F.transform(seq, lambda x: F.concat_ws(":", x["event_type"], x["event_id"])),
        "|",
    )
    row = ev.groupBy("user_id").agg(F.md5(transcript).alias("sig")).collect()[0]
    expected = hashlib.md5(b"a_first:5|b_second:7").hexdigest()
    assert row.sig == expected
