"""Scale evidence for the SemDeDup cluster-prune operator
(SCALE_EVIDENCE.md generator).

Runs q_semdedup end-to-end at the given sf-dir and on a 10×-replicated
embedding corpus — the ADVERSARIAL case for cluster-prune dedup: every
vector appears 10×, so every replica group lands in one cluster and
every within-cluster pair of replicas is a true duplicate. If the pair
stage were all-pairs the cost would grow 100×; the cluster-blocked
design should grow ~10× in rows and ≲ Σ cluster_size² in pair work.

The 10× corpus is materialized as a real sf-dir (embeddings.parquet in
a temp dir, vec_ids remapped to stay unique: replica r of vector v gets
vec_id v*10+r, keeping ordering determinism) so the query runs its
actual registered code path.

Usage: SPARK_GRAFT_UI=true python scripts/semdedup_scale_evidence.py [sf_dir]
(the UI REST API supplies the measured shuffle-record counts; the
tuned session disables the UI unless SPARK_GRAFT_UI=true).
Prints the markdown table rows for SCALE_EVIDENCE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.catalog import load_table
from facebook_ad_library_data_pipeline_spark.registry import load_all
from facebook_ad_library_data_pipeline_spark.session import get_spark

REP = 10


def shuffle_records(spark) -> int:
    """Cumulative shuffle-write records across all stages via the UI
    REST API (the scale_evidence.py idiom — the numbers the UI shows)."""
    import json
    import urllib.request

    assert spark.sparkContext.uiWebUrl, (
        "UI disabled — run with SPARK_GRAFT_UI=true (the REST API is "
        "where the measured shuffle-record counts come from)"
    )
    app = spark.sparkContext.applicationId
    url = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{app}/stages"
    stages = json.load(urllib.request.urlopen(url))
    return sum(s.get("shuffleWriteRecords", 0) for s in stages)


def run(name: str, sf_dir: str, spark) -> tuple[float, int, int]:
    q = load_all()[name]
    before = shuffle_records(spark)
    t0 = time.time()
    n = q.fn(spark, sf_dir).count()
    wall = time.time() - t0
    return wall, shuffle_records(spark) - before, n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    w1, s1, n1 = run("q_semdedup", sf_dir, spark)
    # warm run (first run pays Arrow daemon spin-up)
    w1b, s1b, n1b = run("q_semdedup", sf_dir, spark)

    rep_dir = os.path.join(tempfile.gettempdir(), f"semdedup10x_{uuid.uuid4().hex}")
    os.makedirs(rep_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    (
        emb.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(REP - 1))))
        .select(
            (F.col("vec_id") * REP + F.col("r")).alias("vec_id"),
            "embedding",
            "label",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(rep_dir, "emb_tmp"))
    )
    # single FILE (catalog.load_table probes one parquet footer)
    import glob
    import shutil

    parts = glob.glob(os.path.join(rep_dir, "emb_tmp", "part-*.parquet"))
    assert len(parts) == 1, (
        f"expected exactly one part file in {rep_dir}/emb_tmp, "
        f"found {len(parts)} — coalesce(1) write produced an "
        "unexpected layout"
    )
    part = parts[0]
    shutil.move(part, os.path.join(rep_dir, "embeddings.parquet"))
    shutil.rmtree(os.path.join(rep_dir, "emb_tmp"))

    try:
        w10, s10, n10 = run("q_semdedup", rep_dir, spark)
        print("| corpus | wall s | shuffle records | out rows |")
        print("|---|---|---|---|")
        print(f"| {sf_dir} (cold) | {w1:.2f} | {s1:,} | {n1:,} |")
        print(f"| {sf_dir} (warm) | {w1b:.2f} | {s1b:,} | {n1b:,} |")
        print(f"| 10× replicated | {w10:.2f} | {s10:,} | {n10:,} |")
        print(
            f"ratios vs warm: wall {w10 / max(w1b, 1e-9):.1f}×, "
            f"shuffle {s10 / max(s1b, 1):.1f}×, rows {n10 / max(n1b, 1):.1f}×"
        )
    finally:
        shutil.rmtree(rep_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
