"""Linearity evidence for the Python-codec family (SCALE_EVIDENCE.md,
round 7): the mapInPandas decode/tokenize queries — video container +
per-frame BMP decode, WAV PCM16 round trip, BPE encode — are claimed
embarrassingly parallel with zero shuffle. Measure wall seconds at
sf0.1 and on a 10×-replicated documents corpus (distinct doc_ids):
linear wall growth + zero shuffle-write records = the claim holds, no
hidden exchange or driver serialization appears as data grows.

Usage: python scripts/codec_scale_evidence.py [sf_dir]
Prints the markdown table for SCALE_EVIDENCE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.catalog import load_table
from facebook_ad_library_data_pipeline_spark.registry import load_all
from facebook_ad_library_data_pipeline_spark.session import get_spark
from scale_evidence import REP, REP_OFFSET, shuffle_write_records

QUERIES = ("q_video_frame_decode", "q_audio_pcm_stats", "q_bpe_tokenize")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    os.environ["SPARK_GRAFT_UI"] = "true"
    spark = get_spark("codec-scale-evidence")
    registry = load_all()

    docs = load_table(spark, sf_dir, "documents")
    n_base = docs.count()
    out = tempfile.mkdtemp(prefix="codec10x_")
    cols = [c for c in docs.columns if c != "doc_id"]
    (
        docs.select("*", F.explode(F.sequence(F.lit(0), F.lit(REP - 1))).alias("rep"))
        .select((F.col("doc_id") + F.col("rep") * REP_OFFSET).alias("doc_id"), *cols)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )

    print("| query | corpus | docs | output rows | shuffle-write records | wall s |")
    print("|---|---|---|---|---|---|")
    for name in QUERIES:
        # untimed warm-up: absorbs one-time Python-worker/JVM startup
        # and the fitters' bounded-sample jobs, so the timed rows
        # compare steady-state decode cost, not cold-start.
        registry[name].fn(spark, sf_dir).count()
        for label, d, n in (
            (os.path.basename(sf_dir), sf_dir, n_base),
            (f"{REP}x replicated", out, n_base * REP),
        ):
            pre = shuffle_write_records(spark)
            t0 = time.perf_counter()
            n_out = registry[name].fn(spark, d).count()
            dt = time.perf_counter() - t0
            shuf = shuffle_write_records(spark) - pre
            print(f"| {name} | {label} | {n} | {n_out} | {shuf} | {dt:.1f} |")


if __name__ == "__main__":
    main()
