"""One-off scale probe for the near-dup family (SCALE.md evidence).

Measures, at sf0.1 (5k docs) and on a 10x-replicated hot-shingle
corpus (50k docs, every doc duplicated 10x so every shingle's document
frequency is 10x hotter), how the shingle document-frequency cap bounds
the candidate self-join:

    postings kept | candidate pairs | >=0.6 pairs | wall seconds

for cap in {None (off), 512 (default), 100 (aggressive)}. The
candidate-pair count is the size of the shingle self-join's output
BEFORE the Jaccard threshold — the quantity that goes quadratic per
hot bucket and the one the cap exists to bound.

Usage: python scripts/scale_probe_dedup.py [sf_dir]
Prints a markdown table; paste into SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.catalog import load_table
from facebook_ad_library_data_pipeline_spark.operators.dedup_near import (
    JACCARD_THRESHOLD,
    exploded_shingles,
)
from facebook_ad_library_data_pipeline_spark.session import get_spark


def probe(docs, cap):
    """Mirror jaccard_pairs but count the candidate join output before
    the threshold filter (jaccard_pairs itself only exposes the
    filtered result)."""
    t0 = time.perf_counter()
    ex = exploded_shingles(docs).localCheckpoint(eager=False)
    if cap is not None:
        hot = (
            ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > cap).select("s")
        )
        ex = ex.join(hot, "s", "left_anti").localCheckpoint(eager=False)
    n_postings = ex.count()
    a, b = ex.alias("a"), ex.hint("shuffle_hash").alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"),
             F.first(F.col("a.n")).alias("n1"),
             F.first(F.col("b.n")).alias("n2"))
        .localCheckpoint(eager=False)
    )
    n_candidates = pairs.count()
    jac = F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
    n_pass = pairs.filter(jac >= JACCARD_THRESHOLD).count()
    return n_postings, n_candidates, n_pass, time.perf_counter() - t0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe")
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_base = base.count()
    replicated = base.selectExpr("doc_id", "text", "explode(sequence(0, 9)) AS rep").select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"), "text"
    ).localCheckpoint(eager=False)
    n_rep = replicated.count()

    print(f"| corpus | docs | cap | postings kept | candidate pairs | >= {JACCARD_THRESHOLD} pairs | wall s |")
    print("|---|---|---|---|---|---|---|")
    for label, docs, n in [("sf0.1 natural", base, n_base), ("10x replicated", replicated, n_rep)]:
        for cap in (None, 512, 100):
            p, c, k, dt = probe(docs, cap)
            print(f"| {label} | {n} | {cap or 'off'} | {p} | {c} | {k} | {dt:.1f} |")
    spark.stop()


if __name__ == "__main__":
    main()
