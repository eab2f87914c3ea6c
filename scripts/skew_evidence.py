"""Measured skew evidence: a hot-key join with and without mitigation.

Builds a synthetic skewed fact (SKEW_ROWS rows, HOT_FRAC of them on one
key) joined to a 100-key dim, and measures three strategies:

* baseline: plain shuffle join with AQE skew-splitting DISABLED and
  broadcast disabled — the one-straggler-task shape;
* aqe: plain join with AQE skew-join enabled and thresholds lowered so
  the local data size qualifies (at 100 TB the defaults qualify on
  their own);
* salted: operators/skew.salted_join — explicit 8-way key salting.

Reports wall seconds and the MAX single-task duration of the join
stage (straggler time, from the UI REST API) — the number the salt is
supposed to cut. Appended to SCALE_EVIDENCE.md by hand.

Usage: python scripts/skew_evidence.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.operators.skew import salted_join
from facebook_ad_library_data_pipeline_spark.session import get_spark

SKEW_ROWS = 16_000_000
HOT_FRAC = 0.9
N_KEYS = 100


def join_stage_straggler_ms(spark, since_stage: int) -> tuple[int, int]:
    """Max single-task runtime of the JOIN stage (identified as the
    completed stage with the largest shuffle-read volume since the
    previous strategy ran) — the straggler number skew mitigation is
    supposed to cut."""
    app = spark.sparkContext.applicationId
    url = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{app}/stages"
    stages = json.load(urllib.request.urlopen(url))
    cand = [
        s for s in stages
        if s["stageId"] > since_stage and s["status"] == "COMPLETE"
    ]
    if not cand:  # REST listing lag — better a missing cell than a crash
        return -1, since_stage
    last = max(s["stageId"] for s in cand)
    join_stage = max(cand, key=lambda s: s.get("shuffleReadBytes", 0))
    q = json.load(
        urllib.request.urlopen(
            f"{url}/{join_stage['stageId']}/0/taskSummary?quantiles=1.0"
        )
    )
    return int(q["executorRunTime"][0]), last


def main() -> None:
    os.environ["SPARK_GRAFT_UI"] = "true"
    spark = get_spark("skew-evidence")
    sc = spark.sparkContext

    hot = int(SKEW_ROWS * HOT_FRAC)
    fact = spark.range(SKEW_ROWS).select(
        F.when(F.col("id") < hot, F.lit(0))
        .otherwise((F.col("id") % (N_KEYS - 1)) + 1)
        .alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    dim = spark.range(N_KEYS).select(F.col("id").alias("k"), (F.col("id") * 7).alias("w"))
    # force the shuffle-join path: a 100-row dim would otherwise broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def run(df):
        t0 = time.perf_counter()
        df.groupBy().agg(F.sum(F.col("v") + F.col("w")).alias("s")).collect()
        return time.perf_counter() - t0

    results = {}
    last_stage = -1

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    dt = run(fact.join(dim.hint("shuffle_hash"), "k"))
    mx, last_stage = join_stage_straggler_ms(spark, last_stage)
    results["baseline (no AQE skew)"] = (dt, mx)

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    # AQE skew-split applies to sort-merge joins
    dt = run(fact.join(dim.hint("merge"), "k"))
    mx, last_stage = join_stage_straggler_ms(spark, last_stage)
    results["aqe skew-split (SMJ)"] = (dt, mx)

    # CRITICAL: reset the AQE-strategy confs first — the salted run must
    # measure SALTING, not AQE skew-splitting layered on top of it
    # (caught in review: the first published numbers had both active).
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    dt = run(salted_join(fact, dim, "k", "k"))
    mx, last_stage = join_stage_straggler_ms(spark, last_stage)
    results["salted_join (8-way)"] = (dt, mx)

    print("| strategy | wall s | join-stage straggler ms |")
    print("|---|---|---|")
    for k, (dt, mx) in results.items():
        print(f"| {k} | {dt:.1f} | {mx} |")
    spark.stop()


if __name__ == "__main__":
    main()
