"""Isolated warm re-measure: run N back-to-back timed repeats of the
named queries in ONE fresh session (the BASELINE.md 4-run warm
protocol). Prints every sample; the median of the post-warmup runs is
the comparable number.

Usage:
    python scripts/isolate.py q_kmeans_lloyd q_pca_deflate [--runs 5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from facebook_ad_library_data_pipeline_spark.registry import load_all
from facebook_ad_library_data_pipeline_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs = 5
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("isolate")
    registry = load_all()
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(10).count()
    for name in args:
        q = registry[name]
        samples = []
        for _ in range(runs):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            df.count()
            samples.append(round(time.perf_counter() - t0, 3))
        warm = sorted(samples[1:])[len(samples[1:]) // 2] if len(samples) > 1 else samples[0]
        print(f"{name}: runs={samples} warm_median={warm}")
    spark.stop()


if __name__ == "__main__":
    main()
