"""Time DataFrame CONSTRUCTION (q.fn + one explain round-trip) per
query, without executing the plan — surfaces driver-side plan-build
overhead (py4j chatter from large Column trees, oracle/grid prep),
which execution timing hides inside the first run.

Usage:
    python scripts/build_time.py [only_names...]

Streaming/state queries are skipped by default (their fn RUNS the
stream as a side effect, so "build time" is not separable).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from facebook_ad_library_data_pipeline_spark.registry import load_all
from facebook_ad_library_data_pipeline_spark.session import get_spark


def main() -> None:
    only = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("build_time")
    registry = load_all()
    spark.range(1000).selectExpr("sum(id)").collect()
    rows = []
    for name, q in sorted(registry.items()):
        if only and name not in only:
            continue
        if not only and name.startswith(("q_stream_", "q_state_", "q_python_datas")):
            continue
        t0 = time.perf_counter()
        try:
            df = q.fn(spark, sf_dir)
            build = time.perf_counter() - t0
            t1 = time.perf_counter()
            df._jdf.queryExecution().analyzed()
            analyze = time.perf_counter() - t1
        except Exception as e:
            print(f"{name}: ERROR {e}")
            continue
        rows.append((build + analyze, build, analyze, name))
    rows.sort(reverse=True)
    for tot, build, analyze, name in rows:
        print(f"{tot:7.3f}  build={build:6.3f} analyze={analyze:6.3f}  {name}")
    spark.stop()


if __name__ == "__main__":
    main()
