"""Driver-twin sweep: run registered queries against their DuckDB
oracles at an arbitrary sf dir — the same compare the grading driver
runs (via tests/oracle_harness, which is STRICTER: repr floats vs the
driver's %.6g).

Usage:
    python scripts/driver_twin_sweep.py [sf_dir] [query ...]

With no query names, sweeps EVERY registered query (oracle-backed →
full value compare; oracle-less → rows-only run). With names, checks
just those (fast per-change gate before committing a query).

Prints one line per query and a final `SWEEP <sf> ok=<n> rows_only=<n>
bad=<n>` summary; exits non-zero if anything failed.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import duckdb

from facebook_ad_library_data_pipeline_spark.catalog import TABLES
from facebook_ad_library_data_pipeline_spark.registry import load_all
from facebook_ad_library_data_pipeline_spark.session import get_spark
from oracle_harness import assert_matches_oracle


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    registry = load_all()
    if names:
        missing = [n for n in names if n not in registry]
        if missing:
            print(f"unknown queries: {missing}", file=sys.stderr)
            return 2
        todo = {n: registry[n] for n in names}
    else:
        todo = registry

    spark = get_spark("driver_twin_sweep")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    ok = rows_only = bad = 0
    for name, q in todo.items():
        t0 = time.monotonic()
        try:
            df = q.fn(spark, sf_dir)
            if q.oracle:
                assert_matches_oracle(df, q.oracle, duck)
                ok += 1
                status = "MATCH"
            else:
                n = df.count()
                rows_only += 1
                status = f"ROWS_ONLY({n})"
        except Exception:
            bad += 1
            status = "FAIL"
            traceback.print_exc()
        print(f"{name}: {status} [{time.monotonic() - t0:.1f}s]", flush=True)
    print(f"SWEEP {sf_dir} ok={ok} rows_only={rows_only} bad={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
