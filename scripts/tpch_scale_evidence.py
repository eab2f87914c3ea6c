"""TPC-H relational-core scale evidence (SCALE_EVIDENCE.md §tpch
generator) — the r07-verdict cell that turns the join/agg family's
plan-level scaling claims into a measured column.

Facts (lineitem, orders) are replicated 10× with offset order keys —
the "warehouse grew 10× over time" shape: every replica order keeps
its customer/part/supplier foreign keys, so dims stay fixed (exactly
how a real star schema scales) and every join's semantics are
preserved. ~6M lineitem rows ≈ TPC-H sf1 on the fact side. Dims are
symlinked, not copied.

All 22 registered TPC-H queries run once at the base sf and once on
the replicated dir; per-query wall seconds and the growth factor are
printed as the markdown table for SCALE_EVIDENCE.md. The pass
criterion is no query super-linear beyond the 10× data growth (output
sizes differ per query — Q1's 4 groups don't grow, Q10's customer
rollup does — so wall, not rows, is the comparable).

Usage: python scripts/tpch_scale_evidence.py [sf_dir]
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

TPCH = tuple(f"q_tpch_q{i}" for i in range(1, 23))
REP = 10
# Above any natural o_orderkey at bench scales, while 9×offset still
# fits the key's int32 type (ANSI mode makes a wider literal an
# overflow error rather than a silent widen).
REP_OFFSET = 10_000_000


def replicate_facts(spark, sf_dir: str) -> str:
    """10× lineitem+orders with offset order keys; all other tables
    symlinked from the base sf-dir."""
    out = tempfile.mkdtemp(prefix="tpch_scale_")
    for table, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        df = load_table(spark, sf_dir, table)
        cols = [c for c in df.columns if c != key]
        (
            df.select(
                "*", F.explode(F.sequence(F.lit(0), F.lit(REP - 1))).alias("rep")
            )
            .select((F.col(key) + F.col("rep") * REP_OFFSET).alias(key), *cols)
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"{table}.parquet"))
        )
    for table in ("customer", "supplier", "part", "nation", "region"):
        os.symlink(
            os.path.join(sf_dir, f"{table}.parquet"),
            os.path.join(out, f"{table}.parquet"),
        )
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("tpch-scale-evidence")
    registry = load_all()
    rep_dir = replicate_facts(spark, sf_dir)
    n_li = load_table(spark, sf_dir, "lineitem").count()
    print(f"lineitem: {n_li} -> {n_li * REP} rows ({REP}x)", flush=True)

    def timed(name, d):
        t0 = time.perf_counter()
        n = registry[name].fn(spark, d).count()
        return n, time.perf_counter() - t0

    # warm both dirs once (scan caches, broadcast JIT) so the measured
    # pass compares steady-state executions, mirroring bench.py
    for name in ("q_tpch_q6",):
        timed(name, sf_dir)
        timed(name, rep_dir)

    print(f"| query | wall s ({os.path.basename(sf_dir)}) | wall s ({REP}x facts) | growth | rows base -> 10x |")
    print("|---|---|---|---|---|")
    worst = (None, 0.0)
    for name in TPCH:
        n1, t1 = timed(name, sf_dir)
        n10, t10 = timed(name, rep_dir)
        g = t10 / max(t1, 1e-9)
        if g > worst[1]:
            worst = (name, g)
        print(f"| {name} | {t1:.2f} | {t10:.2f} | {g:.1f}x | {n1} -> {n10} |", flush=True)
    print(f"\n# worst growth: {worst[0]} at {worst[1]:.1f}x for {REP}x fact rows")
    spark.stop()


if __name__ == "__main__":
    main()
