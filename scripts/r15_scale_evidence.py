"""Scale evidence for the round-15 additions (SCALE_EVIDENCE.md
generator, same protocol as drift_scale_evidence.py): per-query wall
seconds and total shuffle-write RECORDS at sf0.01 and sf0.1 (10x the
rows), measured from the AppStatusStore REST API.

Expected shape, from the plan arguments in the docstrings:
- q_gram_power_iter: the ONLY data-sized stage is the Gram partial
  fold (mapInPandas emits <= one d*(d+1)/2 triangle per partition, so
  shuffle records ~ partitions x 2080 — constant once the partition
  count saturates); the 8 matvec/renormalize iterations run over a
  4096-row LocalRelation (driver-collected triangle), contributing
  near-zero shuffle whatever the corpus size.
- q_stream_tws_reservoir: state is <= K rows per user by construction
  (the bottom-k truncation), so sink rows and state size scale with
  KEYS, never with events-per-key; shuffle grows with rows only in the
  per-micro-batch groupBy feed (the unavoidable keyed exchange every
  stateful operator pays).

Usage: python scripts/r15_scale_evidence.py
Prints the markdown table for SCALE_EVIDENCE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from facebook_ad_library_data_pipeline_spark.registry import load_all
from facebook_ad_library_data_pipeline_spark.session import get_spark

QUERIES = ("q_gram_power_iter", "q_stream_tws_reservoir")
SF_DIRS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


from _evidence_lib import shuffle_write_records  # noqa: E402


def main() -> None:
    os.environ["SPARK_GRAFT_UI"] = "true"
    spark = get_spark("r15_scale_evidence")
    spark.range(1000).selectExpr("sum(id)").collect()
    reg = load_all()
    rows = []
    for name in QUERIES:
        cells = [name]
        for sf_dir in SF_DIRS:
            before_rec = shuffle_write_records(spark)
            t0 = time.monotonic()
            n = reg[name].fn(spark, sf_dir).count()
            wall = time.monotonic() - t0
            rec = shuffle_write_records(spark) - before_rec
            cells.append(f"{wall:.2f} s / {rec:,} rec / {n} rows")
        rows.append(cells)
    print("| query | sf0.01 (wall / shuffle records / out rows) | sf0.1 (10x rows) |")
    print("|---|---|---|")
    for cells in rows:
        print(f"| {cells[0]} | {cells[1]} | {cells[2]} |")


if __name__ == "__main__":
    main()
