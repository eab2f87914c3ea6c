"""Scale evidence for the round-16 additions (SCALE_EVIDENCE.md
generator, same protocol as drift_scale_evidence.py): per-query wall
seconds and total shuffle-write RECORDS at sf0.01 and sf0.1 (10x the
rows), measured from the AppStatusStore REST API.

Expected shape, from the plan arguments in the docstrings:
- q_pca_deflate: the ONLY data-sized stage is the shared Gram partial
  fold (one corpus scan; partitions x ~2080 triangle rows — constant
  once the partition count saturates); the deflation and BOTH
  unrolled iterations run over <= 64^2-row LocalRelations, so their
  shuffle contribution is near-zero at any corpus size.
- q_quantile_sketch: MEASURED CONSTANT shuffle (1,286 records at both
  scales) — better than the naive keyed-feed expectation, because
  Spark inserts a PARTIAL WindowGroupLimit before the exchange: each
  map task keeps only its local bottom-K per group (exactly the
  union-truncate mergeability of the sketch), so the exchange carries
  at most partitions x groups x K rows whatever the corpus size; the
  audit pass is a broadcast join + map-side-combined count whose
  exchange is partition-partial-bounded too.
- q_kmv_distinct: the distinct pre-aggregation is map-side combined,
  so the (event_type, key) exchange carries distinct keys per
  partition (sub-linear under duplication); the event_type exchange
  then carries the global distinct keys — the audit-time cost of the
  in-query exact twin (the production path filters rank <= K before
  the exchange and gets the same partial WindowGroupLimit bound as
  the quantile sketch).

Usage: python scripts/r16_scale_evidence.py
Prints the markdown table for SCALE_EVIDENCE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from facebook_ad_library_data_pipeline_spark.registry import load_all
from facebook_ad_library_data_pipeline_spark.session import get_spark

QUERIES = ("q_pca_deflate", "q_quantile_sketch", "q_kmv_distinct")
SF_DIRS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


from _evidence_lib import shuffle_write_records  # noqa: E402


def main() -> None:
    os.environ["SPARK_GRAFT_UI"] = "true"
    spark = get_spark("r16_scale_evidence")
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
