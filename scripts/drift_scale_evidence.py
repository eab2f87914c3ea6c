"""Scale evidence for the round-14 drift/clustering/paths family
(SCALE_EVIDENCE.md generator): measure — not assert — which stages are
DOMAIN-bounded vs data-sized by recording per-query wall seconds and
total shuffle-write RECORDS (Spark AppStatusStore, the UI's numbers)
at sf0.01 and sf0.1 (10× the rows).

Expected shape, from the plan arguments in the docstrings:
- q_drift_ks / q_drift_psi shuffle the DISTINCT-cents / band grid —
  sublinear (grid saturates: ~3.3k→13k cents, 64→85 bands for 10× rows).
- q_kmeans_lloyd shuffles K rows × D sum columns per partition per
  round plus the seed/update collects — near-CONSTANT records.
- q_embedding_int8_quant's dim exchange carries N·D exploded rows —
  honestly data-sized (the documented trade for one-pass calibration).
- q_event_paths_topk shuffles N rows into the user window, then a
  ≤|event_types|³-row path aggregate — window data-sized, agg constant.

Usage: python scripts/drift_scale_evidence.py
Prints the markdown table for SCALE_EVIDENCE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from facebook_ad_library_data_pipeline_spark.registry import load_all
from facebook_ad_library_data_pipeline_spark.session import get_spark

QUERIES = (
    "q_drift_ks",
    "q_drift_psi",
    "q_kmeans_lloyd",
    "q_embedding_int8_quant",
    "q_event_paths_topk",
)
SF_DIRS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


from _evidence_lib import shuffle_write_records  # noqa: E402


def main() -> None:
    os.environ["SPARK_GRAFT_UI"] = "true"  # metrics come from the REST API
    spark = get_spark("drift_scale_evidence")
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
