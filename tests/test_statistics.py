"""Unit pins for the monitoring-statistics module: the Poisson weight
inversion's pinned thresholds, and the MAD gate's boundary exactness.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.operators.statistics import (
    _B,
    _POIS_CDF,
    _poisson_weight,
)


def test_poisson_cdf_constants_match_closed_form():
    """The pinned thresholds are ⌊1e9·P(X≤k)⌋ for Poisson(1) — recompute
    from e and factorials so a typo'd constant fails loudly."""
    acc = 0.0
    for k, pinned in enumerate(_POIS_CDF):
        acc += math.exp(-1) / math.factorial(k)
        assert pinned == math.floor(acc * 1e9), (k, pinned)


def test_poisson_weight_inversion_boundaries(spark):
    """u exactly AT a threshold belongs to the next weight class
    (strict <), u below the first threshold is weight 0, the tail caps
    at 5."""
    us = (
        [0, _POIS_CDF[0] - 1]
        + [t for t in _POIS_CDF]
        + [_POIS_CDF[-1] - 1, 999_999_999]
    )
    df = spark.createDataFrame([(u,) for u in us], "u long").select(
        "u", _poisson_weight(F.col("u")).alias("w")
    )
    got = {r.u: r.w for r in df.collect()}
    assert got[0] == 0 and got[_POIS_CDF[0] - 1] == 0
    for k, t in enumerate(_POIS_CDF):
        assert got[t] == (k + 1 if k + 1 < len(_POIS_CDF) else 5), (k, t)
    assert got[_POIS_CDF[-1] - 1] == 4
    assert got[999_999_999] == 5


def test_mad_midpoints_are_exact_halves(spark):
    """Even-count groups interpolate the median to k.5 — exact in
    double, so the 3·MAD comparison is deterministic."""
    df = spark.createDataFrame(
        [(c,) for c in [100, 101, 200, 300]], "cents long"
    )
    med = df.agg(F.percentile("cents", 0.5).alias("m")).collect()[0].m
    assert med == 150.5  # (101+200)/2, exactly representable
    assert med * 2 == 301.0  # no float residue


def test_replica_count_is_scale_free_constant():
    assert _B == 20


def test_rank_auc_known_values(spark):
    """Hand-checkable AUC with a tie: scores pos={3,2}, neg={2,1} →
    pairs: (3>2)=1, (3>1)=1, (2==2)=.5, (2>1)=1 → U=3.5 of 4 → .875."""
    import shutil
    import tempfile
    import uuid
    from pathlib import Path

    import pyarrow as pa
    import pyarrow.parquet as pq

    from facebook_ad_library_data_pipeline_spark.operators.statistics import (
        q_rank_auc,
    )

    d = Path(tempfile.gettempdir()) / f"auc_{uuid.uuid4().hex}"
    d.mkdir()
    try:
        tbl = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array([0, 0, 0, 0], pa.timestamp("us")),
                "user_id": pa.array([1, 1, 1, 1], pa.int64()),
                "event_type": ["purchase", "purchase", "view", "view"],
                "value": pa.array([0.03, 0.02, 0.02, 0.01], pa.float64()),
                "props": ["{}", "{}", "{}", "{}"],
            }
        )
        pq.write_table(tbl, str(d / "events.parquet"))
        row = q_rank_auc(spark, str(d)).collect()[0]
        assert (row.n_pos, row.n_neg) == (2, 2)
        assert row.u2 == 7 and row.denom == 8  # 2U=7
        assert row.auc == 0.875
    finally:
        shutil.rmtree(d, ignore_errors=True)
