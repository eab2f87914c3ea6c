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


def _lg_q20(x: int) -> tuple[int, int]:
    """Fixed-point log2 of a positive int: (integer part, 20-bit frac)
    via iterated squaring — the Python mirror of the engine's shared
    mantissa chain."""
    il = x.bit_length() - 1
    m = x >> (il - 30) if il >= 30 else x << (30 - il)
    frac = 0
    for _ in range(PSI_FRAC_BITS):
        m = (m * m) // _PSI_MSCALE
        bit = 1 if m >= 2 * _PSI_MSCALE else 0
        frac = frac * 2 + bit
        if bit:
            m //= 2
    return il, frac


def _red(x: int, bits: int) -> tuple[int, int]:
    s = max(x.bit_length() - bits, 0)
    return x >> s, s


def _lnr_nano(ca: int, cb: int, d1: int, d2: int) -> int:
    """Reference Python mirror of q_drift_psi's log path: |ln of the
    odds ratio (ca/d1)/(cb/d2)| at the nano scale, every factor
    independently bit-reduced below 2^31 with the shifts folded into
    the exponent — must agree with the SQL/Spark chain bit-for-bit and
    with math.log to ~2^-PSI_FRAC_BITS."""
    car, sa = _red(ca, 31)
    cbr, sb = _red(cb, 31)
    d1r, s1 = _red(d1, 31)
    d2r, s2 = _red(d2, 31)
    numv, denv = car * d2r, cbr * d1r
    eadj = (sa + s2) - (sb + s1)
    iln, fn = _lg_q20(numv)
    ild, fd = _lg_q20(denv)
    return (
        abs((iln - ild + eadj) * (1 << PSI_FRAC_BITS) + fn - fd)
        * LN2_NANO
        // (1 << PSI_FRAC_BITS)
    )


def _ppm(c: int, d: int) -> int:
    """Mirror of the share path: (c/d) in ppm with the common
    denominator-derived reduction."""
    s = max(d.bit_length() - 42, 0)
    return ((c >> s) * 1_000_000) // (d >> s)


def test_ln2_nano_is_floor_of_ln2():
    assert LN2_NANO == math.floor(math.log(2) * 1e9)


def test_integer_log_tracks_math_log():
    """Over odds ratios spanning 2^-40..2^40, the fixed-point log is
    within ~2^-19 absolute of libm — and NEVER negative (the engine
    emits |ln|)."""
    cases = [
        (1, 1, 1, 1),
        (2, 1, 3, 2),  # (2/3)/(1/2)
        (1000, 999, 10**6, 10**6),
        (10**6 + 1, 10**6, 7, 7),
        (7**13, 3**11, 10**9, 10**9 + 7),
        ((1 << 41) + 12345, 7, 997, 65537),
        (1, 999_999_937, 2, 3),  # ratio far below 1 → |ln| large
    ]
    for ca, cb, d1, d2 in cases:
        got = _lnr_nano(ca, cb, d1, d2) / 1e9
        want = abs(math.log((ca / d1) / (cb / d2)))
        assert got >= 0
        assert abs(got - want) <= want * 3e-6 + 4e-6, (ca, cb, d1, d2, got, want)


def test_integer_log_overflow_free_at_any_magnitude():
    """The per-factor bit-reduction keeps every intermediate < 2^63
    even for operands near the int64 ceiling AND at extreme skew (the
    whole point of engineering the headroom instead of documenting a
    bound: each factor reduces INDEPENDENTLY to ≥ 30 significant bits,
    shifts folded into the exponent, so the error stays the log's own
    2^-20 quantization at any magnitude combination)."""
    big = 2**62 + 3
    for ca, cb, d1, d2 in [
        (big, 2**31 - 1, big - 981, 5),  # near-ceiling everywhere
        (big, 3, 7, big - 55),  # maximal skew both directions
        (1, big, big, 1),  # minimal/maximal cross
    ]:
        got = _lnr_nano(ca, cb, d1, d2) / 1e9
        want = abs(math.log((ca / d1) / (cb / d2)))
        assert got >= 0
        assert abs(got - want) <= want * 3e-6 + 4e-6, (ca, cb, d1, d2, got, want)


def test_share_diff_no_scale_mixing_at_2_31_boundary():
    """Regression pin for the review catch: with one sample total past
    2^31 while band counts are below it, the old common-shift
    cross-product formula inflated |pa-pe| by 2^(st-sc). The v3 share
    path computes each share's ppm against its OWN denominator, so the
    reviewer's scenario now lands within 1 ppm of the true value."""
    na, nb, n1, n2, bcnt = 10**8, 2 * 10**8, 3 * 10**9, 3 * 10**9, 85
    ca, cb, d1, d2 = na + 1, nb + 1, n1 + bcnt, n2 + bcnt
    got = abs(_ppm(ca, d1) - _ppm(cb, d2))
    want = abs(ca / d1 - cb / d2) * 1e6
    assert abs(got - want) <= 2, (got, want)
    # and the log path at the same magnitudes stays tight (the old
    # clamp understated the most-drifted bands by up to sc·ln2)
    lg = _lnr_nano(ca, cb, d1, d2) / 1e9
    assert abs(lg - abs(math.log((ca / d1) / (cb / d2)))) <= 1e-5


def test_share_ppm_resolution_no_clamp():
    """A count whose share is genuinely below ppm resolution reduces
    to ppm 0 — not to a clamped inflated floor (the v2 design rounded
    a near-empty band up to 2^sc once the opposite total crossed
    2^31)."""
    assert _ppm(1, 2**50) == 0  # true share ~ 8.9e-16 → 0 ppm, correct
    assert _ppm(2**49, 2**50) == 500_000  # exact half survives reduction


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


def test_kmeans_empty_cluster_drops_out_both_engines(spark, tmp_path):
    """The untested branch real testdata never hits: a cluster whose
    members all tie-break away empties, and BOTH engines must drop it
    identically (Spark: the driver dict simply lacks the cid, matching
    the oracle's inner-join semantics). Fixture: vec 1 is an exact
    duplicate of vec 0, so seeds c0 == c1 and EVERY vector's distance
    to c0 equals its distance to c1 — the (dist, cid) tie-break sends
    them all to cid 0 and cluster 1 is empty from round 1."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from facebook_ad_library_data_pipeline_spark.registry import load_all

    from .oracle_harness import assert_matches_oracle

    base = [0.1] * KM_DIM
    vecs = [
        (0, base, 0),
        (1, list(base), 0),  # exact duplicate of vec 0 → c1 == c0
        (2, [0.3] * KM_DIM, 1),
        (3, [-0.2] * KM_DIM, 1),
        (4, [0.11] * KM_DIM, 0),
        (5, [0.29] * KM_DIM, 1),
        (6, [-0.19] * KM_DIM, 1),
        (7, [0.32] * KM_DIM, 1),
    ]
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
                "embedding": pa.array(
                    [v[1] for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([v[2] for v in vecs], pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    q = load_all()["q_kmeans_lloyd"]
    df = q.fn(spark, d)
    rows = df.collect()
    clusters = sorted({r.cluster_id for r in rows})
    assert clusters == [0, 2, 3], clusters  # cluster 1 emptied and dropped
    assert len(rows) == 3 * KM_DIM
    # membership: 0,1,4 → c0; 2,5,7 → c2; 3,6 → c3
    sizes = {r.cluster_id: r.n_members for r in rows}
    assert sizes == {0: 3, 2: 3, 3: 2}, sizes
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    assert_matches_oracle(df, q.oracle, con)


def test_label_agreement_empty_corpus_parity(spark, tmp_path):
    """An EMPTY documents table must produce the same degenerate row in
    both engines — (0, 0, NULL, 0, 0, 0, NULL) — instead of misfiring
    the N² overflow guard on NULL sums (the q_drift_ks lesson, caught
    again by review on this query's first version)."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from facebook_ad_library_data_pipeline_spark.registry import load_all

    from .oracle_harness import assert_matches_oracle

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    q = load_all()["q_label_agreement"]
    df = q.fn(spark, d)
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_items, r.n_agree, r.po, r.pe_num, r.kappa) == (0, 0, None, 0, None)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    assert_matches_oracle(df, q.oracle, con)


def test_drift_ks_one_empty_sample_parity(spark, tmp_path):
    """Events with VIEW rows but zero PURCHASE rows: n1·n2 = 0, so
    ks_stat must be NULL in BOTH engines (Spark 4 ANSI errors on the
    raw division where DuckDB NULLs — the kappa lesson applied to the
    KS family) while ks_num/ks_denom stay exact integers."""
    import os
    from datetime import datetime

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from facebook_ad_library_data_pipeline_spark.registry import load_all

    from .oracle_harness import assert_matches_oracle

    rows = [
        (1, datetime(2024, 1, 1, 0, 0, i), 1, "view", 1.0 + i, "{}")
        for i in range(5)
    ]
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    q = load_all()["q_drift_ks"]
    df = q.fn(spark, d)
    out = df.collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n1, r.n2, r.ks_denom, r.ks_stat) == (0, 5, 0, None)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet')"
    )
    assert_matches_oracle(df, q.oracle, con)


def test_int64_product_guard_fires_and_passes(spark):
    """The shared overflow guard (functions/guards.py) — now the ONE
    definition behind BOTH q_drift_ks' n1·n2 bound and
    q_label_agreement's N² bound — must actually raise past the int64
    product ceiling, pass exactly AT the ceiling, and treat a zero
    factor as unbounded (r14 verdict item 5: prove the raise fires;
    r14 ADVICE: no short-circuit reliance)."""
    from facebook_ad_library_data_pipeline_spark.functions.guards import (
        guard_product_int64,
    )

    # 3.1e9 · 3.1e9 ≈ 9.6e18 > 2^63-1 ≈ 9.22e18 → the raise must fire
    # (this is the q_label_agreement 1-row-total shape: a == b == N).
    hot = spark.createDataFrame(
        [(3_100_000_000, 3_100_000_000)], "n1 long, n2 long"
    ).select(guard_product_int64("n2", "n1", "n2", "guard-fired"))
    with pytest.raises(Exception, match="guard-fired"):
        hot.collect()

    # Exactly at the bound: a = MAX div b → passes and keeps `keep`.
    b = 3_000_000_000
    a = (2**63 - 1) // b
    ok = spark.createDataFrame([(a, b)], "n1 long, n2 long").select(
        guard_product_int64("n2", "n1", "n2", "guard-fired")
    )
    assert ok.collect()[0].n2 == b
    # ...and one past the bound fires.
    over = spark.createDataFrame([(a + 1, b)], "n1 long, n2 long").select(
        guard_product_int64("n2", "n1", "n2", "guard-fired")
    )
    with pytest.raises(Exception, match="guard-fired"):
        over.collect()

    # Zero factor: product is 0, any co-factor passes (greatest(b,1)
    # makes the bound MAX_INT64 — no boolean short-circuit involved).
    z = spark.createDataFrame([(2**62, 0)], "n1 long, n2 long").select(
        guard_product_int64("n2", "n1", "n2", "guard-fired")
    )
    assert z.collect()[0].n2 == 0


def test_lang_detector_null_text_pinned_undetected(spark, tmp_path):
    """NULL text must detect as 'undetected' in BOTH engines: without
    the score coalesce the Spark when-chain (no .otherwise) emits NULL
    while the SQL twin's ELSE arm emits the last language (r14 ADVICE;
    shared by q_lang_id and q_label_agreement the day the data admits
    NULL text)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from facebook_ad_library_data_pipeline_spark.registry import load_all

    from .oracle_harness import assert_matches_oracle

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["the cat and the hat", None, ""], pa.string()),
                "lang": pa.array(["en", "en", "fr"], pa.string()),
                "source": pa.array(["a", "a", "a"], pa.string()),
                "n_chars": pa.array([19, 0, 0], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    reg = load_all()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    q = reg["q_lang_id"]
    df = q.fn(spark, d)
    got = {r.doc_id: (r.detected_lang, r.lang_score) for r in df.collect()}
    assert got[1] == ("en", 2)  # distinct overlap {the, and}
    assert got[2] == ("undetected", 0)  # NULL text
    assert_matches_oracle(df, q.oracle, con)
    # The kappa query shares the detector — it must also agree.
    qk = reg["q_label_agreement"]
    assert_matches_oracle(qk.fn(spark, d), qk.oracle, con)


def _write_embeddings(d, vecs):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
                "embedding": pa.array(
                    [v[1] for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * len(vecs), pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )


def test_power_iteration_rank1_recovers_direction(spark, tmp_path):
    """A rank-1 corpus (every vector a scalar multiple of one base
    pattern) has Gram = c·bbᵀ, whose ONLY nonzero eigendirection is b —
    the iterate must align with b already after round 1, the sign must
    follow the all-ones start (G is PSD: no oscillation), and the whole
    pipeline must hash-match the unrolled-CTE oracle. Also pins the
    ∞-norm contract: max |v_q| == POW_VSCALE exactly."""
    import duckdb
    import numpy as np

    from facebook_ad_library_data_pipeline_spark.functions.embedstats import (
        EMBED_DIM,
        POW_VSCALE,
    )
    from facebook_ad_library_data_pipeline_spark.registry import load_all

    from .oracle_harness import assert_matches_oracle

    rng = [((i * 37 + 11) % 97 - 48) / 97.0 for i in range(EMBED_DIM)]
    vecs = [
        (0, [x * 0.5 for x in rng]),
        (1, [x * -1.0 for x in rng]),
        (2, [x * 0.25 for x in rng]),
    ]
    d = str(tmp_path)
    _write_embeddings(d, vecs)
    q = load_all()["q_gram_power_iter"]
    df = q.fn(spark, d)
    rows = df.collect()
    assert len(rows) == EMBED_DIM
    v = np.array([r.v_q for r in sorted(rows, key=lambda r: r.dim)], float)
    b = np.array(rng)
    cos = abs(v @ b) / (np.linalg.norm(v) * np.linalg.norm(b))
    assert cos > 0.999, cos
    assert max(abs(int(r.v_q)) for r in rows) == POW_VSCALE
    # PSD + all-ones start: the iterate points WITH b or -b depending
    # on sign(1ᵀb) — deterministic, so just assert consistency with it.
    assert np.sign(v @ b) == np.sign(b.sum())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    assert_matches_oracle(df, q.oracle, con)


def test_power_iteration_matches_numpy_eigvector(spark, tmp_path):
    """Against a SPECTRALLY GAPPED fixture (one dominant direction +
    small perturbations), the integer iterate must align
    (cosine > 0.999) with numpy's top eigenvector of the SAME quantized
    integer Gram, and λ_est must land within 1% — the operator is a
    real spectral method, not just a deterministic arithmetic ritual.
    (The gap matters: power iteration converges at (λ2/λ1)^t, so a
    near-isotropic corpus — like the synthetic testdata, λ2/λ1 ≈ 0.93 —
    yields a top-EIGENSPACE vector after 8 rounds, documented in the
    operator docstring; the fixture here has λ2/λ1 ≪ 1 so 8 rounds pin
    the eigenVECTOR.)"""
    import numpy as np

    from facebook_ad_library_data_pipeline_spark.functions.embedstats import (
        EMBED_DIM,
        QUANT_SCALE,
    )
    from facebook_ad_library_data_pipeline_spark.registry import load_all

    dom = [(((j * 29 + 5) % 53) - 26) / 53.0 for j in range(EMBED_DIM)]
    vecs = []
    for vid in range(5):  # five strong copies of the dominant direction
        vecs.append((vid, [x * (0.9 + 0.05 * vid) for x in dom]))
    for vid in range(5, 13):  # weak varied perturbations
        vals = [
            0.08 * ((((vid * 13 + j * 7 + 3) % 41) - 20) / 41.0)
            for j in range(EMBED_DIM)
        ]
        vecs.append((vid, vals))
    d = str(tmp_path)
    _write_embeddings(d, vecs)
    q = load_all()["q_gram_power_iter"]
    rows = q.fn(spark, d).collect()
    v = np.array([r.v_q for r in sorted(rows, key=lambda r: r.dim)], float)
    x = np.stack([np.array(vals, np.float32) for _, vals in vecs])
    qm = np.floor(x.astype(np.float64) * QUANT_SCALE)
    gram = qm.T @ qm
    evals, evecs = np.linalg.eigh(gram)
    assert evals[-2] / evals[-1] < 0.2  # the fixture IS gapped
    top = evecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.999, cos
    # λ estimate (raw quantized-Gram units) within 1% of numpy's
    lam = [r.lambda_est for r in rows][0]
    assert abs(lam - evals[-1]) / evals[-1] < 0.01, (lam, evals[-1])


def test_power_iteration_empty_corpus_parity(spark, tmp_path):
    """Empty embeddings → empty output in BOTH engines (the oracle's
    v0 CTE is non-empty by construction, but the grid join starves
    every iteration — same as Spark's empty LocalRelation)."""
    import duckdb

    from facebook_ad_library_data_pipeline_spark.registry import load_all

    from .oracle_harness import assert_matches_oracle

    d = str(tmp_path)
    _write_embeddings(d, [])
    q = load_all()["q_gram_power_iter"]
    df = q.fn(spark, d)
    assert df.count() == 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    assert_matches_oracle(df, q.oracle, con)


def test_pca_project_rank1_explains_everything(spark, tmp_path):
    """On the rank-1 corpus every vector IS a multiple of the top
    eigenvector, so the projection must explain ≈100% of each vector's
    energy (explained → 1 up to the iterate's 2^-20 quantization), the
    zero vector must pin to NULL in both engines, and the whole output
    must hash-match the shared-chain oracle."""
    import duckdb
    import numpy as np

    from facebook_ad_library_data_pipeline_spark.functions.embedstats import (
        EMBED_DIM,
    )
    from facebook_ad_library_data_pipeline_spark.registry import load_all

    from .oracle_harness import assert_matches_oracle

    rng = [((i * 37 + 11) % 97 - 48) / 97.0 for i in range(EMBED_DIM)]
    vecs = [
        (0, [x * 0.5 for x in rng]),
        (1, [x * -1.0 for x in rng]),
        (2, [x * 0.25 for x in rng]),
        (3, [0.0] * EMBED_DIM),  # zero vector → explained NULL
    ]
    d = str(tmp_path)
    _write_embeddings(d, vecs)
    q = load_all()["q_pca_project"]
    df = q.fn(spark, d)
    rows = {r.vec_id: r for r in df.collect()}
    assert len(rows) == 4
    for vid in (0, 1, 2):
        assert rows[vid].explained is not None
        assert rows[vid].explained > 0.999, (vid, rows[vid].explained)
        # cos² ≤ 1 with exact arithmetic
        assert rows[vid].explained <= 1.0 + 1e-12
    assert rows[3].explained is None and rows[3].q_norm2 == 0
    # proj sign follows the vector's orientation against the iterate
    assert np.sign(rows[0].proj_q) != np.sign(rows[1].proj_q)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    assert_matches_oracle(df, q.oracle, con)


def test_pca_project_empty_corpus_parity(spark, tmp_path):
    """Empty embeddings → empty output in BOTH engines: the vn
    aggregate produces one NULL-v_norm2 row, but the crossJoin against
    an empty projection side starves it — pinned so a future edit to
    the vn/crossJoin tail (a row-preserving join, a coalesce on
    v_norm2) can't silently break degenerate-corpus parity."""
    import duckdb

    from facebook_ad_library_data_pipeline_spark.registry import load_all

    from .oracle_harness import assert_matches_oracle

    d = str(tmp_path)
    _write_embeddings(d, [])
    q = load_all()["q_pca_project"]
    df = q.fn(spark, d)
    assert df.count() == 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    assert_matches_oracle(df, q.oracle, con)


def test_pca_deflate_matches_numpy_second_component(spark, tmp_path):
    """Against a TWO-direction gapped fixture (strong direction b1,
    weaker orthogonal direction b2, tiny noise floor: λ1 ≫ λ2 ≫ λ3),
    the deflated iterate must align with numpy's SECOND eigenvector of
    the same quantized Gram, λ2/λ1 must land within 5% (the deflation
    scale A keeps 10 bits, so ~2e-3 relative error enters G2), the
    v1·v2 dot must be near-orthogonal, and the output must hash-match
    the unrolled deflation oracle."""
    import duckdb
    import numpy as np

    from facebook_ad_library_data_pipeline_spark.functions.embedstats import (
        EMBED_DIM,
        QUANT_SCALE,
    )
    from facebook_ad_library_data_pipeline_spark.registry import load_all

    from .oracle_harness import assert_matches_oracle

    b1 = np.array(
        [(((j * 29 + 5) % 53) - 26) / 53.0 for j in range(EMBED_DIM)]
    )
    b2 = np.array(
        [(((j * 17 + 9) % 47) - 23) / 47.0 for j in range(EMBED_DIM)]
    )
    b2 -= (b2 @ b1) / (b1 @ b1) * b1  # orthogonalize
    vecs = []
    for vid in range(5):
        vecs.append((vid, [float(x) * (0.9 + 0.05 * vid) for x in b1]))
    for vid in range(5, 9):
        vecs.append((vid, [float(x) * 0.5 for x in b2]))
    for vid in range(9, 15):  # noise floor
        vals = [
            0.03 * ((((vid * 13 + j * 7 + 3) % 41) - 20) / 41.0)
            for j in range(EMBED_DIM)
        ]
        vecs.append((vid, vals))
    d = str(tmp_path)
    _write_embeddings(d, vecs)
    q = load_all()["q_pca_deflate"]
    df = q.fn(spark, d)
    rows = df.collect()
    assert len(rows) == EMBED_DIM
    srt = sorted(rows, key=lambda r: r.dim)
    v1 = np.array([r.v1_q for r in srt], float)
    v2 = np.array([r.v2_q for r in srt], float)
    x = np.stack(
        [np.array(vals, np.float32) for _, vals in vecs]
    )
    qm = np.floor(x.astype(np.float64) * QUANT_SCALE)
    gram = qm.T @ qm
    evals, evecs = np.linalg.eigh(gram)
    assert evals[-2] / evals[-1] < 0.5  # gapped 1-2
    assert evals[-3] / evals[-2] < 0.2  # gapped 2-3
    cos1 = abs(v1 @ evecs[:, -1]) / (
        np.linalg.norm(v1) * np.linalg.norm(evecs[:, -1])
    )
    cos2 = abs(v2 @ evecs[:, -2]) / (
        np.linalg.norm(v2) * np.linalg.norm(evecs[:, -2])
    )
    assert cos1 > 0.999, cos1
    assert cos2 > 0.99, cos2
    # near-orthogonality of the two iterates
    orth = abs(rows[0].dot12) / (np.linalg.norm(v1) * np.linalg.norm(v2))
    assert orth < 0.05, orth
    ratio = rows[0].lambda21_ratio
    true_ratio = evals[-2] / evals[-1]
    assert abs(ratio - true_ratio) / true_ratio < 0.05, (ratio, true_ratio)
    # explained-variance split: ev ≈ λ/trace
    tr = np.trace(gram)
    assert abs(rows[0].ev1 - evals[-1] / tr) / (evals[-1] / tr) < 0.05
    assert abs(rows[0].ev2 - evals[-2] / tr) / (evals[-2] / tr) < 0.10
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    assert_matches_oracle(df, q.oracle, con)


def test_pca_deflate_rank1_annihilates(spark, tmp_path):
    """On a rank-1 corpus the deflation must remove (numerically) all
    the energy there is: λ2/λ1 collapses to ≈0 and ev2 ≈ 0, while
    chain 1 still recovers the base direction."""
    import numpy as np

    from facebook_ad_library_data_pipeline_spark.functions.embedstats import (
        EMBED_DIM,
    )
    from facebook_ad_library_data_pipeline_spark.registry import load_all

    rng = [((i * 37 + 11) % 97 - 48) / 97.0 for i in range(EMBED_DIM)]
    vecs = [
        (0, [x * 0.5 for x in rng]),
        (1, [x * -1.0 for x in rng]),
        (2, [x * 0.25 for x in rng]),
    ]
    d = str(tmp_path)
    _write_embeddings(d, vecs)
    rows = load_all()["q_pca_deflate"].fn(spark, d).collect()
    assert len(rows) == EMBED_DIM
    r0 = rows[0]
    assert r0.lambda21_ratio is not None and r0.lambda21_ratio < 0.01, r0
    assert r0.ev2 is not None and r0.ev2 < 0.01 * r0.ev1, r0
    v1 = np.array(
        [r.v1_q for r in sorted(rows, key=lambda r: r.dim)], float
    )
    b = np.array(rng)
    cos = abs(v1 @ b) / (np.linalg.norm(v1) * np.linalg.norm(b))
    assert cos > 0.999, cos


def test_pca_deflate_empty_corpus_parity(spark, tmp_path):
    """Empty embeddings → empty output in BOTH engines (every chain
    starves; the scale CTEs degrade to 0 via the coalesce pins)."""
    import duckdb

    from facebook_ad_library_data_pipeline_spark.registry import load_all

    from .oracle_harness import assert_matches_oracle

    d = str(tmp_path)
    _write_embeddings(d, [])
    q = load_all()["q_pca_deflate"]
    df = q.fn(spark, d)
    assert df.count() == 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    assert_matches_oracle(df, q.oracle, con)


def test_embedstats_driver_mirrors_match_sql(spark):
    """r16 optimization: the power/deflation chains moved from
    unrolled Spark plans to driver-side Python ints. The two
    primitives the mirror rests on must equal their SQL twins on
    every sign/magnitude class the chains can produce:
    _tdiv == Spark `div` (trunc toward zero, negative dividends
    included) and _bitlen1 == length(bin(m)) for m >= 0 (bin(0) is
    the 1-char string '0', NOT bit_length's 0 — the m=0 edge decides
    the shift in every renormalization step)."""
    from facebook_ad_library_data_pipeline_spark.functions.embedstats import (
        _bitlen1,
        _tdiv,
    )

    cases = [
        (7, 2), (-7, 2), (0, 5), (-1, 3), (1, 4),
        (-(2**45) - 3, 1 << 10), (2**45 + 3, 1 << 10), (-5, 1),
    ]
    vals = ", ".join(
        f"({a}, CAST({b} AS BIGINT), {_tdiv(a, b)})" for a, b in cases
    )
    rows = spark.sql(
        f"SELECT a div b = e FROM VALUES {vals} t(a, b, e)"
    ).collect()
    assert all(r[0] for r in rows), rows

    ms = [0, 1, 2, 3, 2**20, 2**42 - 1, 2**42, 2**61]
    mvals = ", ".join(f"(CAST({m} AS BIGINT), {_bitlen1(m)})" for m in ms)
    rows = spark.sql(
        f"SELECT length(bin(m)) = e FROM VALUES {mvals} t(m, e)"
    ).collect()
    assert all(r[0] for r in rows), rows


def test_power_iterate_driver_matches_unrolled_sql_chain(spark):
    """The driver-side power_iterate must replay the oracle's unrolled
    renormalization chain bit-for-bit on an adversarial small grid
    (mixed-sign entries, magnitudes that force a nonzero m-shift in
    the step). Runs the SAME reduced grid through DuckDB's w/n/v CTE
    round and compares every iterate column."""
    import duckdb

    from facebook_ad_library_data_pipeline_spark.functions.embedstats import (
        EMBED_DIM,
        POW_ITERS,
        POW_VSCALE,
        _pow_step_sql,
        power_iterate,
    )

    # symmetric mixed-sign grid with entries near the 2^31 reduce bound
    G = [
        [((i * 31 + j * 17 + i * j) % (1 << 31)) - (1 << 30) for j in range(EMBED_DIM)]
        for i in range(EMBED_DIM)
    ]
    for i in range(EMBED_DIM):
        for j in range(i):
            G[i][j] = G[j][i]
    rows = power_iterate(G, 0)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE g AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i + 1}, {j + 1}, CAST({G[i][j]} AS BIGINT), 0)"
            for i in range(EMBED_DIM)
            for j in range(EMBED_DIM)
        )
        + ") t(i, j, g, s)"
    )
    one = "CAST(1 AS BIGINT)"
    step = _pow_step_sql("//", one)
    ctes = [
        f"v0 AS (SELECT CAST(dim AS INT) AS dim, CAST({POW_VSCALE} AS BIGINT) AS v "
        f"FROM range(1, {EMBED_DIM + 1}) r(dim))"
    ]
    for t in range(1, POW_ITERS + 1):
        ctes.append(
            f"w{t} AS (SELECT g.i AS dim, g.s AS s, CAST(sum(g.g * v.v) AS BIGINT) AS w "
            f"FROM g JOIN v{t - 1} v ON g.j = v.dim GROUP BY 1, 2),\n"
            f"n{t} AS (SELECT dim, s, w, max(abs(w)) OVER () AS m FROM w{t}),\n"
            f"v{t} AS (SELECT dim, s, m, CAST({step} AS BIGINT) AS v FROM n{t})"
        )
    sql_rows = con.execute(
        "WITH " + ",\n".join(ctes) + f" SELECT dim, s, m, v FROM v{POW_ITERS} ORDER BY dim"
    ).fetchall()
    assert [tuple(r) for r in sql_rows] == sorted(rows), (sql_rows[:3], rows[:3])
