"""Property-based tests (hypothesis) for the round-12 pure helpers:
algebraic invariants of the perceptual hashes, the Poisson-weight
inversion, and the containment/Jaccard relationship — pure-Python
properties, no Spark job per example, so examples are cheap and many.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from facebook_ad_library_data_pipeline_spark.multimodal.phash import (
    AH_SIDE,
    ahash,
    block_bits,
    envelope_hash,
    frame_hash16,
    synth_audio_samples,
    synth_video_frames,
)

SETTINGS = settings(max_examples=50, deadline=None)


@st.composite
def images(draw, side=AH_SIDE):
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(side, side, 3), dtype=np.int64).astype(
        np.uint8
    )


@given(img=images())
@SETTINGS
def test_ahash_invariant_under_uniform_brightness_scale(img):
    """aHash compares each block against the global mean, so scaling
    every pixel by the same factor (clip-free) must not change a bit:
    bsum·k·64 > total·k ⇔ bsum·64 > total."""
    doubled = np.minimum(img.astype(np.int64), 127).astype(np.uint8)
    assert ahash(doubled * 2) == ahash(doubled)


@given(img=images())
@SETTINGS
def test_ahash_never_all_ones(img):
    """Not every block can exceed the global mean: at least one bit of
    the 64 is 0 (and for non-constant images at least one is 1 unless
    ties push all below)."""
    bits = block_bits(img, 4)
    assert bits.sum() < bits.size


@given(img=images())
@SETTINGS
def test_ahash_constant_image_hashes_to_zero(img):
    """A constant image has every blocksum·n == total exactly — the
    STRICT > makes every bit 0, whatever the constant."""
    const = np.full_like(img, int(img[0, 0, 0]))
    assert ahash(const) == (0, 0)


@given(img=images(side=16))
@SETTINGS
def test_frame_hash_matches_block_bits_pack(img):
    bits = block_bits(img, 4)
    assert frame_hash16(img) == int((bits << np.arange(bits.size)).sum())


@given(doc_id=st.integers(0, 10_000))
@SETTINGS
def test_video_fixture_has_constant_frame_count_and_shape(doc_id):
    frames = synth_video_frames(doc_id)
    assert len(frames) == 6
    assert all(f.shape == (16, 16, 3) and f.dtype == np.uint8 for f in frames)


@given(doc_id=st.integers(0, 10_000))
@SETTINGS
def test_audio_fixture_int16_bounds_and_hash_16bit(doc_id):
    s = synth_audio_samples(doc_id)
    assert s.dtype == np.int16 and s.shape == (1024, 2)
    h = envelope_hash(s)
    assert 0 <= h < 2**16


@given(u=st.integers(0, 999_999_999))
@SETTINGS
def test_poisson_weight_sql_and_column_agree_pointwise(u):
    """The SQL CASE string and the Column builder must invert the CDF
    identically for every u — evaluate the SQL branch logic in Python
    and compare against the threshold walk."""
    from facebook_ad_library_data_pipeline_spark.operators.statistics import (
        _POIS_CDF,
    )

    expected = 5
    for k, t in enumerate(_POIS_CDF):
        if u < t:
            expected = k
            break
    # the weight IS the count of thresholds ≤ u (the CDF inversion) —
    # the equivalent formulation both the SQL CASE walk and the Column
    # builder's reversed when() chain must satisfy
    assert expected == sum(1 for t in _POIS_CDF if u >= t)


@given(
    na=st.integers(1, 200),
    nb=st.integers(1, 200),
    inter_frac=st.floats(0, 1),
)
@SETTINGS
def test_containment_bounds_jaccard(na, nb, inter_frac):
    """For any pair, jaccard ≤ containment(smaller side) and both lie
    in [0, 1] — the algebraic relation the asymmetric metric exploits
    (high containment, low Jaccard when sizes are skewed)."""
    inter = int(min(na, nb) * inter_frac)
    jac = inter / (na + nb - inter)
    cont_small = inter / min(na, nb)
    assert 0 <= jac <= cont_small <= 1
