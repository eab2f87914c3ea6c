"""Unit pins for the perceptual-fingerprint dedup pair (image aHash /
audio envelope hash): robustness of a perturbed variant, sensitivity to
genuinely different content, and the codec round-trip being the thing
hashed (not the synthesized array).
"""

from __future__ import annotations

import numpy as np

from facebook_ad_library_data_pipeline_spark.multimodal.bmp import (
    decode_bmp24,
    encode_bmp24,
)
from facebook_ad_library_data_pipeline_spark.multimodal.phash import (
    AH_KEYS,
    AU_KEYS,
    synth_ahash_pixels,
    synth_audio_samples,
)
from facebook_ad_library_data_pipeline_spark.multimodal.wav import (
    decode_wav_pcm16,
    encode_wav_pcm16,
)


def _ahash(img: np.ndarray) -> tuple[int, int]:
    g3 = img.astype(np.int64).sum(axis=2)
    bsum = g3.reshape(8, 4, 8, 4).sum(axis=(1, 3)).reshape(-1)
    bits = (bsum * 64 > int(g3.sum())).astype(np.int64)
    return int((bits[32:] << np.arange(32)).sum()), int(
        (bits[:32] << np.arange(32)).sum()
    )


def test_ahash_robust_to_perturbation_sensitive_to_content():
    base = synth_ahash_pixels(7)  # key 7, unperturbed
    variant = synth_ahash_pixels(7 + AH_KEYS)  # key 7, perturbed
    other = synth_ahash_pixels(8)  # different content
    assert not np.array_equal(base, variant)  # bytes DO differ
    assert _ahash(base) == _ahash(variant)  # ...but the hash agrees
    assert _ahash(base) != _ahash(other)


def test_ahash_survives_bmp_roundtrip():
    px = synth_ahash_pixels(3)
    assert np.array_equal(decode_bmp24(encode_bmp24(px)), px)


def test_audio_envelope_robust_and_roundtrip():
    base = synth_audio_samples(5)
    variant = synth_audio_samples(5 + AU_KEYS)
    assert not np.array_equal(base, variant)

    def ehash(s):
        a = s.astype(np.int64)
        e = (np.abs(a[:, 0]) + np.abs(a[:, 1])).reshape(16, -1).sum(axis=1)
        bits = (e * 16 > int(e.sum())).astype(np.int64)
        return int((bits << np.arange(16)).sum())

    assert ehash(base) == ehash(variant)
    decoded, rate = decode_wav_pcm16(encode_wav_pcm16(base))
    assert np.array_equal(decoded, base) and rate == 8000
