"""Unit pins for the perceptual-fingerprint dedup pair (image aHash /
audio envelope hash): robustness of a perturbed variant, sensitivity to
genuinely different content, and the codec round-trip being the thing
hashed. The pins call the SAME ahash()/envelope_hash() the queries
ship, so a threshold or bit-pack change cannot drift past them.
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
    ahash,
    envelope_hash,
    synth_ahash_pixels,
    synth_audio_samples,
)
from facebook_ad_library_data_pipeline_spark.multimodal.wav import (
    decode_wav_pcm16,
    encode_wav_pcm16,
)


def test_ahash_robust_to_perturbation_sensitive_to_content():
    base = synth_ahash_pixels(7)  # key 7, unperturbed
    variant = synth_ahash_pixels(7 + AH_KEYS)  # key 7, perturbed
    other = synth_ahash_pixels(8)  # different content
    assert not np.array_equal(base, variant)  # bytes DO differ
    assert ahash(base) == ahash(variant)  # ...but the hash agrees
    assert ahash(base) != ahash(other)


def test_ahash_survives_bmp_roundtrip():
    px = synth_ahash_pixels(3)
    decoded = decode_bmp24(encode_bmp24(px))
    assert np.array_equal(decoded, px)
    assert ahash(decoded) == ahash(px)


def test_audio_envelope_robust_and_roundtrip():
    base = synth_audio_samples(5)
    variant = synth_audio_samples(5 + AU_KEYS)
    assert not np.array_equal(base, variant)
    assert envelope_hash(base) == envelope_hash(variant)
    decoded, rate = decode_wav_pcm16(encode_wav_pcm16(base))
    assert np.array_equal(decoded, base) and rate == 8000
    assert envelope_hash(decoded) == envelope_hash(base)


def test_video_clip_signature_robust_and_ordered():
    """Frame-0 perturbation must not change the clip signature; frame
    ORDER must (the signature pins the sequence, not the set)."""
    from facebook_ad_library_data_pipeline_spark.multimodal.phash import (
        VD_KEYS,
        frame_hash16,
        synth_video_frames,
    )

    base = [frame_hash16(f) for f in synth_video_frames(3)]
    variant = [frame_hash16(f) for f in synth_video_frames(3 + VD_KEYS)]
    other = [frame_hash16(f) for f in synth_video_frames(4)]
    assert base == variant  # perturbed frame 0 hashes identically
    assert base != other
    assert "|".join(map(str, base)) != "|".join(map(str, reversed(base)))
