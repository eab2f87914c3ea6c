"""BMP codec correctness + the oracle-backed pixel-stats round trip."""

from __future__ import annotations

import numpy as np
import pytest

from facebook_ad_library_data_pipeline_spark.multimodal.bmp import (
    HEADER_BYTES,
    decode_bmp24,
    encode_bmp24,
)
from facebook_ad_library_data_pipeline_spark.multimodal.media import (
    IMG_H,
    IMG_W,
    synth_pixels,
)


@pytest.mark.parametrize("shape", [(1, 1, 3), (12, 15, 3), (7, 4, 3), (32, 32, 3)])
def test_bmp_roundtrip_exact(shape):
    rng = np.random.default_rng(12345)
    pixels = rng.integers(0, 256, size=shape, dtype=np.uint8)
    decoded = decode_bmp24(encode_bmp24(pixels))
    assert decoded.shape == shape
    assert np.array_equal(decoded, pixels)


def test_bmp_row_padding():
    # width 15 -> 45 data bytes padded to 48 per row
    pixels = np.zeros((2, 15, 3), dtype=np.uint8)
    payload = encode_bmp24(pixels)
    assert len(payload) == HEADER_BYTES + 2 * 48
    assert np.array_equal(decode_bmp24(payload), pixels)


def test_bmp_is_bottom_up_bgr():
    # one red pixel at top-left: BMP stores rows bottom-up as BGR, so
    # the FIRST data row in the file is the LAST image row (all zeros)
    # and the red byte sits at offset +2 within its pixel.
    pixels = np.zeros((2, 1, 3), dtype=np.uint8)
    pixels[0, 0] = (255, 0, 0)
    payload = encode_bmp24(pixels)
    data = payload[HEADER_BYTES:]
    assert data[:3] == b"\x00\x00\x00"  # bottom image row first
    assert data[4:7] == b"\x00\x00\xff"  # B,G,R of the red pixel
    assert np.array_equal(decode_bmp24(payload), pixels)


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        decode_bmp24(b"PNG-not-bmp" + b"\x00" * 64)
    with pytest.raises(ValueError):
        encode_bmp24(np.zeros((4, 4), dtype=np.uint8))  # not 3-channel


def test_synth_pixels_match_closed_form():
    img = synth_pixels(42)
    assert img.shape == (IMG_H, IMG_W, 3)
    assert img[3, 7, 1] == (42 * 7 + 3 * 31 + 7 * 13 + 5) % 256


def test_pixel_stats_oracle_match(spark, sf_dir, duck):
    from facebook_ad_library_data_pipeline_spark.registry import load_all

    from .oracle_harness import assert_matches_oracle

    q = load_all()["q_multimodal_pixel_stats"]
    assert_matches_oracle(q.fn(spark, sf_dir), q.oracle, duck)


# ------------------------------------------------------------------ PNG

from facebook_ad_library_data_pipeline_spark.multimodal.png import (  # noqa: E402
    decode_png_rgb,
    encode_png_rgb,
)


@pytest.mark.parametrize("shape", [(1, 1, 3), (12, 15, 3), (7, 4, 3), (32, 32, 3)])
def test_png_roundtrip_exact(shape):
    rng = np.random.default_rng(54321)
    pixels = rng.integers(0, 256, size=shape, dtype=np.uint8)
    decoded = decode_png_rgb(encode_png_rgb(pixels))
    assert decoded.shape == shape
    assert np.array_equal(decoded, pixels)


def test_png_exercises_all_filters():
    # 10 rows -> encoder filter types 0,1,2,3,4,0,1,2,3,4: every
    # reconstruction path (incl. Paeth) must round-trip exactly.
    pixels = (np.arange(10 * 6 * 3, dtype=np.int64) * 37 % 256).astype(np.uint8)
    pixels = pixels.reshape(10, 6, 3)
    assert np.array_equal(decode_png_rgb(encode_png_rgb(pixels)), pixels)


def test_png_crc_and_garbage_rejected():
    pixels = np.zeros((3, 3, 3), dtype=np.uint8)
    payload = bytearray(encode_png_rgb(pixels))
    with pytest.raises(ValueError):
        decode_png_rgb(b"not a png at all")
    payload[40] ^= 0xFF  # corrupt a body byte inside a chunk
    with pytest.raises(ValueError):
        decode_png_rgb(bytes(payload))


def test_decode_image_compressed_sniffs_formats():
    from facebook_ad_library_data_pipeline_spark.multimodal.media import (
        decode_image_compressed,
    )

    pixels = synth_pixels(7)
    from facebook_ad_library_data_pipeline_spark.multimodal.bmp import encode_bmp24 as enc_bmp

    assert np.array_equal(decode_image_compressed(encode_png_rgb(pixels)), pixels)
    assert np.array_equal(decode_image_compressed(enc_bmp(pixels)), pixels)
    with pytest.raises(NotImplementedError):
        decode_image_compressed(b"\xff\xd8\xff\xe0 fake jpeg")


def test_png_pixel_stats_oracle_match(spark, sf_dir, duck):
    from facebook_ad_library_data_pipeline_spark.registry import load_all

    from .oracle_harness import assert_matches_oracle

    q = load_all()["q_png_pixel_stats"]
    assert_matches_oracle(q.fn(spark, sf_dir), q.oracle, duck)
