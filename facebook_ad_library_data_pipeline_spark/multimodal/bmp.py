"""Pure-numpy 24-bit BMP codec — a REAL image decode path with zero
native dependencies (the container has no PIL; uncompressed BMP needs
none: 14-byte file header + 40-byte BITMAPINFOHEADER + bottom-up
BGR rows padded to 4 bytes).

This replaces the round-1-4 "honest stub": the multimodal feature
queries now decode actual image bytes and emit true pixel statistics.
The codec is intentionally minimal — BI_RGB, 24 bpp, positive height
(bottom-up) — which is exactly what the encoder half produces, so the
decode path is fully exercised end-to-end without external fixtures.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HEADER = struct.Struct("<2sIHHI")  # signature, file size, res, res, data offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER

HEADER_BYTES = _FILE_HEADER.size + _INFO_HEADER.size  # 14 + 40


def _row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3  # each BGR row padded to a 4-byte boundary


def encode_bmp24(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (H, W, 3) -> uncompressed 24-bit BMP bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(f"expected (H, W, 3) uint8, got {pixels.shape} {pixels.dtype}")
    h, w, _ = pixels.shape
    stride = _row_stride(w)
    rows = np.zeros((h, stride), dtype=np.uint8)
    # BMP stores rows bottom-up and channels as BGR
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    data = rows.tobytes()
    file_size = HEADER_BYTES + len(data)
    return (
        _FILE_HEADER.pack(b"BM", file_size, 0, 0, HEADER_BYTES)
        + _INFO_HEADER.pack(40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
        + data
    )


def decode_bmp24(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes -> RGB uint8 array (H, W, 3)."""
    sig, _file_size, _, _, offset = _FILE_HEADER.unpack_from(payload, 0)
    if sig != b"BM":
        raise ValueError("not a BMP payload")
    (hsize, w, h, _planes, bpp, compression, *_rest) = _INFO_HEADER.unpack_from(
        payload, _FILE_HEADER.size
    )
    if hsize < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: header={hsize} bpp={bpp} comp={compression}")
    if h <= 0:
        raise ValueError("top-down BMPs not supported")
    stride = _row_stride(w)
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1]  # bottom-up BGR -> top-down RGB
