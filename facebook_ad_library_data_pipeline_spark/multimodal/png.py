"""Pure-stdlib PNG codec for non-interlaced 8-bit RGB — the second
REAL image decode path with zero native dependencies (PNG's only
compression is zlib, which ships in the stdlib; everything else is
chunk framing + five per-row byte filters).

Scope is deliberately the minimal honest subset: bit depth 8, color
type 2 (truecolor RGB), compression 0, filter method 0, interlace 0.
The encoder cycles through ALL five filter types (None/Sub/Up/Average/
Paeth) row by row, so a decoder defect in any filter reconstruction —
including the Paeth predictor tie-breaking order — breaks the
round-trip and the closed-form pixel-stats oracle.

Reference tie-in: the media URLs the reference extracts
(/root/reference/transform_raw_data.py:84-88) are exactly what a real
pipeline would fetch and decode; JPEG stays stubbed (needs a DCT codec
library the container lacks).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_BPP = 3  # bytes per pixel: 8-bit RGB


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to
    a+b-c, ties broken left, then up."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, raw: bytes, prev: bytes) -> bytes:
    """Apply filter `ftype` to one raw scanline (encoder side)."""
    n = len(raw)
    out = bytearray(n)
    for x in range(n):
        left = raw[x - _BPP] if x >= _BPP else 0
        up = prev[x]
        upleft = prev[x - _BPP] if x >= _BPP else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) // 2
        else:
            pred = _paeth(left, up, upleft)
        out[x] = (raw[x] - pred) & 0xFF
    return bytes(out)


def _unfilter_row(ftype: int, cur: bytearray, prev: bytes) -> bytearray:
    """Reconstruct one scanline in place (decoder side). Sequential in x
    by necessity: Sub/Average/Paeth predict from already-reconstructed
    left neighbors."""
    if ftype == 0:
        return cur
    for x in range(len(cur)):
        left = cur[x - _BPP] if x >= _BPP else 0
        up = prev[x]
        upleft = prev[x - _BPP] if x >= _BPP else 0
        if ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) // 2
        elif ftype == 4:
            pred = _paeth(left, up, upleft)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        cur[x] = (cur[x] + pred) & 0xFF
    return cur


def encode_png_rgb(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (H, W, 3) -> non-interlaced 8-bit truecolor PNG.

    Rows cycle through filter types (row mod 5) so every decoder filter
    path is exercised by any image taller than 4 rows."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(f"expected (H, W, 3) uint8, got {pixels.shape} {pixels.dtype}")
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    scan = bytearray()
    prev = bytes(w * _BPP)
    for y in range(h):
        raw = pixels[y].tobytes()
        ftype = y % 5
        scan.append(ftype)
        scan += _filter_row(ftype, raw, prev)
        prev = raw
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(scan), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png_rgb(payload: bytes) -> np.ndarray:
    """Non-interlaced 8-bit truecolor PNG bytes -> RGB uint8 (H, W, 3).

    Full chunk walk with CRC verification; IDAT may be split across any
    number of chunks (concatenated before the single zlib stream is
    inflated, per spec)."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG variant: depth=%d color=%d comp=%d filter=%d "
                    "interlace=%d (only 8-bit RGB non-interlaced)"
                    % (depth, ctype, comp, filt, interlace)
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    scan = zlib.decompress(bytes(idat))
    stride = w * _BPP
    if len(scan) != h * (stride + 1):
        raise ValueError(f"IDAT length {len(scan)} != {h}x({stride}+1)")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytes(stride)
    for y in range(h):
        ftype = scan[y * (stride + 1)]
        cur = bytearray(scan[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        row = bytes(_unfilter_row(ftype, cur, prev))
        out[y] = np.frombuffer(row, dtype=np.uint8)
        prev = row
    return out.reshape(h, w, _BPP)
