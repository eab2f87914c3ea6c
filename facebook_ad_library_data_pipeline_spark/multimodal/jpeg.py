"""Pure-numpy baseline JPEG codec — the third and last REAL image
decode path, removing the final multimodal stub (rounds 1-5 carried
"JPEG needs a codec library" at media.py; it doesn't: baseline JPEG is
Huffman coding + an 8×8 DCT, both implementable on the stdlib + numpy).

Honest scope (rejected loudly otherwise): baseline sequential DCT
(SOF0), 8-bit precision, grayscale or 4:4:4 YCbCr (no chroma
subsampling), no restart markers, no progressive scans. The Huffman and
quantization tables are read from the file like any decoder; the
encoder half emits the standard JPEG Annex K example tables.

Determinism note for the oracle-checked fixture query
(media.q_jpeg_pixel_stats): JPEG is lossy, but for a uniform 8×8 block
every AC coefficient is (numerically ~1e-13, quantized exactly) zero
and the whole round trip collapses to the DC closed form

    decoded(v) = clamp(2 * round_half_away((v - 128) / 2) + 128)

(luma q[0][0] = 16: quantize round((8(v-128))/16), dequantize ×16,
IDCT /8 → exact integers in float64) — which DuckDB reproduces with its
own round() (half away from zero, verified). Quantization here uses
half-away rounding to match; general images just lose precision like
any JPEG.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------- standard tables

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# JPEG spec Annex K.1 example quantization tables (zigzag order applied
# at write time; stored here in natural row-major order).
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)
QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# Annex K.3 example Huffman specs: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical JPEG assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-at-a-time decoder."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


# 8x8 DCT-II basis: M[u, x] = c(u)/2 * cos((2x+1) u pi / 16);
# forward F = M f M^T, inverse f = M^T F M.
def _dct_matrix() -> np.ndarray:
    u = np.arange(8).reshape(-1, 1)
    x = np.arange(8).reshape(1, -1)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] *= 1 / np.sqrt(2)
    return m


_DCT_M = _dct_matrix()


def _round_away(x: np.ndarray) -> np.ndarray:
    """Round half away from zero (matches DuckDB/ANSI round(), unlike
    numpy's banker's rounding)."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


# ------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _dc_category(diff: int) -> int:
    return 0 if diff == 0 else int(diff).bit_length() if diff > 0 else int(-diff).bit_length()


def _amplitude_bits(value: int, size: int) -> int:
    # negative amplitudes are stored one's-complemented within `size` bits
    return value if value >= 0 else value + (1 << size) - 1


def _marker(tag: int, body: bytes) -> bytes:
    return struct.pack(">HH", tag, len(body) + 2) + body


def encode_jpeg_rgb444(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB, H and W multiples of 8 -> baseline JFIF
    bytes: 4:4:4 YCbCr, Annex K tables, no subsampling/restarts."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(f"expected (H, W, 3) uint8, got {pixels.shape} {pixels.dtype}")
    h, w, _ = pixels.shape
    if h % 8 or w % 8:
        raise ValueError("H and W must be multiples of 8 (no padding implemented)")
    rgb = pixels.astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    planes = [
        np.clip(_round_away(0.299 * r + 0.587 * g + 0.114 * b), 0, 255),
        np.clip(_round_away(128 - 0.168736 * r - 0.331264 * g + 0.5 * b), 0, 255),
        np.clip(_round_away(128 + 0.5 * r - 0.418688 * g - 0.081312 * b), 0, 255),
    ]
    quants = [QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA]
    dc_enc = [
        _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
        _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_enc = [
        _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
        _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    bw = _BitWriter()
    pred = [0, 0, 0]
    for by in range(h // 8):
        for bx in range(w // 8):
            for ci in range(3):
                ti = 0 if ci == 0 else 1
                block = planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = _DCT_M @ block @ _DCT_M.T
                # snap float-fuzzed coefficients back to the integers
                # they are analytically (integer-valued blocks have
                # integral DC and zero AC up to ~1e-12 basis error);
                # without this the half-integer quantization boundary
                # (odd DC / 2) resolves unpredictably
                near = _round_away(coef)
                coef = np.where(np.abs(coef - near) < 1e-6, near, coef)
                q = _round_away(coef / quants[ti]).astype(np.int64)
                zz = q.flatten()[ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                size = _dc_category(diff)
                code, ln = dc_enc[ti][size]
                bw.write(code, ln)
                if size:
                    bw.write(_amplitude_bits(diff, size), size)
                # AC run-length coding
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_enc[ti][0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    size = _dc_category(v)
                    code, ln = ac_enc[ti][(run << 4) | size]
                    bw.write(code, ln)
                    bw.write(_amplitude_bits(v, size), size)
                    run = 0
                if run:
                    code, ln = ac_enc[ti][0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return _marker(0xFFDB, bytes([tid]) + bytes(table.flatten()[ZIGZAG].astype(np.uint8)))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return _marker(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    sof = _marker(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = _marker(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xff\xd8"
        + _marker(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dqt(0, QUANT_LUMA)
        + dqt(1, QUANT_CHROMA)
        + sof
        + dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        + sos
        + bytes(bw.out)
        + b"\xff\xd9"
    )


# ------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first entropy-segment reader with 0xFF00 unstuffing."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker inside entropy data")
                self.pos += 1
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(bits: int, size: int) -> int:
    # invert one's-complement negative amplitude storage
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 array: (H, W, 3) RGB for 3-component
    images, (H, W) for grayscale. Supports SOF0 / 8-bit / no chroma
    subsampling / no restart markers; anything else raises ValueError
    naming the unsupported feature."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    scan = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        tag = payload[pos + 1]
        if tag == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if tag == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(body[off + 1 : off + 65], dtype=np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                off += 65
        elif tag == 0xC4:  # DHT
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                htables[(cls, tid)] = _decode_table(bits, vals)
                off += 17 + n
        elif tag == 0xC0:  # SOF0 baseline
            prec, h, w, nf = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nf):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                if hv != 0x11:
                    raise ValueError("chroma subsampling unsupported (H/V != 1)")
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif tag in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline frame type 0xFF{tag:02X} unsupported")
        elif tag == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif tag == 0xDA:  # SOS — entropy data follows until next marker
            ns = body[0]
            scan_comps = [(body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0xF)
                          for i in range(ns)]
            # entropy segment: scan forward to the EOI marker
            end = pos
            while end < len(payload) - 1:
                if payload[end] == 0xFF and payload[end + 1] not in (0x00,) and not (
                    0xD0 <= payload[end + 1] <= 0xD7
                ):
                    break
                end += 1
            scan = (scan_comps, payload[pos:end])
            pos = end
        # APPn/COM and anything else: skipped
    if frame is None or scan is None:
        raise ValueError("missing SOF0 or SOS")
    h, w, comps = frame
    scan_comps, entropy = scan
    br = _BitReader(entropy)
    by_n, bx_n = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((by_n * 8, bx_n * 8)) for _ in comps]
    pred = [0] * len(comps)
    comp_tq = {cid: tq for cid, tq in comps}
    for by in range(by_n):
        for bx in range(bx_n):
            for ci, (cid, td, ta) in enumerate(scan_comps):
                zz = np.zeros(64, dtype=np.int64)
                size = _read_symbol(br, htables[(0, td)])
                pred[ci] += _extend(br.read_bits(size), size)
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    sym = _read_symbol(br, htables[(1, ta)])
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0xF
                    if size == 0 and run == 15:  # ZRL
                        k += 16
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("AC index out of range")
                    zz[k] = _extend(br.read_bits(size), size)
                    k += 1
                coef = np.zeros(64)
                coef[ZIGZAG] = zz
                coef = coef.reshape(8, 8) * qtables[comp_tq[cid]]
                block = _DCT_M.T @ coef @ _DCT_M + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        return np.clip(_round_away(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"{len(planes)}-component images unsupported")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(_round_away(out), 0, 255).astype(np.uint8)
