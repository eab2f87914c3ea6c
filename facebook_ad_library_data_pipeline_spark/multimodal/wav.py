"""Pure-stdlib PCM16 WAV codec — the REAL audio decode path of the
multimodal matrix (image: bmp/png/jpeg, video: SGVC container, audio:
this). RIFF container: 12-byte RIFF/WAVE header, an `fmt ` chunk
(PCM, mono/stereo, 16-bit), a `data` chunk of little-endian int16
samples. Zero native dependencies — struct for headers, numpy for the
sample buffer — and the decoder walks chunks generically (skipping
unknown ones), so it reads WAVs other writers produce, not just its
own.

The audio-stats query encodes deterministic integer waveforms to
actual WAV bytes and decodes them back inside mapInPandas; sample
statistics are exact integer moments, so the DuckDB oracle reproduces
them in closed form (the same no-libm rule as the image codecs).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 array (n,) mono or (n, channels) -> RIFF/WAVE PCM bytes."""
    if samples.dtype != np.int16:
        raise ValueError(f"expected int16 samples, got {samples.dtype}")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    # WAV data is interleaved little-endian int16, frame-major
    data = samples.astype("<i2").tobytes()
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate, byte_rate, block_align, 16
    )
    data_hdr = struct.pack("<4sI", b"data", len(data))
    riff_size = 4 + len(fmt) + len(data_hdr) + len(data)
    return struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE") + fmt + data_hdr + data


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes -> (samples (n, channels) int16, rate).

    Chunk-walks the container (tolerating unknown chunks and the
    odd-length pad byte RIFF mandates); raises on a non-PCM or
    non-16-bit format — no silent salvage."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE payload: {payload[:4]!r}")
    off = 12
    channels = rate = None
    data = None
    while off + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, off)
        off += 8
        body = payload[off : off + size]
        if len(body) < size:
            raise ValueError(f"truncated chunk {cid!r}: need {size} bytes at {off}")
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV format {audio_fmt}/{bits}-bit")
        elif cid == b"data":
            data = body
        off += size + (size & 1)  # RIFF pads odd chunks
    if channels is None or data is None:
        raise ValueError("missing fmt or data chunk")
    samples = np.frombuffer(data, dtype="<i2").reshape(-1, channels)
    return samples, rate
