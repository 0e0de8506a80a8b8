"""Real media codecs built ONLY on the Python standard library.

This container ships no Pillow/libjpeg/pyav, but PNG and WAV need nothing
beyond stdlib: PNG is zlib-compressed filtered scanlines in CRC'd chunks
(RFC 2083), WAV is RIFF-framed PCM readable by the stdlib ``wave`` module.
Implementing them here turns the multimodal decode path from a disclosed
stub into a REAL decoder for two genuine formats, with the remaining stubs
(JPEG, video demux) still clearly gated.

Scope and scale notes:
- ``decode_png`` supports the non-interlaced 8-bit-depth profile (gray,
  gray+alpha, RGB, RGBA) — what synthetic fixtures and most thumbnails use.
  Filter reconstruction (None/Sub/Up/Average/Paeth) is numpy-per-scanline;
  the sequential filters loop over pixels within a row, which is fine for
  thumbnail-scale payloads inside an Arrow batch. A production deployment
  swaps this body for libpng via Pillow — the surrounding mapInPandas
  stage (schema, batching, null handling) is identical.
- ``encode_png`` writes any of the five filter types, so the decoder's
  filter reconstruction is round-trip-testable against an independent
  implementation of the SAME spec equations.
- ``decode_wav`` handles 16-bit PCM via the stdlib ``wave`` reader.

No reference-repo analogue: the reference treats media as opaque uploads
(PDF bytes only); these codecs serve the training-data-pipeline surface.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from typing import Tuple

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_COLORTYPE_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_CHANNELS_COLORTYPE = {v: k for k, v in _COLORTYPE_CHANNELS.items()}


class CodecError(ValueError):
    """Malformed or unsupported media payload."""


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec 6.6), vectorized over a pixel's bytes."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (height, width, channels)."""
    if not payload.startswith(PNG_MAGIC):
        raise CodecError("not a PNG payload")
    pos = len(PNG_MAGIC)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):
            raise CodecError(f"truncated {ctype!r} chunk")
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if crc != zlib.crc32(ctype + data) & 0xFFFFFFFF:
            raise CodecError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            if length != 13:
                raise CodecError(f"IHDR length {length} != 13")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise CodecError("missing IHDR")
    width, height, bitdepth, colortype, comp, filt, interlace = ihdr
    if bitdepth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise CodecError(
            f"unsupported PNG profile (bitdepth={bitdepth}, interlace={interlace})"
        )
    if colortype not in _COLORTYPE_CHANNELS:
        raise CodecError(f"unsupported color type {colortype}")
    ch = _COLORTYPE_CHANNELS[colortype]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise CodecError(f"corrupt IDAT stream: {exc}") from exc
    stride = width * ch
    if len(raw) != height * (1 + stride):
        raise CodecError("IDAT size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, 1 + stride)
    filters = rows[:, 0]
    data = rows[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        line = data[y].copy()
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line.astype(np.int32) + prev).astype(np.uint8)
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential along x
            cur = line
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    pred = int(
                        _paeth(
                            np.uint8(a).reshape(1), np.uint8(b).reshape(1), np.uint8(c).reshape(1)
                        )[0]
                    )
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise CodecError(f"unknown filter {f} in scanline {y}")
        out[y] = cur
        prev = out[y]
    return out.reshape(height, width, ch)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (H, W, C) array → PNG bytes using one filter type for every
    scanline (any of 0..4 — lets tests exercise each reconstruction arm)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype != np.uint8 or arr.ndim != 3:
        raise CodecError("encode_png expects a uint8 (H, W, C) array")
    height, width, ch = arr.shape
    if ch not in _CHANNELS_COLORTYPE:
        raise CodecError(f"unsupported channel count {ch}")
    if filter_type not in (0, 1, 2, 3, 4):
        raise CodecError(f"unknown filter {filter_type}")
    flat = arr.reshape(height, width * ch)
    stride = width * ch
    lines = []
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        cur = flat[y]
        a = np.zeros(stride, dtype=np.uint8)
        a[ch:] = cur[:-ch]
        c = np.zeros(stride, dtype=np.uint8)
        c[ch:] = prev[:-ch]
        if filter_type == 0:
            pred = np.zeros(stride, dtype=np.int32)
        elif filter_type == 1:
            pred = a.astype(np.int32)
        elif filter_type == 2:
            pred = prev.astype(np.int32)
        elif filter_type == 3:
            pred = (a.astype(np.int32) + prev.astype(np.int32)) // 2
        else:
            pred = _paeth(a, prev, c).astype(np.int32)
        filtered = ((cur.astype(np.int32) - pred) & 0xFF).astype(np.uint8)
        lines.append(bytes([filter_type]) + filtered.tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _CHANNELS_COLORTYPE[ch], 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize — index sampling, fully vectorized."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[ys[:, None], xs[None, :]]


def decode_wav(payload: bytes) -> Tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples of shape (n_frames, channels), rate).

    EVERY malformed-payload failure surfaces as CodecError: the stdlib
    wave module raises wave.Error but also EOFError (truncated chunks) and
    struct.error; an odd-length data chunk breaks np.frombuffer with a
    plain ValueError. The Arrow feature stage routes CodecError rows to a
    'decode_error' status (C3: a poison row must not kill the task), so
    nothing else may escape here."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2:
                raise CodecError(f"only 16-bit PCM supported, got {w.getsampwidth() * 8}-bit")
            n = w.getnframes()
            raw = w.readframes(n)
            rate = w.getframerate()
            ch = w.getnchannels()
        if n == 0 or ch == 0:
            raise CodecError("empty WAV (0 frames)")
        samples = np.frombuffer(raw, dtype="<i2").reshape(-1, ch)
    except CodecError:
        raise
    except (wave.Error, EOFError, struct.error, ValueError) as exc:
        raise CodecError(f"malformed WAV: {exc}") from exc
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 (n_frames, channels) → WAV bytes (test-fixture generator)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()
