"""Minimal pure-Python PNG codec (zlib + struct + numpy only).

The container environment has no PIL/imageio, but PNG itself is just
zlib-compressed filtered scanlines — encoding and decoding 8-bit
gray/RGB/RGBA images needs nothing beyond the stdlib. This gives the
multimodal operators (`operators/multimodal.py`) a *real* raster format:
page renders, resizes, and crops round-trip through actual PNG bytes
instead of a fake container.

Scope (deliberate): bit depth 8, color types 0 (gray), 2 (RGB), 3
(palette), 4 (gray+alpha), 6 (RGBA), non-interlaced, all five scanline
filters on decode, filter 0 on encode. Anything else raises
``PngError`` — callers treat that as a corrupt/unsupported payload.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from doc_parser_spark.core.limits import MAX_PIXELS, BombError, inflate_bounded

SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """uint8 array (H,W) / (H,W,1) gray, (H,W,3) RGB, (H,W,4) RGBA → PNG."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise PngError(f"encode_png needs uint8, got {a.dtype}")
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3, 4):
        raise PngError(f"unsupported array shape {arr.shape}")
    h, w, c = a.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), a.reshape(h, w * c)], axis=1
    ).tobytes()
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, compress_level))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, stride, pos).astype(np.int32)
        pos += stride
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:
            cur = line.copy()
            if ftype == 1:  # Sub
                for x in range(bpp, stride):
                    cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
            elif ftype == 3:  # Average
                for x in range(stride):
                    left = cur[x - bpp] if x >= bpp else 0
                    cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
            elif ftype == 4:  # Paeth
                for x in range(stride):
                    left = cur[x - bpp] if x >= bpp else 0
                    up_left = prev[x - bpp] if x >= bpp else 0
                    cur[x] = (cur[x] + _paeth(left, int(prev[x]), up_left)) & 0xFF
            else:
                raise PngError(f"unknown filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 (H, W, C) array (palette expanded to RGB)."""
    if not data.startswith(SIGNATURE):
        raise PngError("not a PNG (bad signature)")
    pos = len(SIGNATURE)
    ihdr = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"PLTE":
            palette = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise PngError("missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise PngError(f"unsupported depth={depth} interlace={interlace}")
    if color_type not in _CHANNELS:
        raise PngError(f"unsupported color type {color_type}")
    bpp = _CHANNELS[color_type]
    if w == 0 or h == 0 or w * h > MAX_PIXELS:
        raise PngError(f"implausible dimensions {w}x{h}")
    # inflate with the output cap derived from the declared dimensions —
    # a small deflate bomb must not expand past w*h*bpp+h (limits.py)
    expected = h * (w * bpp + 1)
    try:
        raw = inflate_bounded(bytes(idat), expected)
    except BombError as exc:
        raise PngError(str(exc)) from exc
    if len(raw) != expected:
        raise PngError("truncated pixel data")
    pixels = _unfilter(raw, h, w, bpp).reshape(h, w, bpp)
    if color_type == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        pixels = palette[pixels[:, :, 0]]
    return pixels


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps (pure numpy)."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(height) * h) // max(height, 1), h - 1)
    xs = np.minimum((np.arange(width) * w) // max(width, 1), w - 1)
    return arr[ys][:, xs]
