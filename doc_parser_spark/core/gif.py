"""Pure-Python GIF codec: full decode (LZW, interlace, local palettes,
transparency, frame compositing with disposal methods) plus a minimal
encoder used to build animation fixtures.

This makes animated GIF a *real* video-ish path for the frame-sampling
operator (``operators/multimodal.sample_video_frames``): no external
codec, deterministic output, numpy-vectorized pixel work. Static GIFs
(one frame) also decode through here for the standalone-image pipeline.

Reference behavior modeled on the GIF89a specification; the reference
repo treats images opaquely through PIL (``docling/backend/
image_backend.py`` routes images into the pdf pipeline), so this module
is engine-side capability, not a port.
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    pass


SIGNATURES = (b"GIF87a", b"GIF89a")


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate length-prefixed sub-blocks; return (payload, next_pos)."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise GifError("truncated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        if len(data) < pos + n:
            raise GifError("truncated sub-block payload")
        pos += n


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF LZW: variable-width codes packed LSB-first, 12-bit cap."""
    if not 2 <= min_code_size <= 11:
        raise GifError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader over the whole stream as one integer-array window
    bits = np.unpackbits(np.frombuffer(data, np.uint8)[:, None], axis=1, bitorder="little")
    bits = bits.ravel()
    out = np.empty(n_pixels, np.uint8)
    n_out = 0
    pos = 0

    def reset():
        return {i: (i,) for i in range(clear)}, min_code_size + 1

    table, width = reset()
    next_code = eoi + 1
    prev: tuple | None = None
    total_bits = len(bits)
    while n_out < n_pixels:
        if pos + width > total_bits:
            raise GifError("LZW stream exhausted before pixel count met")
        code = 0
        for i in range(width):
            code |= int(bits[pos + i]) << i
        pos += width
        if code == clear:
            table, width = reset()
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + (prev[0],)
        else:
            raise GifError(f"bad LZW code {code}")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = entry[:take]
        n_out += take
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise GifError("LZW produced too few pixels")
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, w: int, h: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        n = len(range(start, h, step))
        out[start::step] = rows[src : src + n]
        src += n
    return out.ravel()


MAX_PIXELS = 64_000_000  # reject absurd declared dimensions before allocating


def decode_gif(data: bytes):
    """GIF bytes → ``(width, height, frames)`` with
    ``frames = [(rgb_array (H,W,3) uint8, delay_ms), ...]`` — each frame
    fully composited onto the canvas per its predecessors' disposal
    methods (0/1 leave, 2 restore-to-background, 3 restore-to-previous).

    Untrusted-input hardening (this runs inside the extraction kernel over
    crawled payloads): logical-screen and frame dimensions are validated
    *before* any allocation — a corrupt header claiming 65535×65535 would
    otherwise demand a 12 GB canvas.
    """
    if data[:6] not in SIGNATURES:
        raise GifError("not a GIF")
    w, h, packed, bg_index, _ = struct.unpack("<HHBBB", data[6:13])
    if w == 0 or h == 0 or w * h > MAX_PIXELS:
        raise GifError(f"unreasonable logical screen {w}x{h}")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    if gct is not None and bg_index < len(gct):
        bg_rgb = gct[bg_index]
    else:
        bg_rgb = np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()

    frames: list[tuple[np.ndarray, float]] = []
    disposal, delay_ms, transparent = 0, 0.0, None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            payload, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:
                flags, delay_cs, tindex = struct.unpack("<BHB", payload[:4])
                disposal = (flags >> 2) & 0x07
                delay_ms = delay_cs * 10.0
                transparent = tindex if flags & 1 else None
            continue
        if block != 0x2C:
            raise GifError(f"unexpected block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if fw == 0 or fh == 0 or left + fw > w or top + fh > h:
            raise GifError(
                f"frame rect {fw}x{fh}@({left},{top}) outside {w}x{h} screen"
            )
        palette = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            palette = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise GifError("frame without any color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(min_code, lzw, fw * fh)
        if fpacked & 0x40:
            idx = _deinterlace(idx, fw, fh)
        region = canvas[top : top + fh, left : left + fw]
        saved = region.copy() if disposal == 3 else None
        rect = palette[np.minimum(idx, len(palette) - 1)].reshape(fh, fw, 3)
        if transparent is not None:
            mask = (idx != transparent).reshape(fh, fw)
            region[mask] = rect[mask]
        else:
            region[:, :] = rect
        frames.append((canvas.copy(), delay_ms))
        if disposal == 2:
            region[:, :] = bg_rgb
        elif disposal == 3 and saved is not None:
            region[:, :] = saved
        disposal, delay_ms, transparent = 0, 0.0, None
    if not frames:
        raise GifError("no image frames")
    return w, h, frames


# -- minimal encoder (fixtures / round-trip tests) ---------------------------


def _lzw_encode_flat(min_code_size: int, indices: np.ndarray) -> bytes:
    """Simplest valid LZW stream: CLEAR before every literal so the code
    width never grows — bulky but spec-correct, fine for fixtures."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for v in indices:
        emit(int(v))
        emit(clear)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    frames: list[tuple[np.ndarray, float]],
    palette: np.ndarray,
    disposal: int = 1,
    transparent: int | None = None,
) -> bytes:
    """Frames of palette *indices* (H,W uint8) + delays → animated GIF89a
    with one global color table. ``palette`` is (N,3) uint8, N a power of
    two ≥ 4."""
    h, w = frames[0][0].shape
    n = len(palette)
    if n & (n - 1) or n < 4:
        raise GifError("palette size must be a power of two >= 4")
    depth = n.bit_length() - 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 0x07), 0, 0)
    out += np.asarray(palette, np.uint8).tobytes()
    min_code = max(2, depth)
    for idx, delay_ms in frames:
        flags = (disposal & 0x07) << 2 | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, flags])
        out += struct.pack("<H", int(delay_ms) // 10)
        out += bytes([transparent or 0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([min_code])
        stream = _lzw_encode_flat(min_code, np.asarray(idx, np.uint8).ravel())
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)
