"""Native BMP (Windows DIB) decoder — pure numpy, no image libraries.

Closes the last header-only raster waiver (`image_backend._bmp_dims`
parsed dimensions; pixels now decode like PNG/JPEG/GIF/TIFF do through
their native codecs). Scope: the uncompressed formats real crawls
carry —

* BITMAPCOREHEADER (12) and BITMAPINFOHEADER (40) + V2-V5 extensions;
* BI_RGB at 1/4/8 bpp (palette), 16 bpp (X1R5G5B5), 24 bpp (BGR),
  32 bpp (BGRX);
* BI_BITFIELDS at 16/32 bpp (arbitrary contiguous masks, e.g. 565);
* bottom-up and top-down row order; rows padded to 4 bytes.

RLE4/RLE8/PNG/JPEG-embedded compression raise ``BmpError('unsupported
...')`` — the multimodal decode point maps that onto its
``codec_unavailable`` status like the other codecs' marked boundaries.
Output: uint8 (H, W, 3) RGB (palette/gray expand; alpha dropped —
BMP alpha is almost always garbage X bytes).

Inflation is header-bounded: pixel-array size derives from declared
dimensions, capped by ``limits.MAX_PIXELS`` before any allocation.
"""

from __future__ import annotations

import struct

import numpy as np

from doc_parser_spark.core.limits import MAX_PIXELS


class BmpError(ValueError):
    """Malformed or out-of-scope BMP payload."""


def _mask_shift(mask: int) -> tuple[int, int]:
    """(shift, width) of a contiguous bit mask; (0, 0) for an empty mask."""
    if mask == 0:
        return 0, 0
    shift = (mask & -mask).bit_length() - 1
    width = (mask >> shift).bit_length()
    return shift, width


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → uint8 (H, W, 3) RGB array."""
    if len(data) < 26 or data[:2] != b"BM":
        raise BmpError("not a BMP payload")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    dib = struct.unpack_from("<I", data, 14)[0]
    if dib == 12:  # BITMAPCOREHEADER: 16-bit dims, no compression field
        w, h, _planes, bpp = struct.unpack_from("<HHHH", data, 18)
        top_down = False
        compression = 0
        pal_off, pal_entry = 14 + 12, 3
        n_colors = 0
    elif dib >= 40:
        if len(data) < 50:
            raise BmpError("truncated INFO header")
        w, h_raw, _planes, bpp, compression = struct.unpack_from(
            "<iihHI", data, 18
        )
        n_colors = struct.unpack_from("<I", data, 46)[0]
        top_down = h_raw < 0
        h = -h_raw if top_down else h_raw
        pal_off, pal_entry = 14 + dib, 4
    else:
        raise BmpError(f"unknown DIB header size {dib}")
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise BmpError(f"bad dimensions {w}x{h}")
    if compression == 3 and bpp in (16, 32):
        # BI_BITFIELDS: masks live right after a 40-byte header (or in
        # the V4/V5 header fields, same offset)
        if len(data) < 14 + 40 + 12:
            raise BmpError("truncated bitfields masks")
        rmask, gmask, bmask = struct.unpack_from("<III", data, 14 + 40)
        if dib == 40:
            pal_off += 12
    elif compression == 0:
        if bpp == 16:
            rmask, gmask, bmask = 0x7C00, 0x03E0, 0x001F
        elif bpp == 32:
            rmask, gmask, bmask = 0x00FF0000, 0x0000FF00, 0x000000FF
        else:
            rmask = gmask = bmask = 0
    else:
        raise BmpError(f"unsupported compression {compression}")

    row_bytes = (w * bpp + 7) // 8
    stride = (row_bytes + 3) & ~3
    need = stride * h
    px = data[pix_off : pix_off + need]
    if len(px) < need:
        raise BmpError("truncated pixel array")
    rows = np.frombuffer(px, dtype=np.uint8).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]

    if bpp == 24:
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        return bgr[:, :, ::-1].copy()
    if bpp == 32:
        raw = rows[:, : w * 4].reshape(h, w, 4)
        val = raw.astype(np.uint32)
        pixel = (
            val[:, :, 0]
            | (val[:, :, 1] << 8)
            | (val[:, :, 2] << 16)
            | (val[:, :, 3] << 24)
        )
        return _apply_masks(pixel, rmask, gmask, bmask)
    if bpp == 16:
        raw = rows[:, : w * 2].reshape(h, w, 2).astype(np.uint32)
        pixel = raw[:, :, 0] | (raw[:, :, 1] << 8)
        return _apply_masks(pixel, rmask, gmask, bmask)
    if bpp in (1, 4, 8):
        max_colors = 1 << bpp
        n = n_colors or max_colors
        n = min(n, max_colors)
        pal_raw = data[pal_off : pal_off + n * pal_entry]
        if len(pal_raw) < n * pal_entry:
            raise BmpError("truncated palette")
        pal = np.frombuffer(pal_raw, dtype=np.uint8).reshape(n, pal_entry)
        palette = np.zeros((max_colors, 3), dtype=np.uint8)
        palette[:n] = pal[:, :3][:, ::-1]  # BGR(X) -> RGB
        if bpp == 8:
            idx = rows[:, :w]
        elif bpp == 4:
            expanded = np.empty((h, row_bytes * 2), dtype=np.uint8)
            expanded[:, 0::2] = rows[:, :row_bytes] >> 4
            expanded[:, 1::2] = rows[:, :row_bytes] & 0x0F
            idx = expanded[:, :w]
        else:
            bits = np.unpackbits(rows[:, :row_bytes], axis=1)
            idx = bits[:, :w]
        return palette[idx]
    raise BmpError(f"unsupported bit depth {bpp}")


def _apply_masks(pixel: np.ndarray, rmask: int, gmask: int, bmask: int) -> np.ndarray:
    out = np.zeros((*pixel.shape, 3), dtype=np.uint8)
    for ch, mask in enumerate((rmask, gmask, bmask)):
        shift, width = _mask_shift(mask)
        if width == 0:
            continue
        val = (pixel & mask) >> shift
        if width < 8:
            # expand to 8 bits by repeating the high bits (the standard
            # 5->8/6->8 expansion: v*255//maxval done via bit replication)
            val = (val * 255) // ((1 << width) - 1)
        elif width > 8:
            val = val >> (width - 8)
        out[:, :, ch] = val.astype(np.uint8)
    return out


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB → 24-bpp bottom-up BMP (test fixture writer)."""
    h, w, _c = arr.shape
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    pad = b"\x00" * (stride - row_bytes)
    body = b"".join(
        arr[y, :, ::-1].tobytes() + pad for y in range(h - 1, -1, -1)
    )
    pix_off = 14 + 40
    header = b"BM" + struct.pack(
        "<IHHI", pix_off + len(body), 0, 0, pix_off
    )
    dib = struct.pack("<IiihHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + body
