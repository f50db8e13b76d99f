"""Pure-Python baseline TIFF decoder: strip-organized grayscale /
bilevel / palette / RGB(A) images, uncompressed or PackBits- or
LZW-compressed (with horizontal-differencing predictor), both byte
orders.

Closes the last raster-codec waiver: HWPX ``BinData/*.tif`` pictures
(the reference loads them via Wand/ImageMagick, ``hwpx_backend.py:
1173-1197``) and standalone ``.tif`` crawl payloads now decode natively,
the same treatment PNG/JPEG/GIF/WMF already get. Baseline TIFF 6.0
scope: PlanarConfiguration=1 (chunky), BitsPerSample 1/4/8, Compression
1 (none) / 5 (LZW, with the spec's early-change code-width bump) /
32773 (PackBits). Tiled TIFFs, 16-bit samples, and JPEG-in-TIFF report
``unsupported`` — a marked boundary, not a silent wrong answer.

Decompression is bounded by the pixel budget declared in the header
(``MAX_PIXELS``, same guard as ``core/gif.py``) so a crafted small
payload cannot inflate without limit.
"""

from __future__ import annotations

import struct

import numpy as np


class TiffError(ValueError):
    pass


MAX_PIXELS = 64_000_000  # reject absurd declared dimensions before allocating

# (tag, name) subset needed for baseline decode
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_COLORMAP = 320

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 8: 2, 9: 4, 11: 4, 12: 8}


def is_tiff(data: bytes) -> bool:
    return data[:4] in (b"II*\x00", b"MM\x00*")


def _read_ifd(data: bytes, endian: str) -> dict[int, list[int]]:
    """First IFD → {tag: [values...]} (integer types only)."""
    if len(data) < 8:
        raise TiffError("truncated header")
    (off,) = struct.unpack(endian + "I", data[4:8])
    if off + 2 > len(data):
        raise TiffError("IFD offset out of range")
    (n_entries,) = struct.unpack(endian + "H", data[off : off + 2])
    tags: dict[int, list[int]] = {}
    pos = off + 2
    for _ in range(n_entries):
        if pos + 12 > len(data):
            raise TiffError("truncated IFD")
        tag, typ, count = struct.unpack(endian + "HHI", data[pos : pos + 8])
        size = _TYPE_SIZES.get(typ)
        if size is None:  # unknown field type: skip per spec
            pos += 12
            continue
        total = size * count
        if total <= 4:
            raw = data[pos + 8 : pos + 8 + total]
        else:
            (voff,) = struct.unpack(endian + "I", data[pos + 8 : pos + 12])
            if voff + total > len(data):
                raise TiffError(f"tag {tag} value out of range")
            raw = data[voff : voff + total]
        if typ == 3:
            vals = list(struct.unpack(endian + "H" * count, raw))
        elif typ == 4:
            vals = list(struct.unpack(endian + "I" * count, raw))
        elif typ in (1, 6, 7):
            vals = list(raw)
        else:  # rationals etc. — not needed for decode geometry
            vals = []
        tags[tag] = vals
        pos += 12
    return tags


def _unpackbits(src: bytes, expected: int) -> bytes:
    """Apple PackBits: n >= 0 → copy n+1 literals; n in [-127, -1] →
    repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    n_src = len(src)
    while i < n_src and len(out) < expected:
        n = src[i]
        i += 1
        if n < 128:
            if i + n + 1 > n_src:
                raise TiffError("PackBits literal overruns strip")
            out += src[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= n_src:
                raise TiffError("PackBits run overruns strip")
            out += bytes([src[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise TiffError("PackBits produced too few bytes")
    return bytes(out[:expected])


_CLEAR = 256
_EOI = 257


def _unlzw(src: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW: MSB-first bit packing, 9-bit initial codes,
    early code-width change (width bumps when the NEXT code would not
    fit — one entry earlier than GIF)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    buf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in src:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (buf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == _EOI:
                if len(out) < expected:
                    raise TiffError("LZW EOI before pixel count met")
                return bytes(out[:expected])
            if code == _CLEAR:
                table = table[:258]
                width = 9
                prev = None
                continue
            if prev is None:
                if code >= 256:
                    raise TiffError(f"bad initial LZW code {code}")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise TiffError(f"bad LZW code {code}")
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
            prev = entry
            # early change: bump when the next-added code hits the width cap
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    if len(out) < expected:
        raise TiffError("LZW stream exhausted before pixel count met")
    return bytes(out[:expected])


def _expand_bits(row: bytes, bits: int, width: int) -> np.ndarray:
    """1/4-bit packed row (MSB-first per TIFF FillOrder=1) → uint8 samples."""
    a = np.frombuffer(row, dtype=np.uint8)
    if bits == 1:
        out = np.unpackbits(a)[:width]
    elif bits == 4:
        hi = a >> 4
        lo = a & 0x0F
        out = np.empty(a.size * 2, dtype=np.uint8)
        out[0::2] = hi
        out[1::2] = lo
        out = out[:width]
    else:
        raise TiffError(f"unsupported BitsPerSample {bits}")
    return out


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes → uint8 (H, W, C) array, C in {1, 3, 4}."""
    if not is_tiff(data):
        raise TiffError("not a TIFF")
    endian = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, endian)

    def one(tag: int, default: int | None = None) -> int:
        vals = tags.get(tag)
        if not vals:
            if default is None:
                raise TiffError(f"missing required tag {tag}")
            return default
        return vals[0]

    width = one(_T_WIDTH)
    height = one(_T_HEIGHT)
    if width <= 0 or height <= 0 or width * height > MAX_PIXELS:
        raise TiffError(f"bad dimensions {width}x{height}")
    samples = one(_T_SAMPLES, 1)
    bits_list = tags.get(_T_BITS, [1])
    if len(set(bits_list)) != 1:
        raise TiffError("heterogeneous BitsPerSample unsupported")
    bits = bits_list[0] if bits_list else 1
    compression = one(_T_COMPRESSION, 1)
    photometric = one(_T_PHOTOMETRIC, 1)
    planar = one(_T_PLANAR, 1)
    predictor = one(_T_PREDICTOR, 1)
    if planar != 1:
        raise TiffError("unsupported PlanarConfiguration (planar data)")
    if compression not in (1, 5, 32773):
        raise TiffError(f"unsupported Compression {compression}")
    if samples not in (1, 3, 4):
        raise TiffError(f"unsupported SamplesPerPixel {samples}")
    if samples > 1 and bits != 8:
        raise TiffError("unsupported BitsPerSample for multi-sample image")
    if bits not in (1, 4, 8):
        raise TiffError(f"unsupported BitsPerSample {bits}")
    if predictor not in (1, 2):
        raise TiffError(f"unsupported Predictor {predictor}")

    offsets = tags.get(_T_STRIP_OFFSETS)
    counts = tags.get(_T_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffError("missing strip layout (tiled TIFF unsupported)")
    rows_per_strip = one(_T_ROWS_PER_STRIP, height)
    if rows_per_strip <= 0:
        raise TiffError("bad RowsPerStrip")

    row_bytes = (width * samples * bits + 7) // 8
    rows = []
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise TiffError("strip out of range")
        n_rows = min(rows_per_strip, height - i * rows_per_strip)
        if n_rows <= 0:
            break
        raw = data[off : off + cnt]
        expected = row_bytes * n_rows
        if compression == 32773:
            raw = _unpackbits(raw, expected)
        elif compression == 5:
            raw = _unlzw(raw, expected)
        elif len(raw) < expected:
            raise TiffError("uncompressed strip too short")
        strip = np.frombuffer(raw[:expected], dtype=np.uint8).reshape(
            n_rows, row_bytes
        )
        rows.append(strip)
    if not rows:
        raise TiffError("no strip data")
    packed = np.concatenate(rows, axis=0)
    if packed.shape[0] != height:
        raise TiffError("strips cover fewer rows than ImageLength")

    if bits == 8:
        img = packed.reshape(height, row_bytes)[:, : width * samples].reshape(
            height, width, samples
        ).astype(np.uint8)
    else:
        expanded = np.stack(
            [_expand_bits(packed[y].tobytes(), bits, width) for y in range(height)]
        )
        img = expanded[:, :, None]

    if predictor == 2:
        img = np.cumsum(img.astype(np.int64), axis=1).astype(np.uint8)
        img = np.ascontiguousarray(img)

    if photometric == 3:  # palette
        cmap = tags.get(_T_COLORMAP)
        n = 1 << bits
        if not cmap or len(cmap) < 3 * n:
            raise TiffError("palette image missing ColorMap")
        # TIFF colormaps are 16-bit per channel, R then G then B planes
        pal = (np.array(cmap[: 3 * n], dtype=np.uint32).reshape(3, n) >> 8).astype(
            np.uint8
        )
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= n:
            raise TiffError("palette index out of range")
        img = np.stack([pal[0][idx], pal[1][idx], pal[2][idx]], axis=2)
    elif photometric == 0:  # WhiteIsZero
        scale = (1 << bits) - 1
        img = (scale - img).astype(np.uint8)
        if bits != 8:
            img = (img.astype(np.uint32) * 255 // scale).astype(np.uint8)
    elif photometric in (1, 2):
        if bits != 8 and samples == 1:
            scale = (1 << bits) - 1
            img = (img.astype(np.uint32) * 255 // scale).astype(np.uint8)
    else:
        raise TiffError(f"unsupported PhotometricInterpretation {photometric}")

    return np.ascontiguousarray(img)


def tiff_to_png(data: bytes) -> bytes | None:
    """TIFF payload → PNG bytes via the native codec, None if the payload
    is outside baseline scope (the caller keeps its placeholder path)."""
    from doc_parser_spark.core.png import encode_png

    try:
        return encode_png(decode_tiff(data))
    except TiffError:
        return None
