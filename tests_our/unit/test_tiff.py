"""Native baseline-TIFF decoder tests.

Fixtures are built by a minimal in-test TIFF writer (both byte orders,
strips, PackBits, LZW). The test LZW encoder chooses code widths by
*simulating the decoder's table growth* — the early-change bookkeeping
of TIFF6 §13 / libtiff (width bumps when the decoder's table reaches
2^width - 1 entries), so a stream is valid iff the codec implements the
spec rule, not merely whatever the encoder does.
"""

import struct

import numpy as np
import pytest

from doc_parser_spark.core.tiff import TiffError, decode_tiff, is_tiff, tiff_to_png


def build_tiff(entries, strips, endian="<"):
    """entries: [(tag, type_code, [values])]; strips: [bytes]. Strip
    offset/count tags are appended automatically."""
    header = b"II*\x00" if endian == "<" else b"MM\x00*"
    body = bytearray(header + b"\x00\x00\x00\x00")
    offsets = []
    for s in strips:
        offsets.append(len(body))
        body += s
    entries = list(entries) + [
        (273, 4, offsets),
        (279, 4, [len(s) for s in strips]),
    ]
    entries.sort()
    ifd_off = len(body)
    struct.pack_into(endian + "I", body, 4, ifd_off)
    n = len(entries)
    extra_off = ifd_off + 2 + 12 * n + 4
    ifd = bytearray(struct.pack(endian + "H", n))
    extra = bytearray()
    sizes = {3: 2, 4: 4}
    fmts = {3: "H", 4: "I"}
    for tag, typ, vals in entries:
        raw = struct.pack(endian + fmts[typ] * len(vals), *vals)
        ent = struct.pack(endian + "HHI", tag, typ, len(vals))
        if len(raw) <= 4:
            ent += raw + b"\x00" * (4 - len(raw))
        else:
            ent += struct.pack(endian + "I", extra_off + len(extra))
            extra += raw
        ifd += ent
    ifd += b"\x00\x00\x00\x00"  # no next IFD
    return bytes(body) + bytes(ifd) + bytes(extra)


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + 1
            while (
                j < len(data)
                and (j + 1 >= len(data) or data[j + 1] != data[j])
                and j - i < 128
            ):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out)


class _BitWriter:
    def __init__(self):
        self.buf = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, code, width):
        self.buf = (self.buf << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.out.append((self.buf >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8

    def flush(self):
        if self.nbits:
            self.out.append((self.buf << (8 - self.nbits)) & 0xFF)
            self.nbits = 0
        return bytes(self.out)


def lzw_encode(data: bytes) -> bytes:
    w = _BitWriter()
    width = 9
    dec_len = 258
    since_clear = 0

    def emit(code):
        nonlocal width, dec_len, since_clear
        w.write(code, width)
        since_clear += 1
        if since_clear >= 2:
            dec_len += 1
        if dec_len + 1 >= (1 << width) and width < 12:
            width += 1

    w.write(256, width)  # clear (decoder does not append on it)
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    cur = b""
    for ch in data:
        nxt = cur + bytes([ch])
        if nxt in table:
            cur = nxt
        else:
            emit(table[cur])
            table[nxt] = next_code
            next_code += 1
            cur = bytes([ch])
    if cur:
        emit(table[cur])
    w.write(257, width)  # EOI
    return w.flush()


def _gray_entries(width, height, rows_per_strip, compression=1, extra=()):
    return [
        (256, 4, [width]), (257, 4, [height]), (258, 3, [8]),
        (259, 3, [compression]), (262, 3, [1]), (277, 3, [1]),
        (278, 4, [rows_per_strip]),
    ] + list(extra)


def test_gray_uncompressed_roundtrip():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (5, 9), dtype=np.uint8)
    data = build_tiff(_gray_entries(9, 5, 5), [img.tobytes()])
    assert is_tiff(data)
    out = decode_tiff(data)
    assert out.shape == (5, 9, 1)
    assert np.array_equal(out[:, :, 0], img)


def test_rgb_multi_strip_big_endian():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (6, 4, 3), dtype=np.uint8)
    strips = [img[i : i + 2].tobytes() for i in range(0, 6, 2)]
    entries = [
        (256, 4, [4]), (257, 4, [6]), (258, 3, [8, 8, 8]),
        (259, 3, [1]), (262, 3, [2]), (277, 3, [3]), (278, 4, [2]),
    ]
    out = decode_tiff(build_tiff(entries, strips, endian=">"))
    assert np.array_equal(out, img)


def test_packbits_strip():
    img = np.repeat(np.arange(8, dtype=np.uint8)[None, :] * 30, 4, axis=0)
    img[2, :] = 200  # a run for packbits to exploit
    strips = [packbits_encode(img[i : i + 2].tobytes()) for i in (0, 2)]
    data = build_tiff(_gray_entries(8, 4, 2, compression=32773), strips)
    assert np.array_equal(decode_tiff(data)[:, :, 0], img)


def test_lzw_gray_and_predictor():
    rng = np.random.RandomState(3)
    # low-entropy image so LZW actually builds table entries across widths
    img = (rng.randint(0, 4, (16, 64), dtype=np.uint8) * 5).astype(np.uint8)
    data = build_tiff(_gray_entries(64, 16, 16, compression=5), [lzw_encode(img.tobytes())])
    assert np.array_equal(decode_tiff(data)[:, :, 0], img)
    # predictor 2: encode horizontal differences mod 256
    diff = img.astype(np.int16)
    diff[:, 1:] = (diff[:, 1:] - diff[:, :-1]) % 256
    diff = diff.astype(np.uint8)
    data2 = build_tiff(
        _gray_entries(64, 16, 16, compression=5, extra=[(317, 3, [2])]),
        [lzw_encode(diff.tobytes())],
    )
    assert np.array_equal(decode_tiff(data2)[:, :, 0], img)


def test_lzw_code_width_transitions():
    """Enough distinct material to push the table past 511 and 1023
    entries — exercises both early-change width bumps."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (40, 80), dtype=np.uint8)
    data = build_tiff(_gray_entries(80, 40, 40, compression=5), [lzw_encode(img.tobytes())])
    assert np.array_equal(decode_tiff(data)[:, :, 0], img)


def test_bilevel_white_is_zero():
    # 1-bit, WhiteIsZero: bit 0 -> white (255), bit 1 -> black (0)
    rows = np.array(
        [[0, 1, 1, 0, 1, 0, 0, 1, 1, 0], [1] * 10, [0] * 10], dtype=np.uint8
    )
    packed = np.packbits(rows, axis=1).tobytes()
    entries = [
        (256, 4, [10]), (257, 4, [3]), (258, 3, [1]),
        (259, 3, [1]), (262, 3, [0]), (277, 3, [1]), (278, 4, [3]),
    ]
    out = decode_tiff(build_tiff(entries, [packed]))
    assert np.array_equal(out[:, :, 0], (1 - rows) * 255)


def test_palette_4bit():
    idx = np.array([[0, 1, 2, 3, 3], [3, 2, 1, 0, 0]], dtype=np.uint8)
    # pack two 4-bit samples per byte, rows padded to whole bytes
    packed = bytearray()
    for r in idx:
        row = bytearray()
        for i in range(0, len(r), 2):
            hi = r[i] << 4
            lo = r[i + 1] if i + 1 < len(r) else 0
            row.append(hi | lo)
        packed += row
    cmap = [0] * 48
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
    for i, (r, g, b) in enumerate(colors):
        cmap[i] = r << 8
        cmap[16 + i] = g << 8
        cmap[32 + i] = b << 8
    entries = [
        (256, 4, [5]), (257, 4, [2]), (258, 3, [4]),
        (259, 3, [1]), (262, 3, [3]), (277, 3, [1]), (278, 4, [2]),
        (320, 3, cmap),
    ]
    out = decode_tiff(build_tiff(entries, [bytes(packed)]))
    expect = np.array([[colors[v] for v in row] for row in idx], dtype=np.uint8)
    assert np.array_equal(out, expect)


def test_corrupt_and_unsupported():
    with pytest.raises(TiffError):
        decode_tiff(b"NOTATIFF")
    img = np.zeros((2, 2), dtype=np.uint8)
    good = build_tiff(_gray_entries(2, 2, 2), [img.tobytes()])
    with pytest.raises(TiffError):
        decode_tiff(good[:20])  # truncated IFD
    huge = build_tiff(_gray_entries(100000, 100000, 2), [img.tobytes()])
    with pytest.raises(TiffError, match="dimensions"):
        decode_tiff(huge)
    tiled = build_tiff(
        [(256, 4, [2]), (257, 4, [2]), (258, 3, [16]),
         (259, 3, [1]), (262, 3, [1]), (277, 3, [1]), (278, 4, [2])],
        [img.tobytes()],
    )
    with pytest.raises(TiffError, match="unsupported"):
        decode_tiff(tiled)  # 16-bit samples out of baseline scope
    short = build_tiff(_gray_entries(4, 4, 4), [b"\x00" * 3])
    with pytest.raises(TiffError):
        decode_tiff(short)


def test_tiff_to_png_and_operator_dispatch():
    from doc_parser_spark.core.png import decode_png
    from doc_parser_spark.operators.multimodal import _image_array

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (3, 7, 3), dtype=np.uint8)
    entries = [
        (256, 4, [7]), (257, 4, [3]), (258, 3, [8, 8, 8]),
        (259, 3, [1]), (262, 3, [2]), (277, 3, [3]), (278, 4, [3]),
    ]
    data = build_tiff(entries, [img.tobytes()])
    png = tiff_to_png(data)
    assert png is not None and np.array_equal(decode_png(png), img)
    assert tiff_to_png(b"II*\x00garbage") is None
    status, arr = _image_array(data)
    assert status == "decoded" and np.array_equal(arr, img)


def test_out_of_scope_reports_codec_unavailable_not_corrupt():
    from doc_parser_spark.operators.multimodal import _image_array

    img16 = np.zeros((2, 2, 3), dtype=np.uint8)
    entries = [
        (256, 4, [2]), (257, 4, [2]), (258, 3, [16, 16, 16]),
        (259, 3, [1]), (262, 3, [2]), (277, 3, [3]), (278, 4, [2]),
    ]
    data = build_tiff(entries, [img16.tobytes()])
    status, arr = _image_array(data)
    assert status == "codec_unavailable" and arr is None
