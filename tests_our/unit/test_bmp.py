"""Native BMP codec (core/bmp.py) — closes the header-only raster waiver."""

import struct

import numpy as np
import pytest

from doc_parser_spark.core.bmp import BmpError, decode_bmp, encode_bmp


def _rgb(w, h, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_24bpp_roundtrip_with_padding():
    # w=3 -> 9-byte rows padded to 12: exercises the stride logic
    arr = _rgb(3, 5, 1)
    assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)
    arr = _rgb(4, 2, 2)  # already aligned
    assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)


def test_top_down_row_order():
    arr = _rgb(2, 2, 3)
    data = bytearray(encode_bmp(arr))
    # flip height sign -> top-down; rows must then read in file order
    h = struct.unpack_from("<i", data, 22)[0]
    struct.pack_into("<i", data, 22, -h)
    flipped = decode_bmp(bytes(data))
    assert np.array_equal(flipped, arr[::-1])


def test_8bpp_palette():
    # 2x2, palette of 3 colors, 4-byte row padding (w=2 -> stride 4)
    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    pal_bytes = b"".join(bytes((b, g, r, 0)) for r, g, b in palette)
    rows = bytes([0, 1, 0, 0]) + bytes([2, 0, 0, 0])  # bottom-up
    pix_off = 14 + 40 + len(pal_bytes)
    header = b"BM" + struct.pack("<IHHI", pix_off + len(rows), 0, 0, pix_off)
    dib = struct.pack("<IiihHIIiiII", 40, 2, 2, 1, 8, 0, len(rows), 0, 0, 3, 0)
    arr = decode_bmp(header + dib + pal_bytes + rows)
    assert arr.shape == (2, 2, 3)
    # bottom-up: file row 0 is image row 1
    assert tuple(arr[1, 0]) == (255, 0, 0) and tuple(arr[1, 1]) == (0, 255, 0)
    assert tuple(arr[0, 0]) == (0, 0, 255)


def test_1bpp_bilevel():
    # 10 px wide: two bytes per row of bits, padded to 4
    pal = bytes((0, 0, 0, 0)) + bytes((255, 255, 255, 0))
    row = bytes([0b10101010, 0b11000000, 0, 0])
    pix_off = 14 + 40 + 8
    header = b"BM" + struct.pack("<IHHI", pix_off + 4, 0, 0, pix_off)
    dib = struct.pack("<IiihHIIiiII", 40, 10, 1, 1, 1, 0, 4, 0, 0, 2, 0)
    arr = decode_bmp(header + dib + pal + row)
    assert arr.shape == (1, 10, 3)
    assert [int(p[0]) for p in arr[0]] == [255, 0, 255, 0, 255, 0, 255, 0, 255, 255]


def test_16bpp_565_bitfields():
    # one pixel, pure green in RGB565: mask 0x07E0, value 0x07E0
    pixel = struct.pack("<H", 0x07E0) + b"\x00\x00"
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    pix_off = 14 + 40 + 12
    header = b"BM" + struct.pack("<IHHI", pix_off + 4, 0, 0, pix_off)
    dib = struct.pack("<IiihHIIiiII", 40, 1, 1, 1, 16, 3, 4, 0, 0, 0, 0)
    arr = decode_bmp(header + dib + masks + pixel)
    assert tuple(arr[0, 0]) == (0, 255, 0)


def test_unsupported_and_corrupt_paths():
    with pytest.raises(BmpError, match="unsupported compression"):
        # RLE8
        dib = struct.pack("<IiihHIIiiII", 40, 2, 2, 1, 8, 1, 0, 0, 0, 0, 0)
        decode_bmp(b"BM" + struct.pack("<IHHI", 100, 0, 0, 54) + dib)
    with pytest.raises(BmpError, match="truncated"):
        arr = _rgb(4, 4)
        decode_bmp(encode_bmp(arr)[:-8])
    with pytest.raises(BmpError):
        decode_bmp(b"BMgarbage" + b"\x00" * 40)


def test_multimodal_decode_point_routes_bmp():
    from doc_parser_spark.operators.multimodal import _image_array

    arr = _rgb(6, 4, 7)
    status, decoded = _image_array(encode_bmp(arr))
    assert status == "decoded" and np.array_equal(decoded, arr)
    # RLE stays a marked codec boundary, not a crash
    dib = struct.pack("<IiihHIIiiII", 40, 2, 2, 1, 8, 1, 0, 0, 0, 0, 0)
    status, _ = _image_array(b"BM" + struct.pack("<IHHI", 100, 0, 0, 54) + dib)
    assert status == "codec_unavailable"
