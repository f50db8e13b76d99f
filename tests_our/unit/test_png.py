"""PNG codec (core/png.py) and page rasterizer (pdf/render.py) units."""

import struct
import zlib

import numpy as np
import pytest

from doc_parser_spark.core.png import (
    SIGNATURE,
    PngError,
    decode_png,
    encode_png,
    resize_nearest,
)

pytestmark = pytest.mark.unit


def test_roundtrip_gray_rgb_rgba():
    rng = np.random.RandomState(7)
    for shape in [(5, 9), (6, 4, 3), (3, 3, 4)]:
        arr = rng.randint(0, 256, size=shape).astype(np.uint8)
        out = decode_png(encode_png(arr))
        expect = arr[:, :, None] if arr.ndim == 2 else arr
        assert out.shape == expect.shape
        assert np.array_equal(out, expect)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _apply_filter(ftype, cur, prev, bpp):
    """Forward-filter one scanline (PNG spec §9) to test the decoder's
    inverse."""
    out = [ftype]
    for x in range(len(cur)):
        left = cur[x - bpp] if x >= bpp else 0
        up = prev[x]
        ul = prev[x - bpp] if x >= bpp else 0
        if ftype == 0:
            v = cur[x]
        elif ftype == 1:
            v = cur[x] - left
        elif ftype == 2:
            v = cur[x] - up
        elif ftype == 3:
            v = cur[x] - ((left + up) >> 1)
        else:  # Paeth
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            v = cur[x] - pred
        out.append(v & 0xFF)
    return bytes(out)


def test_decode_all_filters():
    rng = np.random.RandomState(11)
    arr = rng.randint(0, 256, size=(5, 4, 3)).astype(np.uint8)
    h, w, c = arr.shape
    rows = arr.reshape(h, w * c)
    raw = b""
    prev = [0] * (w * c)
    for y in range(h):
        cur = rows[y].tolist()
        raw += _apply_filter(y % 5, cur, prev, c)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), arr)


def test_decode_palette():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    data = (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", palette.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), palette[idx])


def test_errors():
    with pytest.raises(PngError):
        decode_png(b"\xff\xd8\xff\xe0 jpeg")
    with pytest.raises(PngError):
        encode_png(np.zeros((3, 3), np.float64))
    arr = np.zeros((4, 4), np.uint8)
    truncated = encode_png(arr)[:40]
    with pytest.raises((PngError, Exception)):
        decode_png(truncated)


def test_resize_nearest():
    arr = np.arange(24, dtype=np.uint8).reshape(4, 6)
    up = resize_nearest(arr, 12, 8)
    assert up.shape == (8, 12)
    down = resize_nearest(arr, 3, 2)
    assert down.shape == (2, 3)
    assert np.array_equal(down, arr[::2, ::2])


def test_render_and_crop_geometry():
    from doc_parser_spark.pdf.minipdf import parse_pdf
    from doc_parser_spark.pdf.render import crop_region, render_page
    from doc_parser_spark.pdf import writer

    pdf = writer.write_pdf([[(72, 700, 12, "Ink here")]])
    page = parse_pdf(pdf)[0]
    img = render_page(page, scale=1.0)
    assert img.shape == (round(page.height), round(page.width))
    cell = page.cells[0]
    h, w = img.shape
    # ink lands inside the cell bbox; an empty corner stays background
    box = img[int(cell.t) : int(cell.b) + 1, int(cell.l) : int(cell.r) + 1]
    assert box.min() < 255
    corner = crop_region(img, 0.0, 0.0, 0.05, 0.05)
    assert corner.min() == 255
    # crop of the cell's normalized bbox contains all the ink
    crop = crop_region(
        img, cell.l / page.width, cell.t / page.height,
        cell.r / page.width, cell.b / page.height,
    )
    assert crop.min() == box.min()
    # determinism + content sensitivity
    assert np.array_equal(render_page(page, scale=1.0), img)
    pdf2 = writer.write_pdf([[(72, 700, 12, "Ink herf")]])
    img2 = render_page(parse_pdf(pdf2)[0], scale=1.0)
    assert not np.array_equal(img2, img)
