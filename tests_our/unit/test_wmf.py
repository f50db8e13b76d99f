"""Native WMF rasterizer (core/wmf.py) + HWPX picture extraction.

The reference converts HWPX BinData WMF pictures with ImageMagick/Wand
(hwpx_backend.py:1173-1197) and drops them when Wand is missing; here
the MS-WMF record walk is decoded natively, so WMF pictures survive
without any external binary. TIFF BinData stays a documented waiver."""

import io
import struct
import zipfile

import numpy as np

from doc_parser_spark.core import model, wmf
from doc_parser_spark.core.office_backends import extract_hwpx
from doc_parser_spark.core.png import decode_png


def _rec(func: int, *params: int) -> bytes:
    body = struct.pack(f"<{len(params)}h", *params)
    return struct.pack("<IH", (6 + len(body)) // 2, func) + body


def _urec(func: int, *params: int) -> bytes:
    body = struct.pack(f"<{len(params)}H", *params)
    return struct.pack("<IH", (6 + len(body)) // 2, func) + body


def _wmf(records: list[bytes], bbox=(0, 0, 100, 80), inch=96) -> bytes:
    l, t, r, b = bbox
    placeable = struct.pack(
        "<IHhhhhHIH", wmf.PLACEABLE_KEY, 0, l, t, r, b, inch, 0, 0
    )
    body = b"".join(records) + _rec(0x0000)
    n_words = (18 + len(body)) // 2
    header = struct.pack("<HHHIHIH", 2, 9, 0x0300, n_words, 0, 0, 0)
    return placeable + header + body


def _bmp_24(w: int, h: int, rgb) -> bytes:
    """Minimal bottom-up 24-bit BMP."""
    stride = ((w * 3 + 3) // 4) * 4
    rows = b""
    for y in range(h - 1, -1, -1):
        row = b"".join(
            bytes([rgb[y][x][2], rgb[y][x][1], rgb[y][x][0]])
            for x in range(w)
        )
        rows += row + b"\x00" * (stride - len(row))
    dib = struct.pack("<IiihhIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
    filehdr = struct.pack("<2sIHHI", b"BM", 14 + len(dib) + len(rows), 0, 0, 14 + len(dib))
    return filehdr + dib + rows


def test_decode_bmp_roundtrip():
    px = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (7, 8, 9)]]
    arr = wmf.decode_bmp(_bmp_24(2, 2, px))
    assert arr.shape == (2, 2, 3)
    assert arr.tolist() == [list(map(list, r)) for r in px]


def test_is_wmf_sniff():
    assert wmf.is_wmf(_wmf([]))
    assert wmf.is_wmf(_wmf([])[22:])  # standard (non-placeable) header
    assert not wmf.is_wmf(b"\x89PNG\r\n\x1a\nxxxxxxxxxxxxxx")
    assert not wmf.is_wmf(b"BM" + b"\x00" * 30)


def test_rectangle_fill_and_pen():
    records = [
        _urec(0x02FC, 0, 0x00FF, 0x0000),  # solid red brush (BGR 0x0000FF)
        _rec(0x012D, 0),  # select brush
        _rec(0x041B, 60, 80, 20, 10),  # RECTANGLE b=60 r=80 t=20 l=10
    ]
    arr = wmf.decode_wmf(_wmf(records))
    assert arr.shape == (80, 100, 3)
    assert (arr[40, 45] == [255, 0, 0]).all()  # inside: red
    assert (arr[5, 5] == [255, 255, 255]).all()  # outside: white


def test_polygon_fill_even_odd():
    records = [
        _urec(0x02FC, 0, 0xFF00, 0x0000),  # green brush (0x00FF00)
        _rec(0x012D, 0),
        _rec(0x0324, 3, 50, 10, 90, 70, 10, 70),  # triangle
    ]
    arr = wmf.decode_wmf(_wmf(records))
    assert (arr[50, 50] == [0, 255, 0]).all()  # centroid inside
    assert (arr[15, 15] == [255, 255, 255]).all()  # corner outside


def test_lines_and_window_ext_fallback():
    # no placeable header: SETWINDOWEXT drives the canvas size
    records = [
        _rec(0x020B, 0, 0),  # SETWINDOWORG (y, x)
        _rec(0x020C, 40, 60),  # SETWINDOWEXT (h, w)
        _rec(0x0214, 5, 5),  # MOVETO (y, x)
        _rec(0x0213, 35, 55),  # LINETO
    ]
    data = _wmf(records)[22:]  # strip placeable header
    arr = wmf.decode_wmf(data)
    assert arr.shape == (40, 60, 3)
    assert (arr[20, 30] == [0, 0, 0]).all()  # default black pen on diagonal


def test_stretchdib_pastes_embedded_image():
    bmp = _bmp_24(2, 2, [[(10, 20, 30)] * 2, [(10, 20, 30)] * 2])
    dib = bmp[14:]
    params = struct.pack(
        "<hhh8h", 0x20, 0xCC, 0, 2, 2, 0, 0, 80, 100, 0, 0
    ) + dib
    rec = struct.pack("<IH", (6 + len(params)) // 2, 0x0F43) + params
    arr = wmf.decode_wmf(_wmf([rec]))
    assert (arr[40, 50] == [10, 20, 30]).all()
    assert (arr[0, 0] == [10, 20, 30]).all()


def test_wmf_to_png_roundtrip_and_garbage():
    png = wmf.wmf_to_png(_wmf([_rec(0x041B, 60, 80, 20, 10)]))
    assert png is not None and png[:8] == b"\x89PNG\r\n\x1a\n"
    arr = decode_png(png)
    assert arr.shape[0] == 80 and arr.shape[1] == 100
    assert wmf.wmf_to_png(b"not a wmf at all") is None
    assert wmf.wmf_to_png(_wmf([])[:30]) is None  # truncated


# -- HWPX picture extraction ----------------------------------------------------

_NS = (
    'xmlns:hs="http://www.hancom.co.kr/hwpml/2011/section" '
    'xmlns:hp="http://www.hancom.co.kr/hwpml/2011/paragraph" '
    'xmlns:hc="http://www.hancom.co.kr/hwpml/2011/core"'
)


def _hwpx_with_image(ext: str, blob: bytes) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/hwp+zip")
        zf.writestr("Contents/content.hpf", "<package/>")
        zf.writestr(f"BinData/image1{ext}", blob)
        zf.writestr(
            "Contents/section0.xml",
            f'<?xml version="1.0"?>\n<hs:sec {_NS}>'
            "<hp:p><hp:run><hp:t>본문</hp:t>"
            '<hp:pic><hc:img binaryItemIDRef="image1"/></hp:pic>'
            "</hp:run></hp:p></hs:sec>",
        )
    return buf.getvalue()


def test_hwpx_wmf_picture_extracted():
    blob = _wmf([_urec(0x02FC, 0, 0x00FF, 0x0000), _rec(0x012D, 0),
                 _rec(0x041B, 60, 80, 20, 10)])
    doc = extract_hwpx(_hwpx_with_image(".wmf", blob))
    pics = [n for n in doc.nodes if n.label == model.PICTURE]
    assert len(pics) == 1
    meta = pics[0].image_meta
    assert meta["mimetype"] == "image/png"
    assert meta["size"] == {"width": 100.0, "height": 80.0}
    assert meta["uri"].startswith("data:image/png;base64,")
    # body text still extracted alongside the picture
    assert any(n.text == "본문" for n in doc.nodes)


def test_hwpx_bmp_picture_extracted():
    blob = _bmp_24(3, 2, [[(1, 2, 3)] * 3, [(4, 5, 6)] * 3])
    doc = extract_hwpx(_hwpx_with_image(".bmp", blob))
    pics = [n for n in doc.nodes if n.label == model.PICTURE]
    assert len(pics) == 1
    assert pics[0].image_meta["size"] == {"width": 3.0, "height": 2.0}


def test_hwpx_tiff_dropped_as_documented_waiver():
    doc = extract_hwpx(_hwpx_with_image(".tif", b"II*\x00" + b"\x00" * 32))
    assert [n for n in doc.nodes if n.label == model.PICTURE] == []
    assert any(n.text == "본문" for n in doc.nodes)


def test_hwpx_corrupt_wmf_dropped_not_fatal():
    doc = extract_hwpx(_hwpx_with_image(".wmf", b"\xd7\xcd\xc6\x9a" + b"\xff" * 10))
    assert [n for n in doc.nodes if n.label == model.PICTURE] == []
    assert any(n.text == "본문" for n in doc.nodes)
