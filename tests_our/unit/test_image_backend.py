"""Standalone image routing (reference InputFormat.IMAGE, test_backend_webp.py)."""

import struct

import pytest

from doc_parser_spark.core import model, sniff
from doc_parser_spark.core.image_backend import (
    ImageError,
    extract_image,
    image_dimensions,
    sniff_image,
)


def _png(w=13, h=7):
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    return b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 8


def _jpeg(w=21, h=9):
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"JF" + sof0 + b"\xff\xd9"


def _gif(w=31, h=17):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def _bmp(w=19, h=23):
    return (
        b"BM" + struct.pack("<IHHI", 122, 0, 0, 122)
        + struct.pack("<IiiHH", 40, w, -h, 1, 24) + b"\x00" * 24
    )


def _webp_vp8(w=160, h=120):
    body = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", w, h)
    return b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP" + b"VP8 " + struct.pack("<I", len(body)) + body


def _webp_vp8l(w=33, h=44):
    bits = (w - 1) | ((h - 1) << 14)
    return b"RIFF\x20\x00\x00\x00WEBPVP8L\x0c\x00\x00\x00\x2f" + struct.pack("<I", bits) + b"\x00" * 8


def _webp_vp8x(w=300, h=200):
    return (
        b"RIFF\x2a\x00\x00\x00WEBPVP8X\x0a\x00\x00\x00" + b"\x00" * 4
        + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little") + b"\x00" * 8
    )


def _tiff(w=55, h=66, endian="<"):
    magic = b"II*\x00" if endian == "<" else b"MM\x00*"
    ifd = struct.pack(endian + "H", 2)
    ifd += struct.pack(endian + "HHI", 256, 3, 1) + struct.pack(endian + "H", w) + b"\x00\x00"
    ifd += struct.pack(endian + "HHI", 257, 4, 1) + struct.pack(endian + "I", h)
    ifd += struct.pack(endian + "I", 0)
    return magic + struct.pack(endian + "I", 8) + ifd


@pytest.mark.parametrize(
    "payload,sub,w,h",
    [
        (_png(), "png", 13, 7),
        (_jpeg(), "jpeg", 21, 9),
        (_gif(), "gif", 31, 17),
        (_bmp(), "bmp", 19, 23),
        (_webp_vp8(), "webp", 160, 120),
        (_webp_vp8l(), "webp", 33, 44),
        (_webp_vp8x(), "webp", 300, 200),
        (_tiff(), "tiff", 55, 66),
        (_tiff(endian=">"), "tiff", 55, 66),
    ],
)
def test_image_dimensions(payload, sub, w, h):
    assert image_dimensions(payload) == (sub, w, h)
    assert sniff.sniff_format(payload) == sniff.FORMAT_IMAGE


def test_reference_webp_fixture_dimensions():
    """The reference's own committed webp input parses header-only."""
    data = open("/root/reference/tests/data/webp/webp-test.webp", "rb").read()
    sub, w, h = image_dimensions(data)
    assert sub == "webp" and w > 0 and h > 0


def test_not_images():
    # "BM" prose must not become BMP (DIB-size validation), RIFF/WAVE is audio
    assert sniff_image(b"BMW cars are popular in many countries.") is None
    assert sniff_image(b"RIFF\x24\x08\x00\x00WAVEfmt ") is None
    assert sniff.sniff_format(b"RIFF\x24\x08\x00\x00WAVEfmt ") == sniff.FORMAT_AUDIO
    with pytest.raises(ImageError):
        image_dimensions(b"plain text")


def test_extract_image_doc_shape():
    doc = extract_image(_png(13, 7))
    assert doc.page_sizes[1] == (13.0, 7.0)
    items = [n for n, _ in doc.iterate_items()]
    assert [n.label for n in items] == [model.PICTURE]
    assert items[0].bbox == (0.0, 0.0, 13.0, 7.0)


def test_extract_image_ocr_plug_point():
    cells = [
        {"text": "HELLO", "bbox": (1, 2, 11, 6)},
        {"text": "WORLD"},
    ]
    doc = extract_image(_gif(), ocr_fn=lambda payload: cells)
    texts = [n for n, _ in doc.iterate_items() if n.label == model.TEXT]
    assert [n.text for n in texts] == ["HELLO", "WORLD"]
    assert texts[0].bbox == (1.0, 2.0, 11.0, 6.0)
    assert texts[0].page_no == 1


def test_kernel_routing_image():
    from doc_parser_spark.operators.extract import process_document

    r = process_document("img1", _webp_vp8())
    assert r["format"] == "image"
    assert r["status"] == "success"
    assert r["n_pages"] == 1


def test_truncated_image_fails_isolated():
    from doc_parser_spark.operators.extract import process_document

    r = process_document("img2", b"\x89PNG\r\n\x1a\nshort")
    assert r["status"] == "failure"
