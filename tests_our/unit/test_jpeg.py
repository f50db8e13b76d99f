"""Baseline JPEG codec (core/jpeg.py) units.

Real-world validation: the 18 Adobe-produced grayscale JPEGs embedded as
/DCTDecode streams in the reference's ``amt_handbook_sample.pdf`` must
decode to exactly the dimensions each image dict declares."""

import re

import numpy as np
import pytest

from doc_parser_spark.core.jpeg import JpegError, decode_jpeg, encode_jpeg

pytestmark = pytest.mark.unit


def _psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 10 * np.log10(255**2 / max(mse, 1e-12))


def test_gray_roundtrip():
    img = np.zeros((40, 56), np.uint8)
    img[:] = np.linspace(30, 220, 56, dtype=np.uint8)[None, :]
    img[10:25, 8:30] = 240
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == (40, 56)
    assert _psnr(dec, img) > 45


def test_rgb_roundtrip_444_and_420():
    yy, xx = np.mgrid[0:48, 0:40]
    img = np.dstack(
        [
            (128 + 60 * np.sin(xx / 9)).astype(np.uint8),
            (128 + 60 * np.cos(yy / 11)).astype(np.uint8),
            (128 + 40 * np.sin((xx + yy) / 14)).astype(np.uint8),
        ]
    )
    d444 = decode_jpeg(encode_jpeg(img, quality=95, subsampling="444"))
    assert d444.shape == img.shape
    assert _psnr(d444, img) > 40
    d420 = decode_jpeg(encode_jpeg(img, quality=95, subsampling="420"))
    assert d420.shape == img.shape
    assert _psnr(d420, img) > 35  # chroma subsampling loss is bounded


def test_odd_dimensions_and_flat():
    g = np.full((17, 23), 77, np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == (17, 23)
    assert _psnr(dec, g) > 50


def test_unsupported_and_corrupt():
    with pytest.raises(JpegError, match="SOI"):
        decode_jpeg(b"\x89PNG....")
    # progressive SOF2 is an explicit codec boundary
    sof2 = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    with pytest.raises(JpegError, match="unsupported"):
        decode_jpeg(sof2)
    with pytest.raises(JpegError):
        decode_jpeg(b"\xff\xd8\xff\xe0JFIF-junk")


def test_reference_embedded_adobe_jpegs():
    from doc_parser_spark.pdf.minipdf import _OBJ_RE, _STREAM_RE

    with open("/root/reference/tests/data/pdf/amt_handbook_sample.pdf", "rb") as f:
        raw = f.read()
    n = 0
    for m in _OBJ_RE.finditer(raw):
        body = m.group(3)
        if b"/DCTDecode" not in body:
            continue
        sm = _STREAM_RE.search(body)
        w = int(re.search(rb"/Width\s+(\d+)", body).group(1))
        h = int(re.search(rb"/Height\s+(\d+)", body).group(1))
        arr = decode_jpeg(sm.group(1))
        assert arr.shape == (h, w), (h, w, arr.shape)
        # plausible photographic content, not constant garbage
        assert arr.std() > 10
        n += 1
    assert n == 18
