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
    # a progressive frame header with no scan data must error, not
    # return an all-gray image
    sof2 = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    with pytest.raises(JpegError, match="no scans"):
        decode_jpeg(sof2)
    # hierarchical / lossless SOFs stay an explicit boundary
    sof3 = b"\xff\xd8\xff\xc3\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    with pytest.raises(JpegError, match="unsupported"):
        decode_jpeg(sof3)
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


# -- progressive (SOF2) -------------------------------------------------------


def _gradient(h, w, color):
    y, x = np.mgrid[0:h, 0:w]
    base = ((x * 255 // max(w - 1, 1)) + y * 2) % 256
    if color:
        return np.stack([base, 255 - base, (x * y) % 256], 2).astype(np.uint8)
    return base.astype(np.uint8)


@pytest.mark.parametrize(
    "h,w,color,subs",
    [(16, 16, False, "444"), (24, 40, True, "444"), (37, 53, True, "420"),
     (8, 8, False, "444"), (64, 64, True, "420")],
)
def test_progressive_decode_matches_baseline(h, w, color, subs):
    """Progressive and baseline encodes share _encoder_setup, so they
    quantize to identical coefficients — decoding the progressive stream
    (spectral selection + successive approximation + EOB runs) must give
    bit-identical pixels to decoding the baseline stream. A symmetric
    entropy-layer bug cannot hide here: the baseline decode path never
    touches the progressive scan machinery."""
    from doc_parser_spark.core.jpeg import encode_jpeg_progressive

    a = _gradient(h, w, color)
    d_base = decode_jpeg(encode_jpeg(a, quality=85, subsampling=subs))
    d_prog = decode_jpeg(encode_jpeg_progressive(a, quality=85, subsampling=subs))
    assert np.array_equal(d_base, d_prog)


@pytest.mark.parametrize("dri", [1, 3])
def test_progressive_restart_intervals(dri):
    from doc_parser_spark.core.jpeg import encode_jpeg_progressive

    a = _gradient(33, 29, True)
    d_base = decode_jpeg(encode_jpeg(a, quality=75, subsampling="420"))
    d_prog = decode_jpeg(
        encode_jpeg_progressive(a, quality=75, subsampling="420", restart_interval=dri)
    )
    assert np.array_equal(d_base, d_prog)


def test_progressive_noise_and_flat():
    """Noise maximizes AC symbol diversity (ZRL, long runs); flat images
    maximize EOB runs across blocks — the two EOBRUN-heavy extremes."""
    from doc_parser_spark.core.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, (41, 23, 3)).astype(np.uint8)
    flat = np.full((40, 56), 137, np.uint8)
    for a, subs in ((noise, "444"), (flat, "444")):
        d_base = decode_jpeg(encode_jpeg(a, quality=50, subsampling=subs))
        d_prog = decode_jpeg(encode_jpeg_progressive(a, quality=50, subsampling=subs))
        assert np.array_equal(d_base, d_prog)


def test_progressive_truncated_mid_scan_raises_or_degrades():
    """Cutting the stream mid-scan must raise JpegError (invalid Huffman
    path) — never a non-JpegError exception escaping to callers."""
    from doc_parser_spark.core.jpeg import encode_jpeg_progressive

    a = _gradient(32, 32, True)
    full = encode_jpeg_progressive(a, quality=85)
    cut = full[: len(full) // 2]
    try:
        decode_jpeg(cut)
    except JpegError:
        pass  # acceptable: classified as corrupt
    # also acceptable: decodes the scans that completed (progressive
    # degradation) — any other exception type would have propagated
