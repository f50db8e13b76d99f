"""Property-based round-trip tests for the pure-Python codecs
(hypothesis; mirrors the reference suite's fuzz-adjacent style, SURVEY §5)."""

import numpy as np
import pytest
from struct import error as struct_error
from hypothesis import given, settings, strategies as st

pytestmark = pytest.mark.unit


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, c, seed):
    from doc_parser_spark.core.png import decode_png, encode_png

    arr = np.random.RandomState(seed).randint(0, 256, size=(h, w, c)).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(arr)), arr)


@settings(max_examples=30, deadline=None)
@given(
    blobs=st.lists(st.binary(min_size=0, max_size=2000), min_size=1, max_size=6),
)
def test_cfb_roundtrip_property(blobs):
    from doc_parser_spark.core.cfb import read_cfb, write_cfb

    streams = {f"S{i}": b for i, b in enumerate(blobs)}
    assert read_cfb(write_cfb(streams)) == streams


@settings(max_examples=40, deadline=None)
@given(text=st.text(min_size=0, max_size=200))
def test_hwp_para_text_plain_roundtrip(text):
    """Plain text (no control codes) survives the WCHAR decode untouched,
    including surrogate-pair (non-BMP) characters."""
    from doc_parser_spark.core.hwp_backend import decode_para_text

    clean = "".join(ch for ch in text if ord(ch) >= 32)
    assert decode_para_text(clean.encode("utf-16-le")) == clean


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_png_decoder_never_hangs_on_garbage(data):
    from doc_parser_spark.core.png import PngError, decode_png

    try:
        decode_png(b"\x89PNG\r\n\x1a\n" + data)
    except Exception as exc:  # noqa: BLE001 — must raise cleanly, not hang
        assert isinstance(exc, (PngError, ValueError, Exception))


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    n_frames=st.integers(1, 4),
    pal_bits=st.sampled_from([2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(h, w, n_frames, pal_bits, seed):
    """Index frames → encode → decode → exact palette-mapped pixels, with
    disposal=1 compositing (full-frame paints make every frame exact)."""
    from doc_parser_spark.core.gif import decode_gif, encode_gif

    rng = np.random.RandomState(seed)
    n_colors = 1 << pal_bits
    palette = rng.randint(0, 256, size=(n_colors, 3)).astype(np.uint8)
    frames = [
        (rng.randint(0, n_colors, size=(h, w)).astype(np.uint8), float(i * 10))
        for i in range(n_frames)
    ]
    gw, gh, out = decode_gif(encode_gif(frames, palette, disposal=1))
    assert (gw, gh) == (w, h) and len(out) == n_frames
    for (idx, delay), (rgb, odelay) in zip(frames, out):
        assert odelay == delay
        assert np.array_equal(rgb, palette[idx])


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_gif_decoder_never_hangs_on_garbage(data):
    from doc_parser_spark.core.gif import GifError, decode_gif

    try:
        decode_gif(b"GIF89a" + data)
    except (GifError, IndexError, ValueError, struct_error):
        pass


@settings(max_examples=30, deadline=None)
@given(
    blobs=st.lists(st.binary(min_size=1, max_size=500), min_size=1, max_size=8),
    fps=st.floats(1.0, 120.0),
)
def test_avi_roundtrip_property(blobs, fps):
    from doc_parser_spark.core.avi import build_avi, parse_avi

    usec, frames = parse_avi(build_avi(blobs, fps=fps))
    assert frames == blobs
    assert usec == int(1e6 / fps)


def test_avi_empty_chunks_are_dropped_frames():
    """Zero-length 00dc chunks are dropped-frame placeholders in real AVIs
    — the parser must skip them, not emit empty payloads."""
    from doc_parser_spark.core.avi import build_avi, parse_avi

    _, frames = parse_avi(build_avi([b"", b"\xff\xd8x", b""], fps=10.0))
    assert frames == [b"\xff\xd8x"]


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 3]),
    compression=st.sampled_from([1, 5, 32773]),
    rows_per_strip=st.integers(1, 16),
    endian=st.sampled_from(["<", ">"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_tiff_roundtrip_property(h, w, c, compression, rows_per_strip, endian, seed):
    from test_tiff import build_tiff, lzw_encode, packbits_encode

    from doc_parser_spark.core.tiff import decode_tiff

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, c), dtype=np.uint8)
    entries = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8] * c),
        (259, 3, [compression]), (262, 3, [2 if c == 3 else 1]),
        (277, 3, [c]), (278, 4, [rows_per_strip]),
    ]
    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = img[y0 : y0 + rows_per_strip].tobytes()
        if compression == 5:
            raw = lzw_encode(raw)
        elif compression == 32773:
            raw = packbits_encode(raw)
        strips.append(raw)
    out = decode_tiff(build_tiff(entries, strips, endian=endian))
    assert np.array_equal(out, img)


@settings(max_examples=120, deadline=None)
@given(
    cut=st.integers(4, 160),
    stomp_at=st.integers(0, 159),
    stomp_val=st.integers(0, 255),
    seed=st.integers(0, 2**31 - 1),
)
def test_tiff_fuzz_never_hangs_or_crashes(cut, stomp_at, stomp_val, seed):
    """Untrusted-crawl contract: truncated or bit-flipped TIFFs either
    decode or raise TiffError — never any other exception, never an
    unbounded allocation."""
    from test_tiff import build_tiff

    from doc_parser_spark.core.tiff import TiffError, decode_tiff

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (4, 6), dtype=np.uint8)
    entries = [
        (256, 4, [6]), (257, 4, [4]), (258, 3, [8]),
        (259, 3, [1]), (262, 3, [1]), (277, 3, [1]), (278, 4, [4]),
    ]
    data = bytearray(build_tiff(entries, [img.tobytes()]))
    data = data[:cut] if cut < len(data) else data
    if stomp_at < len(data):
        data[stomp_at] = stomp_val
    try:
        out = decode_tiff(bytes(data))
        assert out.dtype == np.uint8 and out.ndim == 3
    except TiffError:
        pass


@settings(max_examples=120, deadline=None)
@given(
    cut=st.integers(2, 200),
    stomp_at=st.integers(0, 199),
    stomp_val=st.integers(0, 255),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_fuzz_never_hangs_or_crashes(cut, stomp_at, stomp_val, seed):
    """Truncated or bit-flipped BMPs either decode or raise BmpError —
    never any other exception, never an unbounded allocation."""
    from doc_parser_spark.core.bmp import BmpError, decode_bmp, encode_bmp

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (3, 5, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(img))
    data = data[:cut] if cut < len(data) else data
    if stomp_at < len(data):
        data[stomp_at] = stomp_val
    try:
        out = decode_bmp(bytes(data))
        assert out.dtype == np.uint8 and out.ndim == 3
    except BmpError:
        pass


@settings(max_examples=60, deadline=None)
@given(
    cut=st.integers(2, 600),
    stomp_at=st.integers(0, 599),
    stomp_val=st.integers(0, 255),
)
def test_epub_odf_fuzz_terminates_with_known_errors(cut, stomp_at, stomp_val):
    """Mangled EPUB/ODF containers must land on the kernel's known error
    taxonomy (Epub/Odf/ValueError/BadZipFile paths map to skip/failure),
    never hang or escape with an arbitrary exception; process_document
    must always produce a status row."""
    import zipfile

    from doc_parser_spark.core.epub_backend import extract_epub
    from doc_parser_spark.core.odf_backend import extract_odf
    from doc_parser_spark.operators.extract import process_document
    from doc_parser_spark.sources import office_fixtures as fx

    for payload in (fx.make_epub(1), fx.make_odt(1)):
        data = bytearray(payload)
        data = data[:cut] if cut < len(data) else data
        if stomp_at < len(data):
            data[stomp_at] = stomp_val
        mangled = bytes(data)
        for fn in (extract_epub, extract_odf):
            try:
                fn(mangled)
            except (ValueError, zipfile.BadZipFile, KeyError, EOFError):
                pass  # ValueError covers EpubError/OdfError/BombError
        rec = process_document("u", mangled)
        assert rec["status"] in ("success", "failure", "skipped")
