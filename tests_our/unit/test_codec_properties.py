"""Property-based round-trip tests for the pure-Python codecs
(hypothesis; mirrors the reference suite's fuzz-adjacent style, SURVEY §5)."""

import numpy as np
import pytest
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
