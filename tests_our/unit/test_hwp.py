"""HWP v5 direct reader: CFB container round-trip + record/text decode.

Fixtures are synthesized with `core/cfb.write_cfb` following the published
HWP 5.0 layout (FileHeader signature + property bits, deflated
BodyText/Section streams of tagged records)."""

import struct
import zlib

import pytest

from doc_parser_spark.core import model
from doc_parser_spark.core.cfb import read_cfb, write_cfb
from doc_parser_spark.core.hwp_backend import (
    HwpError,
    decode_para_text,
    extract_hwp,
    is_hwp,
    iter_records,
)

pytestmark = pytest.mark.unit


def _rec(tag: int, payload: bytes, level: int = 0) -> bytes:
    if len(payload) < 0xFFF:
        return struct.pack("<I", tag | (level << 10) | (len(payload) << 20)) + payload
    return (
        struct.pack("<I", tag | (level << 10) | (0xFFF << 20))
        + struct.pack("<I", len(payload))
        + payload
    )


def _para_text(s: str) -> bytes:
    return _rec(67, s.encode("utf-16-le"))


def _file_header(compressed: bool = True) -> bytes:
    sig = b"HWP Document File" + b"\x00" * 15
    return sig + struct.pack("<II", 0x05000300, 1 if compressed else 0) + b"\x00" * 216


def make_hwp(paragraphs_by_section, compressed: bool = True) -> bytes:
    streams = {"FileHeader": _file_header(compressed)}
    for i, paras in enumerate(paragraphs_by_section):
        body = b"".join(
            _rec(66, b"\x00" * 8) + _para_text(p) for p in paras
        )
        if compressed:
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            body = co.compress(body) + co.flush()
        streams[f"BodyText/Section{i}"] = body
    return write_cfb(streams)


def test_cfb_roundtrip():
    streams = {"A": b"hello", "B": b"x" * 1300, "C": b""}
    data = write_cfb(streams)
    back = read_cfb(data)
    assert back["A"] == b"hello"
    assert back["B"] == b"x" * 1300
    assert back["C"] == b""


def test_record_framing_and_extended_size():
    big = b"\x41\x00" * 3000  # 6000 bytes > 0xFFF
    stream = _rec(66, b"\x00" * 8) + _rec(67, big)
    recs = list(iter_records(stream))
    assert [t for t, _, _ in recs] == [66, 67]
    assert recs[1][2] == big


def test_decode_para_text_controls():
    # "AB<tab+7 filler>C<extended control 11 + 7 filler><CR>D"
    chars = [65, 66, 9, 0, 0, 0, 0, 0, 0, 0, 67, 11, 0, 0, 0, 0, 0, 0, 0, 13, 68]
    payload = struct.pack(f"<{len(chars)}H", *chars)
    assert decode_para_text(payload) == "AB C\nD"


def test_extract_hwp_end_to_end():
    hwp = make_hwp([["첫 문단입니다.", "둘째 문단"], ["second section"]])
    assert is_hwp(hwp)
    doc = extract_hwp(hwp)
    texts = [n.text for n, _ in doc.iterate_items()]
    assert texts == ["첫 문단입니다.", "둘째 문단", "second section"]
    assert all(n.label == model.TEXT for n, _ in doc.iterate_items())


def test_extract_hwp_uncompressed():
    hwp = make_hwp([["plain body"]], compressed=False)
    assert [n.text for n, _ in extract_hwp(hwp).iterate_items()] == ["plain body"]


def test_non_hwp_cfb_rejected():
    data = write_cfb({"WordDocument": b"\x00" * 64})
    assert not is_hwp(data)
    with pytest.raises(HwpError):
        extract_hwp(data)


def test_kernel_routing():
    from doc_parser_spark.core import sniff
    from doc_parser_spark.operators.extract import convert_payload

    hwp = make_hwp([["문단"]])
    assert sniff.sniff_format(hwp) == sniff.FORMAT_CFB
    doc, fmt, _fb = convert_payload(hwp)
    assert fmt == "hwp"
    assert [n.text for n, _ in doc.iterate_items()] == ["문단"]
    from doc_parser_spark.operators.extract import UnsupportedFormatError

    # WordDocument containers route to the legacy .doc reader now; a
    # malformed one degrades to UnsupportedFormatError (skipped row),
    # and a truly unknown OLE2 payload does too
    with pytest.raises(UnsupportedFormatError, match="too short"):
        convert_payload(write_cfb({"WordDocument": b"\x00" * 16}))
    with pytest.raises(UnsupportedFormatError, match="unrecognized OLE2"):
        convert_payload(write_cfb({"Mystery": b"\x00" * 16}))


def test_truncated_section_stream_fails_not_partial():
    """A compressed section whose deflate stream is cut off must FAIL the
    document (HwpError) — not silently succeed with missing paragraphs."""
    import pytest

    from doc_parser_spark.core.cfb import write_cfb
    from doc_parser_spark.core.hwp_backend import HwpError, extract_hwp

    import zlib as _z

    streams = {"FileHeader": _file_header(True)}
    body = _rec(0x43, _para_text("only paragraph in this section"))
    comp = _z.compress(body)[2:-4]  # raw deflate
    streams["BodyText/Section0"] = comp[: len(comp) // 2]  # truncate
    blob = write_cfb(streams)
    with pytest.raises(HwpError, match="corrupt section stream"):
        extract_hwp(blob)
