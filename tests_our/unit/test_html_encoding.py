"""WHATWG-style HTML encoding sniffing (html/encoding.py).

The reference hands raw bytes to BeautifulSoup whose UnicodeDammit
resolves BOM → declared charset → trial decodes
(docling/backend/html_backend.py:75); these tests pin the same
contract on real non-UTF-8 byte payloads, which no UTF-8-only fixture
exercises.
"""

import pytest

from doc_parser_spark.html.dom import parse_html
from doc_parser_spark.html.encoding import (
    decode_html,
    sniff_encoding,
    sniff_encoding_detail,
)

pytestmark = pytest.mark.unit


def test_bom_utf8():
    data = "<html><body>café</body></html>".encode("utf-8-sig")
    assert sniff_encoding(data) == "utf-8-sig"
    # BOM must not leak into the decoded text
    assert decode_html(data).startswith("<html>")


def test_bom_utf16_both_orders():
    for codec in ("utf-16-le", "utf-16-be"):
        body = "<html><body>café 日本</body></html>"
        data = (b"\xff\xfe" if codec == "utf-16-le" else b"\xfe\xff") + body.encode(codec)
        # the endian-detecting codec, so the decode CONSUMES the BOM
        assert sniff_encoding(data) == "utf-16"
        text = decode_html(data)
        assert "café 日本" in text
        assert not text.startswith("﻿")  # BOM never reaches the DOM


def test_meta_charset_shift_jis():
    body = "<html><head><meta charset=Shift_JIS></head><body>日本語</body></html>"
    data = body.encode("shift_jis")
    assert sniff_encoding(data) == "shift_jis"
    assert "日本語" in decode_html(data)


def test_http_equiv_content_type_euc_kr():
    body = (
        '<html><head><meta http-equiv="Content-Type" '
        'content="text/html; charset=euc-kr"></head>'
        "<body>한국어</body></html>"
    )
    data = body.encode("euc-kr")
    assert sniff_encoding(data) == "euc-kr"
    assert "한국어" in decode_html(data)


def test_meta_charset_gb2312_maps_to_gbk():
    body = '<meta charset="gb2312"><p>中文网页</p>'
    data = body.encode("gbk")
    assert sniff_encoding(data) == "gbk"
    assert "中文网页" in decode_html(data)


def test_latin1_label_upgraded_to_windows_1252():
    # WHATWG maps the iso-8859-1 label family onto windows-1252: byte
    # 0x97 is an em dash there but a C1 control in real iso-8859-1
    data = b'<meta charset="iso-8859-1"><p>a \x97 b caf\xe9</p>'
    assert sniff_encoding(data) == "windows-1252"
    text = decode_html(data)
    assert "a — b" in text and "café" in text


def test_xml_declaration_encoding():
    body = '<?xml version="1.0" encoding="windows-1251"?><html><body>русский</body></html>'
    data = body.encode("windows-1251")
    assert sniff_encoding(data) == "windows-1251"
    assert "русский" in decode_html(data)


def test_undeclared_valid_utf8_stays_utf8():
    data = "<html><body>café — 日本</body></html>".encode("utf-8")
    assert sniff_encoding(data) == "utf-8"
    assert "café — 日本" in decode_html(data)


def test_undeclared_legacy_falls_back_windows_1252():
    data = b"<html><body>caf\xe9 \x93quoted\x94</body></html>"  # cp1252 bytes
    assert sniff_encoding(data) == "windows-1252"
    text = decode_html(data)
    assert "café" in text and "“quoted”" in text


def test_declared_utf16_decoded_as_utf8():
    # the ASCII prescan read the tag, so content cannot be UTF-16 —
    # WHATWG says treat the label as UTF-8
    data = '<meta charset="utf-16"><p>ok café</p>'.encode("utf-8")
    assert sniff_encoding(data) == "utf-8"
    assert "ok café" in decode_html(data)


def test_unknown_label_falls_through_to_trial():
    data = '<meta charset="klingon-7"><p>café</p>'.encode("utf-8")
    assert sniff_encoding(data) == "utf-8"


def test_malformed_under_declared_encoding_replaces_not_raises():
    # declares shift_jis but contains an invalid lead byte sequence
    data = b'<meta charset="shift_jis"><p>ok \x85\xff\xff end</p>'
    text = decode_html(data)
    assert "ok" in text and "end" in text  # page survived


def test_prescan_window_is_1024_bytes():
    # declaration beyond 1024 bytes is ignored (WHATWG prescan bound);
    # pure-ASCII body decodes as utf-8 via the trial step
    filler = b"<!-- " + b"x" * 1100 + b" -->"
    data = filler + b'<meta charset="shift_jis"><p>abc</p>'
    assert sniff_encoding(data) == "utf-8"


def test_parse_html_bytes_uses_sniffer():
    body = "<html><head><meta charset=Shift_JIS></head><body><p>日本語</p></body></html>"
    root = parse_html(body.encode("shift_jis"))
    assert "日本語" in root.text


def test_parse_html_explicit_encoding_still_honored():
    root = parse_html("café".encode("windows-1252"), encoding="windows-1252")
    assert "café" in root.text


# --- properties over arbitrary payloads -----------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=4096))
def test_decode_html_total_on_arbitrary_bytes(data):
    # never raises, always a str, and agrees with the two-step path
    from doc_parser_spark.html.encoding import _decode_windows_1252

    text = decode_html(data)
    assert isinstance(text, str)
    enc, _src = sniff_encoding_detail(data)
    if enc == "windows-1252":  # WHATWG-total decode, gap bytes → C1
        assert text == _decode_windows_1252(data)
    else:
        assert text == data.decode(enc, errors="replace")


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=512))
def test_undeclared_utf8_round_trips(s):
    # any text WITHOUT a declaration/BOM survives a UTF-8 encode→decode
    # byte-exactly (the parity-critical invariant for existing fixtures)
    data = s.encode("utf-8")
    if data[:3] == b"\xef\xbb\xbf" or data[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return  # text that starts with a BOM-shaped prefix is the BOM case
    if b"charset" in data[:1024].lower() or b"<?xml" in data[:1024].lower():
        return  # may legitimately declare something else
    assert decode_html(data) == s


def test_charset_in_unrelated_attribute_not_honored():
    # `charset=` as loose text inside another attribute's VALUE must not
    # override the real encoding (WHATWG honors only the charset
    # attribute / http-equiv content-type content value)
    data = (
        b'<meta name=d content="see charset=iso-8859-1 docs">'
        b"<p>caf\xc3\xa9</p>"
    )
    assert sniff_encoding(data) == "utf-8"
    assert "café" in decode_html(data)


def test_http_equiv_required_for_content_charset():
    # content="...charset=..." without http-equiv=content-type is inert
    data = b'<meta name=x content="text/html; charset=shift_jis"><p>caf\xc3\xa9</p>'
    assert sniff_encoding(data) == "utf-8"


def test_fallback_gap_bytes_map_to_c1_controls():
    # WHATWG windows-1252: 0x81/0x8D/0x8F/0x90/0x9D decode to the C1
    # controls (Python's cp1252 leaves them undefined)
    data = b"caf\xe9 \x81\x8d\x90"
    assert sniff_encoding(data) == "windows-1252"
    assert decode_html(data) == "café \x81\x8d\x90"
