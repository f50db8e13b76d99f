"""Unit tests for content-based format detection (SURVEY.md §2.1 Op-1)."""

import pytest

from doc_parser_spark.core import sniff

pytestmark = pytest.mark.unit


@pytest.mark.parametrize(
    "payload,expected",
    [
        (b"%PDF-1.4\nxxx", sniff.FORMAT_PDF),
        (b"PK\x03\x04zipzip", sniff.FORMAT_ZIP),
        (b"<!DOCTYPE html><html></html>", sniff.FORMAT_HTML),
        (b"<html><body>x</body></html>", sniff.FORMAT_HTML),
        (b"  \n <HTML>", sniff.FORMAT_HTML),
        (b"<body><p>frag</p></body>", sniff.FORMAT_HTML),
        (b"<div>bare fragment</div>", sniff.FORMAT_HTML),
        (b'<?xml version="1.0"?><html xmlns="x"><body/></html>', sniff.FORMAT_HTML),
        (b'<?xml version="1.0"?><article></article>', sniff.FORMAT_XML),
        (b"# Heading\n\nplain markdown", sniff.FORMAT_MD),
        (b"- item one\n- item two", sniff.FORMAT_MD),
        (b"just plain prose text.", sniff.FORMAT_TEXT),
        (b"", sniff.FORMAT_UNKNOWN),
        (bytes(range(32)), sniff.FORMAT_UNKNOWN),
        (b"\xef\xbb\xbf<html>bom", sniff.FORMAT_HTML),
    ],
)
def test_sniff(payload, expected):
    assert sniff.sniff_format(payload) == expected
