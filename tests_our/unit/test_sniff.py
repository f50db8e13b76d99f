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
        # audio containers → NoOp/ASR route (noop_backend.py)
        (b"RIFF\x24\x08\x00\x00WAVEfmt ", sniff.FORMAT_AUDIO),
        (b"ID3\x04\x00\x00\x00\x00\x011TALB", sniff.FORMAT_AUDIO),  # tests/data/audio/sample_10s.mp3 header
        (b"\xff\xfb\x90\x00mp3frame", sniff.FORMAT_AUDIO),
        (b"OggS\x00\x02vorbis", sniff.FORMAT_AUDIO),
        (b"fLaC\x00\x00\x00\x22", sniff.FORMAT_AUDIO),
        (b"\x00\x00\x00\x20ftypM4A ", sniff.FORMAT_AUDIO),
        # text that merely starts with an audio magic must NOT misroute:
        # ID3v2 needs version-major 2/3/4 + clean flags + syncsafe sizes
        (b"ID3,name,value\n1,foo,2\n", sniff.FORMAT_TEXT),
        (b"ID3 tags are metadata containers used by mp3 files.", sniff.FORMAT_TEXT),
        (b"fLaCid,product\n1,thing\n", sniff.FORMAT_TEXT),
        (b"OggString is not an audio file at all here.", sniff.FORMAT_TEXT),
    ],
)
def test_sniff(payload, expected):
    assert sniff.sniff_format(payload) == expected


def test_audio_backend_noop_and_asr_plug_point():
    from doc_parser_spark.core import model
    from doc_parser_spark.core.simple_backends import (
        conversation_item_to_string,
        extract_audio,
    )

    wav = b"RIFF\x24\x08\x00\x00WAVEfmt payloadbytes"
    # NoOp semantics: valid but empty without a transcriber
    doc = extract_audio(wav)
    assert list(doc.iterate_items()) == []
    with pytest.raises(ValueError):
        extract_audio(b"")

    # transcript formatting mirrors _ConversationItem.to_string
    # (asr_pipeline.py:85-96)
    assert (
        conversation_item_to_string("hello", 0.0, 2.5, "speaker-0")
        == "[time: 0.0-2.5] [speaker:speaker-0] hello"
    )
    assert conversation_item_to_string("no times") == "no times"

    def fake_asr(payload):
        assert payload == wav
        return [
            {"text": " Hello there.", "start_time": 0.0, "end_time": 2.0},
            {"text": " Bye.", "start_time": 2.0, "end_time": 3.0},
        ]

    doc = extract_audio(wav, asr_fn=fake_asr)
    texts = [n.text for n, _ in doc.iterate_items()]
    assert texts == ["[time: 0.0-2.0]  Hello there.", "[time: 2.0-3.0]  Bye."]
    assert all(n.label == model.TEXT for n, _ in doc.iterate_items())
