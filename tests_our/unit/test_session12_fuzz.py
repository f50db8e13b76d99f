"""Hostile-input fuzz for the session-12 operators: the text projections
(readability, lexical diversity) are total functions with sane ranges on
garbage; the codec kernels (WAV/AVI stats) must isolate hostile payloads
per-row with an error status, never a task failure."""

from __future__ import annotations

import random

import pytest

from doc_parser_spark.operators import multimodal as mm
from doc_parser_spark.operators import text_analysis

pytestmark = pytest.mark.unit


def _garbage_strings(rng, n):
    pools = [
        "",
        " ",
        "\x00\x01\x02",
        "�" * 40,
        "!!!???...." * 50,                # sentence-run storm
        "aeiouy" * 800,                   # one huge all-vowel word
        "bcdfg " * 500,                   # vowel-free words
        "a" * 5000,
        ("w " * 3000).strip(),
        "🙂" * 50,
        ". . . . . .",
        "\n\n\n\n",
    ]
    out = []
    for _ in range(n):
        if rng.random() < 0.5:
            out.append(rng.choice(pools))
        else:
            out.append(
                "".join(
                    chr(rng.randint(1, 0x2FFF))
                    for _ in range(rng.randint(0, 120))
                )
            )
    return out


def test_text_projections_survive_garbage(spark):
    rng = random.Random(412)
    rows = [(i, s) for i, s in enumerate(_garbage_strings(rng, 80))]
    rows.append((len(rows), None))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    n = len(rows)

    rd = text_analysis.readability(docs).collect()
    assert len(rd) == n
    for r in rd:
        assert r.n_syllables >= 0 and r.n_sentences >= 0
        assert r.n_syllables >= r.n_words  # >= 1 syllable per word
        assert r.band in ("empty", "basic", "intermediate", "advanced")
        if r.n_words == 0:
            assert r.band == "empty" and r.fk_x100 == 0

    tt = text_analysis.lexical_diversity(docs).collect()
    assert len(tt) == n
    for r in tt:
        assert 0 <= r.n_types <= r.n_words
        assert 0 <= r.ttr_x1000 <= 1000
        assert 0 <= r.ttr_w_x1000 <= 1000
        assert r.n_types_w <= r.n_types


def test_codec_kernels_isolate_hostile_payloads(spark):
    rng = random.Random(413)
    payloads = [
        b"",
        b"RIFF",
        b"RIFF\xff\xff\xff\xffWAVE",
        b"RIFF\x00\x00\x00\x00AVI ",
        b"\x00" * 200,
        bytes(rng.randint(0, 255) for _ in range(500)),
        b"RIFF" + b"\xff" * 100,
        b"LIST" * 60,
    ]
    rows = [(i, p) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    wav = mm.wav_stats(df).collect()
    assert len(wav) == len(rows)
    assert all(
        r.status == "empty" or r.status.startswith("error:") for r in wav
    )

    vid = mm.video_stats(df).collect()
    assert len(vid) == len(rows)
    assert all(
        r.status == "empty" or r.status.startswith("error:") for r in vid
    )
