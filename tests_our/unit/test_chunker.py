"""Unit tests for chunking + vector metadata (SURVEY.md §2.5, Op-49..52)."""

import json

import pytest

from doc_parser_spark.core import model
from doc_parser_spark.core.chunker import (
    Chunk,
    chunk_document,
    compose_vectors,
    count_tokens,
    parse_created_date,
    safe_join,
    split_by_tokens,
    table_to_html,
)
from doc_parser_spark.html.extractor import extract_html

pytestmark = pytest.mark.unit

VECTOR_FIELDS = {
    "text": str,
    "n_char": int,
    "n_word": int,
    "n_line": int,
    "i_page": int,
    "i_chunk_on_page": int,
    "n_chunk_of_page": int,
    "i_chunk_on_doc": int,
    "n_chunk_of_doc": int,
    "n_page": int,
    "reg_date": str,
    "chunk_bboxes": str,
    "media_files": str,
    "title": str,
    "created_date": int,
}


def test_count_tokens_fallback_formula():
    # basic_processor.py:272,282: int(words * 1.3) per ≤300-char piece
    assert count_tokens("") == 0
    assert count_tokens("one two three") == int(3 * 1.3)
    # the 300-char line packing splits counting into pieces
    long_text = "\n".join("word " * 40 for _ in range(5))  # 5 lines of ~200 chars
    assert count_tokens(long_text) > 0


def test_parse_created_date():
    # basic_processor.py:924-972
    assert parse_created_date("2023-05-07") == 20230507
    assert parse_created_date("2023-5-7") == 20230507
    assert parse_created_date("2023-11") == 20231101
    assert parse_created_date("1999") == 19990101
    assert parse_created_date("2023-13-01") == 0
    assert parse_created_date("not a date") == 0
    assert parse_created_date(None) == 0
    assert parse_created_date("None") == 0


def test_safe_join():
    # basic_processor.py:919-922
    assert safe_join(["a", "b"]) == "ab\n"
    assert safe_join(None) == ""
    assert safe_join("string") == ""


def test_single_small_doc_merges_to_one_chunk():
    doc = extract_html(
        b"<html><body><h1>T</h1><p>one</p><h2>S</h2><p>two</p></body></html>"
    )
    chunks = chunk_document(doc)
    assert len(chunks) == 1
    # merge path regenerates text without header blocks (reference quirk,
    # basic_processor.py:619-623) — but item text for non-headers is kept
    assert "one" in chunks[0].text and "two" in chunks[0].text


def test_long_doc_splits_within_budget():
    body = b"".join(b"<p>" + (b"word " * 400) + b"</p>" for _ in range(8))
    doc = extract_html(b"<html><body><h1>T</h1>" + body + b"</body></html>")
    chunks = chunk_document(doc)
    assert len(chunks) > 1
    for c in chunks:
        assert count_tokens(c.text) <= 2000


def test_table_isolated_into_own_chunk_when_large_doc():
    # tables flush the accumulator and get their own chunk
    # (basic_processor.py:427-516); with a big surrounding doc the table
    # chunk stays separate
    para = b"<p>" + (b"word " * 600) + b"</p>"
    doc = extract_html(
        b"<html><body><h1>T</h1>" + para +
        b"<table><tr><th>K</th></tr><tr><td>" + (b"cell " * 600) + b"</td></tr></table>" +
        para + b"</body></html>"
    )
    chunks = chunk_document(doc)
    table_chunks = [c for c in chunks if "<table>" in c.text]
    assert len(table_chunks) >= 1


def test_empty_doc_gets_placeholder_dot():
    # basic_processor.py:1085-1116
    doc = extract_html(b"<html><body></body></html>")
    chunks = chunk_document(doc)
    assert len(chunks) == 1
    assert chunks[0].text == "."


def test_vector_meta_schema_and_counts():
    # mirrors the reference's own smoke assertions
    # (tests_our/smoke/test_pdf_smoke.py:36-49)
    doc = extract_html(
        b"<html><body><h1>Title X</h1><p>alpha beta gamma</p></body></html>"
    )
    chunks = chunk_document(doc)
    vectors = compose_vectors(doc, chunks, reg_date="2026-01-01T00:00:00Z")
    assert len(vectors) == len(chunks) >= 1
    v = vectors[0]
    for field_name, field_type in VECTOR_FIELDS.items():
        assert field_name in v, f"missing {field_name}"
        assert isinstance(v[field_name], field_type), field_name
    assert v["n_char"] == len(v["text"])
    assert v["n_word"] == len(v["text"].split())
    assert v["n_line"] == len(v["text"].splitlines())
    assert v["title"] == "Title X"
    assert v["i_chunk_on_doc"] == 0
    assert v["n_chunk_of_doc"] == len(chunks)
    assert json.loads(v["chunk_bboxes"]) == []  # HTML items carry no geometry
    assert v["i_page"] == 1 and v["n_page"] == 1


def test_heading_context_regenerated_in_split_chunks():
    # headers are re-inserted per chunk (basic_processor.py:286-337)
    doc = extract_html(
        b"<html><body><h1>Doc</h1><h2>Section Z</h2>"
        + b"<p>" + (b"word " * 1800) + b"</p>"
        + b"<p>tail paragraph</p></body></html>"
    )
    chunks = chunk_document(doc)
    assert len(chunks) >= 2
    tail_chunk = next(c for c in chunks if "tail paragraph" in c.text)
    assert tail_chunk.headings is not None
    assert "Section Z" in tail_chunk.headings


def test_table_to_html_roundtrip():
    doc = extract_html(
        b"<html><body><table><tr><th>A</th></tr><tr><td>b</td></tr></table></body></html>"
    )
    html = table_to_html(doc.tables()[0].table)
    assert html == "<table><tr><th>A</th></tr><tr><td>b</td></tr></table>"


def test_page_header_footer_text_blanked():
    # basic_processor.py:175-176
    doc = extract_html(b"<html><body><p>keep</p></body></html>")
    doc.add_text(text="page 3 of 7", label=model.PAGE_FOOTER)
    chunks = chunk_document(doc)
    assert all("page 3 of 7" not in c.text for c in chunks)


def test_parse_authors_shapes():
    """intelligent_processor.py:971-1020 semantics with deterministic
    dedup order."""
    from doc_parser_spark.core.chunker import parse_authors

    assert parse_authors(None) == []
    assert parse_authors([]) == []
    # dict list: Korean key wins even when empty; empties dropped; dedup
    assert parse_authors(
        [{"이름": "김철수"}, {"name": "Lee"}, {"이름": "", "name": "ignored"},
         {"other": "x"}, "  Park ", "Lee"]
    ) == ["김철수", "Lee", "Park"]
    # string: first separator found wins
    assert parse_authors("a, b; c") == ["a", "b; c"]
    assert parse_authors("a·b") == ["a", "b"]
    assert parse_authors("solo ") == ["solo"]
    assert parse_authors("a, b, a") == ["a", "b"]


def test_split_text_by_tokens_budget_holds_after_short_line():
    """A long line following a short one used to be emitted whole (the
    word-split only ran on the empty-current path)."""
    from doc_parser_spark.core.chunker import _split_text_by_tokens, count_tokens

    text = "short\n" + " ".join(f"word{i}" for i in range(200))
    pieces = _split_text_by_tokens(text, 50)
    assert len(pieces) > 1
    assert all(count_tokens(p) <= 50 for p in pieces)
    # nothing lost
    joined = " ".join(" ".join(p.split()) for p in pieces)
    assert "word0" in joined and "word199" in joined and "short" in joined


def test_count_tokens_single_shared_packing_rule():
    from doc_parser_spark.core.chunker import (
        _feed_tokens,
        _finalize_tokens,
        count_tokens,
    )

    samples = [
        "",
        "one two three",
        "a\n" * 50 + "b",
        "x" * 400 + "\nshort tail",
    ]
    for s in samples:
        assert count_tokens(s) == (
            0 if not s else _finalize_tokens(_feed_tokens((0, ""), s))
        )
