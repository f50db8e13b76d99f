"""Document enrichment: deterministic TOC application + quality checks.

The reference's enrichment stage (SURVEY.md §2.6) calls an LLM to propose a
table of contents and metadata (``docling/utils/document_enrichment.py``),
then applies them with *deterministic* matching logic. The LLM call is an
external-service boundary — here a pluggable ``toc_provider`` callable —
but the application logic is pure and ported faithfully:

* section-header demotion before re-matching ... document_enrichment.py:455-477
* raw-text extraction (whitespace-collapsed lines) .............. :479-485
* numbered-TOC parsing (1. / 1.1. / 1.1.1. / 1.1.1.1. + TITLE:) . :487-536
* TOC→text matching: title matched front-first via
  ``difflib.get_close_matches`` (cutoff 0.3) then ratio ≥ 0.5;
  section lines matched back-to-front, scoring max(full, title)
  similarity, top-5 candidates, best first ...................... :538-621

In the Spark pipeline this runs inside the same Arrow batch as extraction,
with ``toc_provider`` either None (off — the fork's production default,
basic_processor.py:1083) or a per-executor batched client.
"""

from __future__ import annotations

import difflib
import re
from typing import Callable, Optional

from doc_parser_spark.core import model
from doc_parser_spark.core.model import Document

_TOC_PATTERNS = [
    re.compile(r"^(\d+\.\d+\.\d+\.\d+)\.\s*(.+)$"),
    re.compile(r"^(\d+\.\d+\.\d+)\.\s*(.+)$"),
    re.compile(r"^(\d+\.\d+)\.\s*(.+)$"),
    re.compile(r"^(\d+)\.\s*(.+)$"),
]


def demote_section_headers(doc: Document) -> int:
    """All SECTION_HEADER items → TEXT (reference :455-477). Returns count."""
    n = 0
    for node in doc.nodes:
        if node.label == model.SECTION_HEADER:
            node.label = model.TEXT
            node.level = 0
            n += 1
    return n


def extract_raw_text_for_toc(doc: Document) -> str:
    """Whitespace-collapsed one-line-per-item text (reference :479-485)."""
    lines = []
    for node, _ in doc.iterate_items(layers=(model.BODY, model.FURNITURE)):
        if node.text:
            lines.append(re.sub(r"\s+", " ", node.text.strip()))
    return "\n".join(lines) + ("\n" if lines else "")


def parse_toc_content(toc_content: str) -> dict:
    """Numbered-TOC text → {'title', 'toc_items'} (reference :487-536)."""
    toc_items = []
    document_title = None
    for line in toc_content.split("\n"):
        cleaned = line.strip()
        if not cleaned:
            continue
        if cleaned.startswith("TITLE:"):
            document_title = cleaned[6:].strip()
            continue
        matched = False
        for pattern in _TOC_PATTERNS:
            m = pattern.match(cleaned)
            if m:
                number, title = m.group(1), m.group(2).strip()
                toc_items.append(
                    {
                        "number": number,
                        "title": title,
                        "level": number.count(".") + 1,
                        "full_text": cleaned,
                    }
                )
                matched = True
                break
        if not matched:
            toc_items.append(
                {"number": "", "title": cleaned, "level": 1, "full_text": cleaned}
            )
    return {"title": document_title, "toc_items": toc_items}


def apply_toc(doc: Document, toc_content: str, threshold: float = 0.5) -> int:
    """Re-match TOC lines to TEXT items (reference :538-621).

    Returns the number of items promoted (title + section headers)."""
    parsed = parse_toc_content(toc_content)
    document_title = parsed["title"]
    toc_items = parsed["toc_items"]

    converted: set[int] = set()
    text_items = [
        (node.index, node.text.strip())
        for node in doc.nodes
        if node.label == model.TEXT and node.text and len(node.text.strip()) >= 2
    ]
    text_items_reversed = text_items[::-1]
    matched_count = 0

    # title: front-first, get_close_matches cutoff 0.3, then ratio >= 0.5
    if document_title and text_items:
        title_clean = document_title.strip()
        text_only = [t for _, t in text_items]
        close = difflib.get_close_matches(title_clean, text_only, n=3, cutoff=0.3)
        if close:
            best_text = close[0]
            best_idx = next(
                (idx for idx, t in text_items if t == best_text), None
            )
            if best_idx is not None and best_idx not in converted:
                sim = difflib.SequenceMatcher(
                    None, title_clean.lower(), best_text.lower()
                ).ratio()
                if sim >= 0.5:
                    doc.nodes[best_idx].label = model.TITLE
                    converted.add(best_idx)
                    matched_count += 1

    # sections: back-to-front, max(full, title) similarity, top-5, best first
    for toc_item in toc_items:
        toc_full = toc_item["full_text"]
        toc_title = toc_item["title"]
        if len(toc_full) < 2:
            continue
        scored = []
        for idx, text in text_items_reversed:
            if idx in converted:
                continue
            sim_full = difflib.SequenceMatcher(
                None, toc_full.lower(), text.lower()
            ).ratio()
            sim_title = difflib.SequenceMatcher(
                None, toc_title.lower(), text.lower()
            ).ratio()
            similarity = max(sim_full, sim_title)
            if similarity >= threshold:
                scored.append((idx, similarity))
        scored.sort(key=lambda x: x[1], reverse=True)
        if scored[:5]:
            best_idx, _sim = scored[0]
            node = doc.nodes[best_idx]
            node.label = model.SECTION_HEADER
            node.level = toc_item["level"]
            converted.add(best_idx)
            matched_count += 1

    return matched_count


# -- text-quality check (Op-58, document_enrichment.py:298-454 spirit) -------

_MEANINGFUL_RE = re.compile(r"[0-9A-Za-z가-힣一-鿿.,!?;:()\[\]%\-\s]")


def meaningful_char_ratio(text: str) -> float:
    """Share of meaningful characters (alnum, CJK/Hangul, common
    punctuation, whitespace) — the deterministic core of the reference's
    OCR-retrigger quality check."""
    if not text:
        return 0.0
    hits = len(_MEANINGFUL_RE.findall(text))
    return hits / len(text)


def needs_ocr_retrigger(doc: Document, threshold: float = 0.6) -> bool:
    """True when extracted text is mostly non-meaningful glyphs."""
    text = extract_raw_text_for_toc(doc)
    if not text.strip():
        return True
    return meaningful_char_ratio(text) < threshold


def enrich_document(
    doc: Document,
    toc_provider: Optional[Callable[[str], str]] = None,
    threshold: float = 0.5,
) -> Document:
    """Optional enrichment pass.

    ``toc_provider`` maps raw document text → TOC text (the LLM boundary;
    reference wires an HTTP gateway at document_enrichment.py:82-139). When
    None (default, matching the fork's production default) this is a no-op."""
    if toc_provider is None:
        return doc
    raw = extract_raw_text_for_toc(doc)
    toc = toc_provider(raw)
    if toc:
        demote_section_headers(doc)
        apply_toc(doc, toc, threshold=threshold)
    return doc
