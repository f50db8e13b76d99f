"""Structure-preserving chunking + flat vector-metadata records.

From-scratch reimplementation of the fork's RAG chunking layer
(``doc_preprocessors/basic_processor.py``): the rewritten
HierarchicalChunker (:102-218), the token-budgeted HybridChunker (:220-704),
and the GenOSVectorMeta builder (:707-827, compose_vectors :996-1057).

Determinism notes:

* The reference counts tokens with an HF tokenizer
  (``all-MiniLM-L6-v2``, basic_processor.py:225) and falls back to
  ``int(len(words) * 1.3)`` per ≤300-char line-packed piece when tokenization
  fails (:247-284). transformers is not available in this environment, so the
  fallback path IS the contract here — replicated exactly, including the
  300-char line packing.
* Oversized tables are split by the reference with ``semchunk`` at 4096
  tokens (:481). semchunk is unavailable; :func:`_split_text_by_tokens` is a
  deterministic greedy line/word packer with the same budget semantics.
* ``reg_date`` is wall-clock in the reference (:1021) — here it is an
  explicit parameter so Spark runs are reproducible.
* Reference quirk kept on purpose: chunks produced by the token splitter do
  not carry per-item header info into ``_merge_small_chunks`` (:619-623
  reads a ``_header_info_list`` attribute that was never set), so merged
  small chunks lose their header text and get ``headings=None``.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from datetime import datetime
from typing import Optional

from doc_parser_spark.core import model
from doc_parser_spark.core.model import Document, Node

MAX_TOKENS_DEFAULT = 2000  # reference: basic_processor.py:908-912
TABLE_SPLIT_TOKENS = 4096  # reference: basic_processor.py:481
CHUNK_DELIM = "\n"  # docling-core BaseChunker.delim
_MAX_CHUNK_LENGTH = 300  # the packing-line cap inside the token estimate


@dataclass
class Chunk:
    text: str
    items: list[Node] = field(default_factory=list)
    headings: Optional[list[str]] = None
    # mirrors the reference's ad-hoc ``_header_info_list`` attribute: only
    # set for merge candidates created inside _merge_small_chunks
    merge_header_infos: Optional[list[dict]] = None


def count_tokens(text: str) -> int:
    """Token estimate (reference ``_count_tokens``, basic_processor.py:247-284,
    always on its fallback branch — see module docstring).

    The packing rule lives ONCE, in ``_feed_tokens``/``_finalize_tokens``
    (the incremental fold ``split_by_tokens`` relies on); this is the
    single-text convenience form.
    """
    if not text:
        return 0
    return _finalize_tokens(_feed_tokens((0, ""), text))


def _split_text_by_tokens(text: str, chunk_size: int) -> list[str]:
    """Greedy line-then-word packer with a token budget (deterministic
    replacement for the reference's semchunk call, basic_processor.py:395-408)."""
    if not text or count_tokens(text) <= chunk_size:
        return [text]
    pieces: list[str] = []
    current: list[str] = []
    for line in text.split("\n"):
        candidate = "\n".join(current + [line])
        if count_tokens(candidate) <= chunk_size or not current:
            current.append(line)
        else:
            pieces.append("\n".join(current))
            current = [line]
        # a single line over budget: split it on words. Checked on BOTH
        # paths — a long line that flushes the previous chunk (else
        # branch) is just as over-budget as one appended to an empty
        # current, and used to be emitted whole.
        if count_tokens("\n".join(current)) > chunk_size:
            long_line = current.pop()
            if current:
                pieces.append("\n".join(current))
                current = []
            words = long_line.split(" ")
            buf: list[str] = []
            for w in words:
                buf.append(w)
                if count_tokens(" ".join(buf)) > chunk_size and len(buf) > 1:
                    buf.pop()
                    pieces.append(" ".join(buf))
                    buf = [w]
            if buf:
                current = [" ".join(buf)]
    if current:
        pieces.append("\n".join(current))
    return pieces


def table_to_html(table: model.TableData) -> str:
    """Deterministic table HTML (stand-in for docling-core
    ``TableItem.export_to_html``, used for chunk text at
    basic_processor.py:339-346)."""
    if table is None or not table.cells:
        return ""
    rows: dict[int, list] = {}
    for c in table.anchor_cells():  # grid view: duplicates render once
        rows.setdefault(c.start_row, []).append(c)
    lines = ["<table>"]
    for r in sorted(rows):
        cells_html = []
        for c in sorted(rows[r], key=lambda c: c.start_col):
            tag = "th" if (c.column_header or c.row_header) else "td"
            spans = ""
            if c.row_span > 1:
                spans += f' rowspan="{c.row_span}"'
            if c.col_span > 1:
                spans += f' colspan="{c.col_span}"'
            cells_html.append(f"<{tag}{spans}>{c.text.strip()}</{tag}>")
        lines.append("<tr>" + "".join(cells_html) + "</tr>")
    lines.append("</table>")
    return "".join(lines)


def extract_table_text(node: Node) -> str:
    """Reference ``_extract_table_text`` (basic_processor.py:339-378):
    HTML export first, cell-text join fallback, then item text."""
    if node.table is not None:
        html = table_to_html(node.table)
        if html and html.strip():
            return html
        cell_texts = [
            c.text.strip()
            for c in node.table.anchor_cells()
            if c.text and c.text.strip()
        ]
        if cell_texts:
            return " ".join(cell_texts)
    return node.text or ""


# ---------------------------------------------------------------------------
# HierarchicalChunker (reference: basic_processor.py:102-218)
# ---------------------------------------------------------------------------

_HEADERISH = (model.SECTION_HEADER, model.TITLE)
_ELIGIBLE = (
    model.TITLE, model.SECTION_HEADER, model.TEXT, model.CODE, model.LIST_ITEM,
    model.CAPTION, model.TABLE, model.PICTURE, model.PAGE_HEADER, model.PAGE_FOOTER,
)


def collect_items(doc: Document) -> tuple[list[Node], list[dict]]:
    """Single pass over the tree: items in order + per-item heading context.

    Mirrors the fork's HierarchicalChunker.chunk exactly: list-item batching,
    heading map maintenance with deeper-level eviction, page-header/footer
    text blanking, and re-insertion of tables missed by traversal.
    """
    all_items: list[Node] = []
    all_header_info: list[dict] = []
    current_heading_by_level: dict[int, str] = {}
    list_items: list[Node] = []
    processed_refs: set[str] = set()

    for item, _ in doc.iterate_items(layers=(model.BODY, model.FURNITURE)):
        processed_refs.add(item.self_ref)

        # merge consecutive list items (basic_processor.py:134-146)
        if item.label == model.LIST_ITEM:
            list_items.append(item)
            continue
        elif list_items:
            for li in list_items:
                all_items.append(li)
                all_header_info.append(dict(current_heading_by_level))
            list_items = []

        # section headers update the heading map (basic_processor.py:148-168)
        if item.label in _HEADERISH:
            # TITLE → level 0; section headers carry their own level
            # (basic_processor.py:153-157)
            header_level = 0 if item.label == model.TITLE else (item.level or 1)
            current_heading_by_level[header_level] = item.text
            for k in [k for k in current_heading_by_level if k > header_level]:
                current_heading_by_level.pop(k, None)
            all_items.append(item)
            all_header_info.append(dict(current_heading_by_level))
            continue

        if item.label in _ELIGIBLE:
            if item.label in (model.PAGE_HEADER, model.PAGE_FOOTER):
                item.text = ""  # blanked, as in basic_processor.py:175-176
            all_items.append(item)
            all_header_info.append(dict(current_heading_by_level))

    if list_items:
        for li in list_items:
            all_items.append(li)
            all_header_info.append(dict(current_heading_by_level))

    # tables missed by traversal get prepended (basic_processor.py:187-199)
    missing = [t for t in doc.tables() if t.self_ref not in processed_refs]
    for t in missing:
        all_items.insert(0, t)
        all_header_info.insert(0, {})

    return all_items, all_header_info


# ---------------------------------------------------------------------------
# HybridChunker (reference: basic_processor.py:220-704)
# ---------------------------------------------------------------------------


def _gen_item_parts(
    item: Node, item_headers: dict, current_section_headers: dict
) -> tuple[list[str], dict]:
    """One fold step of ``_generate_text``: the text parts ``item`` appends
    given the running header state, plus the new header state. Factoring
    the step out lets ``split_by_tokens`` grow a chunk incrementally in
    O(1) per item instead of regenerating the whole chunk text per
    candidate (O(n²) on item-heavy documents — a straggler source)."""
    parts: list[str] = []
    if item_headers != current_section_headers:
        headers_to_add: list[str] = []
        for level in sorted(item_headers.keys()):
            if (
                level not in current_section_headers
                or current_section_headers[level] != item_headers[level]
            ):
                for lvl in sorted(item_headers.keys()):
                    if lvl <= level:
                        headers_to_add.append(item_headers[lvl])
                break
        if headers_to_add:
            parts.append("\n".join(headers_to_add))
        current_section_headers = dict(item_headers)

    if item.label == model.TABLE:
        table_text = extract_table_text(item)
        if table_text:
            parts.append(table_text)
    elif item.label == model.PICTURE:
        parts.append("")  # images contribute an empty part (:333-334)
    elif item.text:
        # section headers are skipped (already in the header block);
        # TITLE is always included (:323-332)
        if item.label != model.SECTION_HEADER:
            parts.append(item.text)

    return parts, current_section_headers


def _generate_text(
    items: list[Node], header_info_list: list[dict]
) -> str:
    """Reference ``_generate_text_from_items_with_headers``
    (basic_processor.py:286-337), including its header-diff insertion logic."""
    text_parts: list[str] = []
    current_section_headers: dict = {}
    for i, item in enumerate(items):
        item_headers = header_info_list[i] if i < len(header_info_list) else {}
        parts, current_section_headers = _gen_item_parts(
            item, item_headers, current_section_headers
        )
        text_parts.extend(parts)
    return CHUNK_DELIM.join(text_parts)


def _feed_tokens(state: tuple[int, str], part: str) -> tuple[int, str]:
    """Advance the ``count_tokens`` packing state by one text part.

    ``count_tokens`` is a fold over the lines of the joined chunk text
    with state (total, trailing partial pack); because parts are joined
    with "\\n", part boundaries are line boundaries and the state can be
    carried across parts — ``_finalize_tokens(fold(parts))`` equals
    ``count_tokens(CHUNK_DELIM.join(parts))`` exactly."""
    total, current = state
    for line in part.split("\n"):
        candidate = current + "\n" + line if current else line
        if len(candidate) <= _MAX_CHUNK_LENGTH:
            current = candidate
        else:
            if current:
                total += int(len(current.split()) * 1.3)
            current = line
    return total, current


def _finalize_tokens(state: tuple[int, str]) -> int:
    total, current = state
    if current:
        total += int(len(current.split()) * 1.3)
    return total


def _extract_used_headers(header_info_list: list[dict]) -> Optional[list[str]]:
    """Reference ``_extract_used_headers`` (basic_processor.py:380-393).
    Set-ordering note: the reference collects into a ``set`` and returns
    ``list(set)`` (arbitrary order); we sort for determinism."""
    all_headers = set()
    for info in header_info_list:
        for _, header_text in (info or {}).items():
            if header_text:
                all_headers.add(header_text)
    return sorted(all_headers) if all_headers else None


def split_by_tokens(
    items: list[Node],
    header_info_list: list[dict],
    max_tokens: int = MAX_TOKENS_DEFAULT,
) -> list[Chunk]:
    """Reference ``_split_document_by_tokens`` (basic_processor.py:410-589)."""
    if not items:
        return []

    result: list[Chunk] = []
    current_items: list[Node] = []
    current_infos: list[dict] = []
    # incremental chunk state: generated parts, header-diff state, and the
    # count_tokens packing state — kept in lockstep with current_items so
    # each candidate item is evaluated in O(item) instead of O(chunk)
    cur_parts: list[str] = []
    cur_hdr_state: dict = {}
    cur_tok_state: tuple[int, str] = (0, "")

    def flush_current() -> None:
        nonlocal current_items, current_infos, cur_parts, cur_hdr_state, cur_tok_state
        if current_items:
            result.append(
                Chunk(
                    text=CHUNK_DELIM.join(cur_parts),
                    items=list(current_items),
                    headings=_extract_used_headers(current_infos),
                )
            )
            current_items = []
            current_infos = []
        cur_parts = []
        cur_hdr_state = {}
        cur_tok_state = (0, "")

    for i, item in enumerate(items):
        info = header_info_list[i] if i < len(header_info_list) else {}

        if item.label == model.TABLE:
            flush_current()
            table_items = [item]
            table_infos = [info]
            table_text = _generate_text(table_items, table_infos)
            if count_tokens(table_text) > max_tokens:
                # oversized table: split the bare table text at the 4096
                # budget and re-splice each part (basic_processor.py:477-502)
                table_only = extract_table_text(item)
                headings = _extract_used_headers([info])
                for part in _split_text_by_tokens(table_only, TABLE_SPLIT_TOKENS):
                    # table_text == _generate_text([item], [info]) — the
                    # loop-invariant base each part splices into
                    full_text = table_text.replace(table_only, part)
                    result.append(
                        Chunk(
                            text=full_text,
                            items=[item],
                            headings=headings,
                        )
                    )
            else:
                result.append(
                    Chunk(
                        text=table_text,
                        items=table_items,
                        headings=_extract_used_headers(table_infos),
                    )
                )
            continue

        new_parts, new_hdr_state = _gen_item_parts(item, info, cur_hdr_state)
        new_tok_state = cur_tok_state
        for p in new_parts:
            new_tok_state = _feed_tokens(new_tok_state, p)
        if _finalize_tokens(new_tok_state) <= max_tokens:
            current_items.append(item)
            current_infos.append(info)
            cur_parts.extend(new_parts)
            cur_hdr_state = new_hdr_state
            cur_tok_state = new_tok_state
        else:
            if current_items:
                flush_current()
                current_items = [item]
                current_infos = [info]
                cur_parts, cur_hdr_state = _gen_item_parts(item, info, {})
                cur_tok_state = (0, "")
                for p in cur_parts:
                    cur_tok_state = _feed_tokens(cur_tok_state, p)
            else:
                single_text = _generate_text([item], [info])
                result.append(
                    Chunk(
                        text=single_text,
                        items=[item],
                        headings=_extract_used_headers([info]),
                    )
                )

    flush_current()
    return _merge_small_chunks(result, max_tokens)


def _merge_small_chunks(chunks: list[Chunk], max_tokens: int) -> list[Chunk]:
    """Reference ``_merge_small_chunks`` (basic_processor.py:591-684),
    including the lost-header-info quirk (module docstring)."""
    if not chunks:
        return chunks

    min_chunk_size = max_tokens // 3
    merged: list[Chunk] = []
    candidate: Optional[Chunk] = None

    for chunk in chunks:
        tokens = count_tokens(chunk.text)

        if tokens > max_tokens:
            if candidate is not None:
                merged.append(candidate)
                candidate = None
            merged.append(chunk)
            continue

        if tokens < min_chunk_size:
            if candidate is None:
                candidate = chunk
            else:
                m_items = candidate.items + chunk.items
                m_infos = (candidate.merge_header_infos or []) + (
                    chunk.merge_header_infos or []
                )
                m_text = _generate_text(m_items, m_infos)
                if count_tokens(m_text) <= max_tokens:
                    candidate = Chunk(
                        text=m_text,
                        items=m_items,
                        headings=_extract_used_headers(m_infos),
                        merge_header_infos=m_infos,
                    )
                else:
                    merged.append(candidate)
                    candidate = chunk
        else:
            if candidate is not None:
                if count_tokens(candidate.text) < min_chunk_size:
                    m_items = candidate.items + chunk.items
                    m_infos = (candidate.merge_header_infos or []) + (
                        chunk.merge_header_infos or []
                    )
                    m_text = _generate_text(m_items, m_infos)
                    if count_tokens(m_text) <= max_tokens:
                        merged.append(
                            Chunk(
                                text=m_text,
                                items=m_items,
                                headings=_extract_used_headers(m_infos),
                            )
                        )
                        candidate = None
                        continue
                merged.append(candidate)
                candidate = None
            merged.append(chunk)

    if candidate is not None:
        merged.append(candidate)
    return merged


def chunk_document(
    doc: Document, max_tokens: int = MAX_TOKENS_DEFAULT
) -> list[Chunk]:
    """HybridChunker.chunk equivalent (basic_processor.py:686-704), with the
    empty-document "." placeholder rule (basic_processor.py:1085-1116)."""
    if not doc.has_text_items():
        doc.add_text(text=".", label=model.TEXT, page_no=1)
    items, infos = collect_items(doc)
    if not items:
        return []
    return split_by_tokens(items, infos, max_tokens)


# ---------------------------------------------------------------------------
# GenOSVectorMeta (reference: basic_processor.py:707-827, 996-1057)
# ---------------------------------------------------------------------------


def safe_join(iterable) -> str:
    """Reference ``safe_join`` (basic_processor.py:919-922)."""
    if not isinstance(iterable, (list, tuple, set)):
        return ""
    return "".join(map(str, iterable)) + "\n"


def parse_created_date(date_text: Optional[str]) -> int:
    """Reference ``parse_created_date`` (basic_processor.py:924-972):
    YYYY[-MM[-DD]] → YYYYMMDD int, 0 when unparseable."""
    if not date_text or not isinstance(date_text, str) or date_text == "None":
        return 0
    date_text = date_text.strip()

    m = re.match(r"^(\d{4})-(\d{1,2})-(\d{1,2})$", date_text)
    if m:
        year, month, day = m.groups()
        try:
            datetime(int(year), int(month), int(day))
            return int(f"{year}{month.zfill(2)}{day.zfill(2)}")
        except ValueError:
            pass

    m = re.match(r"^(\d{4})-(\d{1,2})$", date_text)
    if m:
        year, month = m.groups()
        try:
            datetime(int(year), int(month), 1)
            return int(f"{year}{month.zfill(2)}01")
        except ValueError:
            pass

    m = re.match(r"^(\d{4})$", date_text)
    if m:
        try:
            datetime(int(m.group(1)), 1, 1)
            return int(f"{m.group(1)}0101")
        except ValueError:
            pass

    return 0


def parse_authors(authors_data) -> list[str]:
    """Author names from provider metadata (reference ``parse_authors``,
    intelligent_processor.py:971-1020): list entries may be dicts keyed
    ``이름``/``name`` or plain strings; a bare string splits on the first
    separator found among ``, ; / \\n · •``; names are stripped, empties
    dropped, duplicates removed. The reference dedups via ``list(set(...))``
    whose order is hash-randomized across runs — this port keeps
    first-seen order so the output is deterministic (same membership)."""
    if not authors_data:
        return []

    def dedup(names: list[str]) -> list[str]:
        seen: set[str] = set()
        out = []
        for n in names:
            if n not in seen:
                seen.add(n)
                out.append(n)
        return out

    if isinstance(authors_data, list):
        names = []
        for author in authors_data:
            if isinstance(author, dict):
                # "이름" wins even when empty — the reference's elif chain
                if "이름" in author:
                    name = str(author["이름"]).strip()
                elif "name" in author:
                    name = str(author["name"]).strip()
                else:
                    continue
                if name:
                    names.append(name)
            elif isinstance(author, str):
                name = author.strip()
                if name:
                    names.append(name)
        return dedup(names)
    if isinstance(authors_data, str):
        for sep in (",", ";", "/", "\n", "·", "•"):
            if sep in authors_data:
                return dedup(
                    [n.strip() for n in authors_data.split(sep) if n.strip()]
                )
        name = authors_data.strip()
        return [name] if name else []
    return []


def compose_vectors(
    doc: Document,
    chunks: list[Chunk],
    reg_date: str = "1970-01-01T00:00:00Z",
    created_date: int = 0,
    authors: str = "",
) -> list[dict]:
    """Chunk rows → flat GenOSVectorMeta dicts
    (reference ``compose_vectors``, basic_processor.py:996-1057; the
    intelligent variant's extra ``authors`` field,
    intelligent_processor.py:725-744, is carried as a plain string —
    populated only when a metadata provider supplies it)."""
    title = doc.title_text()
    n_chunk_of_doc = len(chunks)
    n_page = doc.num_pages()

    # per-page chunk counts (reference: basic_processor.py:915-917)
    page_chunk_counts: dict[int, int] = {}
    for chunk in chunks:
        page = chunk.items[0].page_no if chunk.items else 1
        page_chunk_counts[page] = page_chunk_counts.get(page, 0) + 1

    vectors: list[dict] = []
    current_page: Optional[int] = None
    chunk_index_on_page = 0
    for chunk_idx, chunk in enumerate(chunks):
        chunk_page = chunk.items[0].page_no if chunk.items else 1
        content = safe_join(chunk.headings) + chunk.text

        if chunk_page != current_page:
            current_page = chunk_page
            chunk_index_on_page = 0

        # normalized bboxes: l/r divided by page width, t/b by page height
        # (reference set_chunk_bboxes, basic_processor.py:778-795); HTML
        # items carry no geometry → empty list, e_page stays None
        chunk_bboxes = []
        for item in chunk.items:
            if item.bbox is not None:
                l, t, r, b = item.bbox
                width, height = doc.page_sizes.get(item.page_no, (0.0, 0.0))
                if width > 0 and height > 0:
                    l, r = l / width, r / width
                    t, b = t / height, b / height
                chunk_bboxes.append(
                    {
                        "page": item.page_no,
                        "bbox": {
                            "l": l,
                            "t": t,
                            "r": r,
                            "b": b,
                            "coord_origin": "TOPLEFT",
                        },
                        "type": item.label,
                        "ref": item.self_ref,
                    }
                )
        e_page = max((bb["page"] for bb in chunk_bboxes), default=None)

        media_files = [
            {"name": "", "type": "image", "ref": item.self_ref}
            for item in chunk.items
            if item.label == model.PICTURE
        ]

        vectors.append(
            {
                "text": content,
                "n_char": len(content),
                "n_word": len(content.split()),
                "n_line": len(content.splitlines()),
                "i_page": chunk_page,
                "e_page": e_page,
                "i_chunk_on_page": chunk_index_on_page,
                "n_chunk_of_page": page_chunk_counts.get(chunk_page, 0),
                "i_chunk_on_doc": chunk_idx,
                "n_chunk_of_doc": n_chunk_of_doc,
                "n_page": n_page,
                "reg_date": reg_date,
                "chunk_bboxes": json.dumps(chunk_bboxes),
                "media_files": json.dumps(media_files),
                "title": title,
                "created_date": created_date,
                "authors": authors,
            }
        )
        chunk_index_on_page += 1

    return vectors
