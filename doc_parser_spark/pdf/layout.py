"""Rule-based PDF layout pass: cells → merged lines → blocks → reading order.

Re-expresses the deterministic layout/assembly subset of the reference
(SURVEY.md §2.3 Op-19/23/25/30/31):

* horizontal cell merge with the exact grouping math of
  ``docling/backend/pypdfium2_backend.py:157-252`` (vertical overlap within
  0.5× row height, merge gaps ≤ 1.0× average cell height),
* parse-quality scoring with the garbage-glyph regexes and 10th-percentile
  page rollup of ``docling/models/page_preprocessing_model.py:27-141``,
* text sanitization (dehyphenation + unicode normalization) of
  ``docling/models/page_assemble_model.py:34-65``,
* reading order via recursive XY-cut (band split top→bottom, gutter split
  left→right) — the reference defers multi-column ordering to an ML
  reading-order model (``docling/models/readingorder_model.py:42-381``);
  XY-cut matches it on banded/columned layouts; free-form magazine layouts
  remain a documented gap.

numpy is used for the vectorizable parts; everything runs inside the Arrow
batch.
"""

from __future__ import annotations

import re

import numpy as np

from doc_parser_spark.pdf.minipdf import PdfPage, TextCell

# "5.1" / "2.3.4" / "7." — the numbering fragment of a section header.
# Dotted form
# required: a bare integer ("5") is far more often a numeric table cell
# or list counter than a section number, and joining it to a same-font
# neighbor would merge two table columns before table binning.
_ENUM_HEAD_RE = re.compile(r"\d+(?:\.\d+)+\.?|\d+\.")

# -- horizontal merge (reference: pypdfium2_backend.py:157-252) --------------


def merge_horizontal_cells(
    cells: list[TextCell],
    horizontal_threshold_factor: float = 1.0,
    vertical_threshold_factor: float = 0.5,
) -> list[TextCell]:
    if not cells:
        return []

    def group_rows(cells: list[TextCell]) -> list[list[TextCell]]:
        rows: list[list[TextCell]] = []
        current = [cells[0]]
        row_top, row_bottom = cells[0].t, cells[0].b
        row_height = cells[0].height
        for cell in cells[1:]:
            vt = row_height * vertical_threshold_factor
            # superscript/subscript joins: a clearly smaller cell that
            # vertically overlaps the row (footnote markers, exponents)
            # belongs to it even though its t/b offsets exceed vt
            overlap = min(cell.b, row_bottom) - max(cell.t, row_top)
            small_h = min(cell.height, row_height)
            big_h = max(cell.height, row_height)
            sup = (
                small_h > 0
                and overlap >= 0.6 * small_h
                and small_h < 0.85 * big_h
            )
            if (
                abs(cell.t - row_top) <= vt and abs(cell.b - row_bottom) <= vt
            ) or sup:
                current.append(cell)
                row_top = min(row_top, cell.t)
                row_bottom = max(row_bottom, cell.b)
                row_height = row_bottom - row_top
            else:
                rows.append(current)
                current = [cell]
                row_top, row_bottom = cell.t, cell.b
                row_height = cell.height
        if current:
            rows.append(current)
        return rows

    def merge_group(group: list[TextCell]) -> TextCell:
        if len(group) == 1:
            return group[0]
        ordered = sorted(group, key=lambda c: c.l)
        _dom = max(group, key=lambda c: (c.height, c.r - c.l))
        # reference parity: page_assemble_model.sanitize_text joins the
        # cluster's textline cells with " " unconditionally (save for
        # dash dehyphenation, handled at block level) — even a zero-gap
        # bold→regular boundary renders "Writing : Tools", never
        # "Writing: Tools" (multi_page golden). No golden contains a
        # seamless zero-gap cell join, so the separator is flat.
        parts = [ordered[0].text]
        for cur in ordered[1:]:
            parts.append(" ")
            parts.append(cur.text)
        return TextCell(
            index=group[0].index,
            text="".join(parts),
            l=min(c.l for c in group),
            t=min(c.t for c in group),
            r=max(c.r for c in group),
            b=max(c.b for c in group),
            # dominant cell's typography: a superscript marker sorting
            # first must not stamp its 7pt face on the whole line
            font_size=_dom.font_size,
            page_no=group[0].page_no,
            font_name=_dom.font_name,
            font_names=tuple(
                dict.fromkeys(
                    n for c in ordered for n in (c.font_names or ())
                )
            ),
        )

    def merge_row(row: list[TextCell]) -> list[TextCell]:
        # rows accrue in y order; a superscript-joined row spanning two
        # baselines (a taller float beside staggered body lines) is not
        # x-monotonic, and an unsorted walk sees negative gaps that
        # always merge — reading order must see x-sorted gaps
        row = sorted(row, key=lambda c: c.l)
        merged: list[TextCell] = []
        current = [row[0]]
        for cell in row[1:]:
            prev = current[-1]
            avg_height = (prev.height + cell.height) / 2
            # enumerated-heading join: "5.1" + "Hyper Parameter
            # Optimization" in the same face sit a wide tab apart, but
            # they are ONE section header (the reference's NN clusters
            # them; docling md shows "## 5.1 Hyper Parameter …")
            enum_head = (
                len(current) == 1
                and _ENUM_HEAD_RE.fullmatch(prev.text.strip())
                and cell.font_name == prev.font_name
                and cell.l - prev.r <= 4 * avg_height
            )
            if (
                cell.l - prev.r <= avg_height * horizontal_threshold_factor
                or enum_head
            ):
                current.append(cell)
            else:
                merged.append(merge_group(current))
                current = [cell]
        if current:
            merged.append(merge_group(current))
        return merged

    rows = group_rows(cells)
    merged = [cell for row in rows for cell in merge_row(row)]
    for i, cell in enumerate(merged, 1):
        cell.index = i
    return merged


# -- parse-quality scoring (reference: page_preprocessing_model.py:27-141) ---

_GLYPH_RE = re.compile(r"GLYPH<[0-9A-Fa-f]+>")
_SLASH_G_RE = re.compile(r"/G\d+")
_SLASH_RUN_RE = re.compile(r"(?:/[a-zA-Z0-9]+){3,}")


def rate_text_quality(text: str) -> float:
    """Per-cell quality in [0, 1]; replacement chars zero it out."""
    if not text:
        return 0.0
    if "�" in text:
        return 0.0
    score = 1.0
    if _GLYPH_RE.search(text) or _SLASH_G_RE.search(text) or _SLASH_RUN_RE.search(text):
        score *= 0.1
    words = text.split()
    if words:
        # fragmented-word penalty: many 1-char alpha tokens
        frag = sum(1 for w in words if len(w) == 1 and w.isalpha())
        if frag / len(words) > 0.5:
            score *= 0.5
    return score


def page_parse_score(cells: list[TextCell]) -> float:
    """10th-percentile rollup (page_preprocessing_model.py:77-85)."""
    if not cells:
        return float("nan")
    scores = np.array([rate_text_quality(c.text) for c in cells], dtype=float)
    return float(np.nanquantile(scores, 0.10))


# -- sanitize (reference: page_assemble_model.py:34-65) ----------------------

_WORD_RE = re.compile(r"\b[\w]+\b")

_CHAR_NORMALIZATIONS = [
    ("⁄", "/"),  # ⁄
    ("’", "'"),  # ’
    ("‘", "'"),  # ‘
    ("“", '"'),  # “
    ("”", '"'),  # ”
    ("•", "·"),  # • → ·
]


def sanitize_text(lines: list[str]) -> str:
    """Join cluster lines with dehyphenation + unicode normalization."""
    if len(lines) <= 1:
        sanitized = " ".join(lines)
    else:
        lines = list(lines)
        for ix, line in enumerate(lines[1:]):
            prev_line = lines[ix]
            if prev_line.endswith("-"):
                prev_words = _WORD_RE.findall(prev_line)
                line_words = _WORD_RE.findall(line)
                if (
                    prev_words
                    and line_words
                    and prev_words[-1].isalnum()
                    and line_words[0].isalnum()
                ):
                    lines[ix] = prev_line[:-1]
            else:
                lines[ix] += " "
        sanitized = "".join(lines)

    for src, dst in _CHAR_NORMALIZATIONS:
        sanitized = sanitized.replace(src, dst)
    return sanitized.strip()


# -- reading order + block clustering ----------------------------------------


def _projection_gap(intervals: list[tuple[float, float]], min_gap: float):
    """Largest whitespace gap in the 1-D projection of intervals, or None.

    Returns (boundary, gap_size) where boundary cleanly separates the two
    groups."""
    intervals = sorted(intervals)
    best = None
    covered_to = intervals[0][1]
    for lo, hi in intervals[1:]:
        if lo > covered_to:
            gap = lo - covered_to
            if gap >= min_gap and (best is None or gap > best[1]):
                best = (covered_to + gap / 2, gap)
        covered_to = max(covered_to, hi)
    return best


def order_cells(cells: list[TextCell], page_width: float) -> list[TextCell]:
    """Recursive XY-cut reading order.

    The reference defers multi-column ordering to an ML reading-order
    predictor (readingorder_model.py:42-381); the deterministic rebuild uses
    classic recursive XY-cut: split on full-width horizontal whitespace
    bands first (top→bottom), then on full-height vertical gutters
    (left→right), recursing until no clean split remains; leaves order by
    (top, left). Handles any column count plus mixed full-width/column
    bands (title + N-column body)."""
    if len(cells) <= 1:
        return list(cells)

    heights = [max(c.height, 1.0) for c in cells]
    median_h = float(np.median(heights))
    row_gap_min = 1.5 * median_h
    col_gap_min = max(12.0, page_width * 0.04)

    def proximity_blocks(group: list[TextCell]) -> list[list[TextCell]]:
        """2-D proximity clustering (union-find): cells connect when
        x-overlapping with a sub-line vertical gap (column flow) or
        y-overlapping with a sub-space horizontal gap (same line)."""
        n = len(group)
        parent = list(range(n))

        def find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for i in range(n):
            a = group[i]
            ah = max(a.height, 1.0)
            for j in range(i + 1, n):
                b = group[j]
                # the SMALLER height sets the connect radius: a taller
                # float line beside body text must not inflate its own
                # capture range and glue itself into the flow
                h = max(min(ah, max(b.height, 1.0)), 1.0)
                x_ov = min(a.r, b.r) - max(a.l, b.l)
                y_ov = min(a.b, b.b) - max(a.t, b.t)
                v_gap = max(a.t, b.t) - min(a.b, b.b)
                h_gap = max(a.l, b.l) - min(a.r, b.r)
                if (x_ov > 0.3 * min(a.r - a.l, b.r - b.l)
                        and v_gap <= 0.9 * h) or (
                        y_ov > 0 and h_gap <= 1.0 * h):
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        parent[rb] = ra
        by_root: dict[int, list[TextCell]] = {}
        for i in range(n):
            by_root.setdefault(find(i), []).append(group[i])
        return list(by_root.values())

    def bbox(block: list[TextCell]) -> tuple[float, float, float, float]:
        return (
            min(c.l for c in block), min(c.t for c in block),
            max(c.r for c in block), max(c.b for c in block),
        )

    def freeform(group: list[TextCell], depth: int) -> list[TextCell]:
        """No clean projection cut (magazine/free-form layout): extract
        floating islands so the main flow reads continuously.

        Two deterministic rules, applied at the blocked leaf:

        1. *cut-blocker removal* — if removing ONE proximity block makes
           an XY-cut possible (a pull-quote straddling a column gutter,
           a box breaking a band), order the rest recursively and append
           the island after the flow it interrupted;
        2. *side-float* — a block that sits beside a strictly larger
           block (y-overlap, disjoint x) is a float (wrapped figure
           caption, margin quote): the larger flow reads first, floats
           follow in (top, left) order.

        The reference solves this page class with its NN reading-order
        predictor (readingorder_model.py:42-381); these rules are the
        deterministic subset covering its float/island behavior."""
        # pathological density guard: proximity clustering is O(n²) over
        # the leaf's line-cells; a leaf this dense is scrambled OCR or a
        # mega-table, where plain (top, left) is the defensible order
        # and a 100 TB kernel must not spend quadratic Python on it
        if len(group) > 400:
            return sorted(group, key=lambda c: (c.t, c.l))
        blocks = proximity_blocks(group)
        if len(blocks) <= 1:
            return sorted(group, key=lambda c: (c.t, c.l))
        # rule 1: gutter-blocker removal (try smaller blocks first).
        # Only an X-gutter cut counts, and the removed island must
        # STRADDLE the enabled boundary — a stack of paragraphs must
        # never be torn apart by removing the middle one (the enabled
        # y-band would pass through any removed block; a gutter through
        # the block's x-range is only possible for a genuine straddler).
        blocks_sorted = sorted(
            blocks, key=lambda b: (len(b), bbox(b)[1], bbox(b)[0])
        )
        for cand in blocks_sorted[:-1]:
            rest = [c for b in blocks for c in b if b is not cand]
            x_split = _projection_gap([(c.l, c.r) for c in rest], col_gap_min)
            if x_split is not None:
                cl, _ct, cr, _cb = bbox(cand)
                if cl < x_split[0] < cr:
                    return cut(rest, depth + 1) + sorted(
                        cand, key=lambda c: (c.t, c.l)
                    )
        # rule 2: side-floats after the flow
        sizes = {id(b): len(b) for b in blocks}
        boxes = {id(b): bbox(b) for b in blocks}

        def floats_beside_larger(b) -> bool:
            lb, tb, rb_, bb = boxes[id(b)]
            for o in blocks:
                if o is b or sizes[id(o)] <= sizes[id(b)]:
                    continue
                lo, to, ro, bo = boxes[id(o)]
                y_ov = min(bb, bo) - max(tb, to)
                x_disjoint = rb_ <= lo or lb >= ro
                if y_ov > 0 and x_disjoint:
                    return True
            return False

        flow = [b for b in blocks if not floats_beside_larger(b)]
        isles = [b for b in blocks if floats_beside_larger(b)]
        key = lambda b: (boxes[id(b)][1], boxes[id(b)][0])  # noqa: E731
        out: list[TextCell] = []
        for b in sorted(flow, key=key) + sorted(isles, key=key):
            out.extend(sorted(b, key=lambda c: (c.t, c.l)))
        return out

    def cut(group: list[TextCell], depth: int) -> list[TextCell]:
        if len(group) <= 1 or depth > 12:
            return sorted(group, key=lambda c: (c.t, c.l))
        # horizontal band split (y projection)
        y_split = _projection_gap([(c.t, c.b) for c in group], row_gap_min)
        if y_split is not None:
            boundary = y_split[0]
            top = [c for c in group if c.b <= boundary]
            bottom = [c for c in group if c.b > boundary]
            if top and bottom:
                return cut(top, depth + 1) + cut(bottom, depth + 1)
        # vertical gutter split (x projection)
        x_split = _projection_gap([(c.l, c.r) for c in group], col_gap_min)
        if x_split is not None:
            boundary = x_split[0]
            left = [c for c in group if c.r <= boundary]
            right = [c for c in group if c.r > boundary]
            if left and right:
                # sidebar asymmetry: a much smaller AND much narrower
                # side of the gutter is a margin note / sidebar float,
                # not a first column — the main flow reads first (the
                # reference's NN places floats after the body they
                # annotate); balanced columns keep classic left-first
                def span(g):
                    return max(c.r for c in g) - min(c.l for c in g)

                small, big = (left, right) if len(left) <= len(right) \
                    else (right, left)
                if (
                    len(small) * 3 <= len(big)
                    and span(small) <= 0.45 * span(big)
                ):
                    return cut(big, depth + 1) + cut(small, depth + 1)
                return cut(left, depth + 1) + cut(right, depth + 1)
        return freeform(group, depth)

    return cut(list(cells), 0)


def cluster_blocks(
    ordered: list[TextCell], gap_factor: float = 0.9
) -> list[list[TextCell]]:
    """Consecutive lines → blocks; a vertical gap larger than
    ``gap_factor × line height`` starts a new block (the rule-based analog of
    the reference's orphan-cell TEXT clusters, layout_postprocessor.py:274-290)."""
    blocks: list[list[TextCell]] = []
    current: list[TextCell] = []
    for cell in ordered:
        if not current:
            current = [cell]
            continue
        prev = current[-1]
        line_h = max(prev.height, 1.0)
        same_column = cell.l < prev.r + 2 * line_h and cell.r > prev.l - 2 * line_h
        vertical_gap = cell.t - prev.b
        if same_column and -line_h * 0.5 <= vertical_gap <= line_h * gap_factor:
            current.append(cell)
        else:
            blocks.append(current)
            current = [cell]
    if current:
        blocks.append(current)
    return blocks


def block_bbox(block: list[TextCell]) -> tuple[float, float, float, float]:
    return (
        min(c.l for c in block),
        min(c.t for c in block),
        max(c.r for c in block),
        max(c.b for c in block),
    )


def get_text_in_rect(
    cells: list[TextCell], l: float, t: float, r: float, b: float
) -> str:
    """Text of all cells that lie >50% (by own area) inside the rect.

    Reference semantics (``docling/backend/docling_parse_v2_backend.py:
    99-141`` / ``pypdfium2_backend.py:269``): per-cell
    ``intersection_over_self(query) > 0.5`` gate, matched cells joined with
    a single space in cell order. Coordinates here are already top-left
    origin (minipdf normalizes at parse time)."""
    pieces: list[str] = []
    for cell in cells:
        area = max(0.0, cell.r - cell.l) * max(0.0, cell.b - cell.t)
        if area <= 0:
            continue
        w = min(cell.r, r) - max(cell.l, l)
        h = min(cell.b, b) - max(cell.t, t)
        inter = w * h if w > 0 and h > 0 else 0.0
        if inter / area > 0.5:
            pieces.append(cell.text)
    return " ".join(pieces)
