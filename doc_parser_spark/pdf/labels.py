"""Deterministic layout labeling — the rules half of the reference's layout NN.

The reference labels layout clusters with an ML model
(``docling/models/layout_model.py:148-219``, out of deterministic scope per
SURVEY.md §7); this pass recovers the label classes a rules engine can decide
from geometry, typography, and cross-page statistics alone:

* ``PAGE_HEADER`` / ``PAGE_FOOTER`` furniture — a block confined to the top or
  bottom page band whose digit-normalized text repeats on ≥2 pages, or that
  matches a page-number pattern. Mirrors the reference's furniture split
  (``AssembledUnit.headers`` vs ``.body``, ``docling/datamodel/
  base_models.py:260-264``; page_header/page_footer labels in the layout
  model's class map).
* ``LIST_ITEM`` — lines opening with bullet glyphs or ``1.`` / ``1)`` / ``(1)``
  enumerators; consecutive marker lines in one block become one list group
  (reference emits list_item clusters that the reading-order model groups).
* ``CAPTION`` — short blocks opening with ``Figure N`` / ``Table N``; when a
  table sits adjacent the caption is cross-referenced onto it the way docling
  attaches ``captions`` refs to tables/pictures.
* ``CODE`` — blocks set entirely in a monospace ``/BaseFont`` (Courier/Mono/
  Consolas/CMTT families). Deterministic half of reference Op-59
  (``docling/models/code_formula_model.py`` — the VLM stays a provider
  boundary; font-based detection needs no model).
* ``FORMULA`` — display equations in TeX math faces (CMMI/CMSY/CMEX/AMS)
  showing a relation glyph and not reading as running prose.
* ``FOOTNOTE`` — marker-led small print near the page bottom.
* ``SECTION_HEADER`` (bold rule) — single-line all-bold blocks at >= body
  size (Word-converted PDFs put headings under any safe size factor), with
  a leading-bold split when the heading clusters with its paragraph.
* ``PICTURE`` — bitmap placements clustered by spatial-grid overlap
  union (tiled figure halves join; hairline rules and decoration drop),
  interleaved with tables in reading order, caption cross-refs by kind.

Everything here is pure-Python over already-parsed cells and runs inside the
extraction ``mapInPandas`` batch — no Spark shuffle, no driver work.
"""

from __future__ import annotations

import re

# bullet glyphs + dash bullets + enumerators: "1." "1)" "(1)" "a." "a)"
_BULLET_RE = re.compile(
    "^[•◦▪●○‣⁃·∙\\-–—*]\\s+"
)
# symbol-font / unmapped-glyph bullets the reference KEEPS inside the
# item text (multi_page's SymbolMT '∞', redp5110's '/g115/g3' subset
# ids): they mark a list item but are not stripped — docling's NN path
# never removes marker glyphs, and the goldens show them verbatim
_GLYPH_BULLET_RE = re.compile(
    "^(?:[∞✓✔➢➤❖§†‡]|/SM\\d+|/g\\d+(?:/g\\d+)*|.?GLYPH<[^>]*>)\\s+"
)
_ENUM_RE = re.compile(r"^\(?(\d{1,3}|[a-z])[.)]\s+")
_PAGENO_RE = re.compile(
    r"^(?:page\s+)?[-–—]?\s*\d{1,5}\s*[-–—]?"
    r"(?:\s*(?:of|/)\s*\d{1,5})?$",
    re.IGNORECASE,
)
_CAPTION_RE = re.compile(
    r"^(?:fig(?:ure)?\.?|table|tab\.|listing)\s+\d+", re.IGNORECASE
)
_MONO_RE = re.compile(
    # common monospace families + CMTT (Computer Modern Typewriter, the
    # TeX monospace — what LaTeX-produced PDFs set code in) +
    # BookMasterGothic (the IBM BookMaster toolchain's code face: every
    # Redbooks/Redpaper listing, CL command, and identifier is set in it)
    r"courier|mono|consol|cmtt|menlo|inconsolata|sourcecode|dejavusansm"
    r"|bookmastergothic",
    re.IGNORECASE,
)
# TeX math faces (Computer Modern Math Italic / Symbols / Extension, the
# AMS symbol fonts) + anything self-describing as a math face
_MATH_FONT_RE = re.compile(r"cmmi|cmsy|cmex|msam|msbm|math", re.IGNORECASE)
# a displayed formula contains at least one relation glyph — guards
# against prose that merely mentions an italic variable ('+' and '<'
# alone are too common in prose to qualify)
_MATH_OP_RE = re.compile(r"[=±∑∏∫√≤≥≠∞→⇒∈∂∇÷]")
# ...and never reads as running prose: three consecutive >=3-letter
# words ('... is the learning rate') means a sentence, not math
_PROSE_RUN_RE = re.compile(r"(?:[A-Za-z]{3,}\s+){2,}[A-Za-z]{3,}")
FORMULA_MAX_CHARS = 200
_DIGITS_RE = re.compile(r"\d+")

# vertical page fraction counted as header/footer band (the reference's
# layout model finds furniture anywhere, but in practice running heads
# live inside ~8% margins; conservative to avoid eating body text)
BAND_FRACTION = 0.08
# bare page numbers sit above generous bottom margins (LaTeX puts the
# folio ~1.3in up an 11in page); a digits-only line is unambiguous, so
# the band can be wider without eating body text
PAGENO_BAND_FRACTION = 0.15
# max caption block length — real captions are short; guards against a
# body paragraph that happens to open with "Table 1 shows ..."
CAPTION_MAX_CHARS = 300
# caption ↔ table adjacency window (pt)
CAPTION_GAP_PT = 36.0
# consecutive mono blocks this close re-join into one code listing (a
# blank source line splits the cluster but not the listing)
CODE_MERGE_GAP_PT = 30.0
# footnotes: marker + bottom fifth of the page + clearly reduced size
_FOOTNOTE_RE = re.compile(r"^(?:\d{1,2}|[*†‡§])\s+\S")
FOOTNOTE_BAND_FRACTION = 0.20
FOOTNOTE_SIZE_FACTOR = 0.9


def furniture_key(text: str) -> str:
    """Digit-normalized repetition key ("Chapter 3" == "Chapter 7")."""
    return _DIGITS_RE.sub("#", " ".join(text.split())).lower()


def band_of(
    bbox: tuple, page_height: float, frac: float = BAND_FRACTION
) -> str | None:
    """'header' / 'footer' when the block sits fully inside a page band."""
    if bbox[3] <= page_height * frac:
        return "header"
    if bbox[1] >= page_height * (1.0 - frac):
        return "footer"
    return None


def repeated_furniture_keys(
    band_blocks: list[tuple[int, str]],
) -> set[str]:
    """Keys seen in a band on ≥2 distinct pages → furniture.

    ``band_blocks``: (page_no, key) pairs for every band-resident block.
    """
    pages_by_key: dict[str, set[int]] = {}
    for page_no, key in band_blocks:
        pages_by_key.setdefault(key, set()).add(page_no)
    return {k for k, pages in pages_by_key.items() if len(pages) >= 2}


def is_page_number(text: str) -> bool:
    return bool(_PAGENO_RE.match(text.strip()))


def is_caption(text: str) -> bool:
    return bool(_CAPTION_RE.match(text)) and len(text) <= CAPTION_MAX_CHARS


def caption_kind(text: str) -> str:
    """'table' for Table/Tab. captions, else 'figure' — so a 'Table N'
    caption never cross-references a picture sitting closer than the
    table it names (and vice versa)."""
    head = text.lstrip().lower()
    return "table" if head.startswith(("table", "tab.")) else "figure"


def is_footnote(
    text: str,
    bbox: tuple,
    page_height: float,
    block_size: float,
    median_size: float,
) -> bool:
    """Marker-led small-print block near the page bottom.

    The reference's layout NN labels these ``footnote`` (body layer, cf.
    redp5110 golden: '1   http://…' at ~0.9h in 0.8× body size); the
    deterministic cues are the same three the eye uses — a bare
    digit/dagger marker, bottom-of-page position, reduced type size.
    """
    return (
        bool(_FOOTNOTE_RE.match(text))
        and bbox[1] >= page_height * (1.0 - FOOTNOTE_BAND_FRACTION)
        and block_size <= median_size * FOOTNOTE_SIZE_FACTOR
    )


# TeX bold faces ship under CMBX / SFBX-style names (Computer Modern /
# Latin Modern Bold Extended Type1C subsets in arXiv PDFs)
_BOLD_RE = re.compile(
    r"bold|black|heavy|semibold|demibold|cmbx|sfbx", re.IGNORECASE
)
HEADING_MAX_CHARS = 120


def is_bold_heading(cells: list, text: str, median_size: float) -> bool:
    """Single-line block set entirely in a bold face at >= body size.

    Catches Word/DOCX-converted PDFs whose headings are bold at nearly
    body size (e.g. 13.4pt over a 12pt median — under any safe size
    factor). Sentence-ending periods disqualify: a bold full sentence is
    emphasis, not a heading.
    """
    if len(cells) != 1 or not text or len(text) > HEADING_MAX_CHARS:
        return False
    if text.rstrip().endswith("."):
        return False
    faces = _cell_faces(cells[0])
    if not faces or not all(_BOLD_RE.search(n) for n in faces):
        return False
    return cells[0].font_size >= median_size - 0.1


def split_leading_bold_heading(
    cells: list, median_size: float
) -> list[list]:
    """Split a qualifying bold first line off a mixed block.

    A heading set tight above its paragraph clusters into one block; if
    the first cell alone passes ``is_bold_heading`` and the rest of the
    block is not bold, the heading becomes its own block. Returns
    ``[cells]`` unchanged otherwise."""
    if len(cells) < 2:
        return [cells]
    first = cells[0]
    if not is_bold_heading([first], first.text.strip(), median_size):
        return [cells]
    rest_faces = [n for c in cells[1:] for n in _cell_faces(c)]
    if rest_faces and all(_BOLD_RE.search(n) for n in rest_faces):
        return [cells]  # uniformly bold block — emphasis, not a heading
    return [[first], cells[1:]]


def is_mono_block(cells: list) -> bool:
    """Every solid cell is set entirely in monospace /BaseFonts
    (whitespace-only cells carry no signal and are ignored)."""
    classes = [_cell_class(c) for c in cells]
    return "mono" in classes and all(
        cls in ("mono", "any") for cls in classes
    )


def _cell_faces(c) -> tuple:
    names = getattr(c, "font_names", ()) or ()
    if not names:
        single = getattr(c, "font_name", "")
        names = (single,) if single else ()
    return names


def is_formula_block(cells: list) -> bool:
    """Every solid cell carries a TeX math face (a display equation
    merges the CMMI variable with CMR digits — ANY math face in the line
    counts), the text shows a relation glyph, reads as symbols rather
    than running prose, and is display-equation sized."""
    solid = [c for c in cells if c.text.strip()]
    if not solid:
        return False
    for c in solid:
        if _cell_class(c) != "math":
            return False
    text = " ".join(c.text for c in solid)
    return (
        bool(_MATH_OP_RE.search(text))
        and not _PROSE_RUN_RE.search(text)
        and len(text) <= FORMULA_MAX_CHARS
    )


def _cell_class(c) -> str:
    """'mono' | 'math' | 'text' | 'any' (whitespace-only: no signal —
    joins whatever run surrounds it)."""
    if not getattr(c, "text", " ").strip():
        return "any"
    names = _cell_faces(c)
    if names and all(_MONO_RE.search(n) for n in names):
        return "mono"
    if any(_MATH_FONT_RE.search(n) for n in names):
        return "math"
    return "text"


def split_label_runs(cells: list) -> list[list]:
    """Split a mixed block into maximal same-class cell runs.

    A caption set in a text face often clusters with the code listing
    under it, and a display equation with the paragraph that follows;
    splitting lets the mono run label CODE / the math run FORMULA while
    the prose stays prose. Qualification guards false splits: a mono run
    needs ≥2 cells (an inline ``word`` stays in its paragraph); a math
    run needs an operator glyph (``is_formula_block``). Unqualified runs
    merge back into the adjacent prose. Returns ``[cells]`` unchanged
    for uniform blocks.
    """
    runs: list[tuple[list, str]] = []
    for c in cells:
        cls = _cell_class(c)
        if runs and (runs[-1][1] == cls or cls == "any"):
            runs[-1][0].append(c)
        else:
            runs.append(([c], cls))
    if len(runs) == 1:
        return [cells]
    out: list[list] = []
    qual: list[bool] = []
    for run, cls in runs:
        q = (cls == "mono" and len(run) >= 2) or (
            cls == "math" and is_formula_block(run)
        )
        if not q and qual and not qual[-1]:
            out[-1].extend(run)
        else:
            out.append(run)
            qual.append(q)
    return out if len(out) > 1 else [cells]


PICTURE_GAP_PT = 6.0
PICTURE_MIN_AREA = 400.0  # < ~20x20pt placements are rules/decoration
PICTURE_MIN_SIDE = 8.0  # hairline rules are long but thin — not figures


def cluster_picture_rects(
    rects: list,
    gap: float = PICTURE_GAP_PT,
    min_area: float = PICTURE_MIN_AREA,
) -> list[tuple[float, float, float, float]]:
    """Union overlapping/adjacent bitmap placements into picture boxes.

    The reference's layout NN emits one picture cluster per figure even
    when the PDF paints it as several tiled XObjects; the deterministic
    equivalent is connected components over rect overlap (padded by
    ``gap``). Tiny clusters (decorative rules, bullets-as-images) drop.
    """
    rects = [tuple(float(v) for v in r) for r in rects]
    n = len(rects)
    parent = list(range(n))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    # spatial-grid union instead of the O(n²) pairwise sweep: a tiled
    # scan can paint thousands of placements per page and per-document
    # time isolation must hold (same contract as tables.detect_tables).
    # Rects expanded by gap/2 that share a grid cell are overlap
    # CANDIDATES; the exact test runs only within a cell's occupants.
    cell = 64.0
    grid: dict[tuple[int, int], list[int]] = {}
    for i, (x0, y0, x1, y1) in enumerate(rects):
        for gx in range(int((x0 - gap) // cell), int((x1 + gap) // cell) + 1):
            for gy in range(
                int((y0 - gap) // cell), int((y1 + gap) // cell) + 1
            ):
                grid.setdefault((gx, gy), []).append(i)
    for occupants in grid.values():
        for ii in range(len(occupants)):
            i = occupants[ii]
            x0, y0, x1, y1 = rects[i]
            for jj in range(ii + 1, len(occupants)):
                j = occupants[jj]
                if find(i) == find(j):
                    continue
                a0, b0, a1, b1 = rects[j]
                if (
                    x0 - gap <= a1
                    and a0 - gap <= x1
                    and y0 - gap <= b1
                    and b0 - gap <= y1
                ):
                    union(i, j)
    groups: dict[int, list] = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(rects[i])
    out = []
    for grp in groups.values():
        box = (
            min(r[0] for r in grp),
            min(r[1] for r in grp),
            max(r[2] for r in grp),
            max(r[3] for r in grp),
        )
        w, h = box[2] - box[0], box[3] - box[1]
        if w * h >= min_area and min(w, h) >= PICTURE_MIN_SIDE:
            out.append(box)
    out.sort(key=lambda b: (b[1], b[0]))
    return out


def split_list_items(
    lines: list[str],
) -> list[tuple[str, bool]] | None:
    """Marker-led line groups → [(item_text_with_marker_stripped, enumerated)].

    Returns None unless ≥2 lines open with markers (a lone leading dash is
    more likely a dehyphenation artifact than a list). Non-marker lines are
    continuations of the item above; a non-marker FIRST line disqualifies
    the block.
    """
    if not lines:
        return None
    first = lines[0]
    if not (
        _BULLET_RE.match(first)
        or _GLYPH_BULLET_RE.match(first)
        or _ENUM_RE.match(first)
    ):
        return None
    n_markers = sum(
        1
        for ln in lines
        if _BULLET_RE.match(ln)
        or _GLYPH_BULLET_RE.match(ln)
        or _ENUM_RE.match(ln)
    )
    if n_markers < 2:
        return None
    items: list[tuple[list[str], bool]] = []
    for ln in lines:
        gm = _GLYPH_BULLET_RE.match(ln)
        bm = None if gm else _BULLET_RE.match(ln)
        em = None if (gm or bm) else _ENUM_RE.match(ln)
        if gm:
            # glyph bullets stay in the text (reference golden behavior)
            items.append(([ln], False))
        elif bm or em:
            items.append(([ln[(bm or em).end():]], em is not None))
        else:
            items[-1][0].append(ln)
    return [(" ".join(parts).strip(), enum) for parts, enum in items]
