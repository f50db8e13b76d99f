"""Ruled-table grid recovery for born-digital PDFs.

The reference recovers PDF table structure with the TableFormer NN
(``docling/models/table_structure_model.py`` — ML-scoped out per
SURVEY.md §7, so until now PDF pages emitted no ``table`` struct at
all). Born-digital tables, however, usually *paint their grid*: the
ruling lines are right there in the content stream. This module turns
the painted axis-aligned segments (``PdfPage.rulings``) into the same
``TableData`` struct the HTML/DOCX/XLSX backends emit, so every
downstream serializer (markdown pipes, HTML ``<table>``, DocTags,
chunker row-serialization) works unchanged on PDF tables.

Heuristic:

Pass A — fully ruled grids:

1. merge collinear overlapping segments; split into horizontal and
   vertical families
2. union-find connected components over H x V crossings — each
   component is one candidate grid
3. a component with >=3 distinct row lines and >=3 distinct column
   lines (i.e. a >=2x2 cell lattice) whose lattice is materially
   complete becomes a table; text cells inside are binned into grid
   positions by their bbox (spanning cells cross boundaries and get
   row/col spans naturally)

Pass B — horizontal-rules-only tables (LaTeX booktabs: toprule /
midrule / bottomrule, no vertical lines). Column boundaries come from
whitespace: >=3 stacked rules sharing the same x-extent bound a band;
cells inside are clustered into rows; x-gutters that NO cell crosses
become column separators. Guards against tableizing ordinary prose
between horizontal separators: >=2 columns required, most rows must be
multi-cell, and cells must be short (tables hold entries, not
paragraphs).

Pass C — fully unruled tables (no painted geometry at all): a band of
>=5 consecutive multi-cell line-rows whose whitespace gutters are
shared by >=80% of rows, entry-length cells, >=60% grid fill. The
strictest evidence bar of the text passes, because on an unruled page
every aligned layout is a candidate (covers, two-column prose).

Pass D — dot-leader contents tables: >=8 lines (and >=60% of the page's
lines) ending in a >=4-dot leader run plus a roman/arabic folio ref
become one (entry+leader, page-ref) 2-column table — the TableFormer
treatment of a TOC page (redp5110's golden).

Everything is geometry over a handful of segments per page — pure
Python, no NN, deterministic.
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right
from dataclasses import dataclass

from doc_parser_spark.core import model

TOL = 2.0  # coordinate clustering / crossing tolerance (pt)
MIN_SPAN = 8.0  # segments shorter than this are decorations
# fraction of lattice crossings that must actually be painted — rejects
# accidental alignments of unrelated rules (underlines, hr separators)
MIN_LATTICE_FILL = 0.7


@dataclass
class TableRegion:
    bbox: tuple[float, float, float, float]  # (l, t, r, b) top-left origin
    data: model.TableData
    cell_ids: set[int]  # id() of consumed text cells


def _cluster_1d(vals: list[float], tol: float = TOL) -> list[float]:
    """Sorted cluster centers of 1-D coordinates."""
    out: list[float] = []
    group: list[float] = []
    for v in sorted(vals):
        if group and v - group[-1] > tol:
            out.append(sum(group) / len(group))
            group = []
        group.append(v)
    if group:
        out.append(sum(group) / len(group))
    return out


def _merge_segments(
    segs: list[tuple[float, float, float]], tol: float = TOL
) -> list[tuple[float, float, float]]:
    """(coord, lo, hi) segments — merge same-coordinate overlapping runs
    (dashed rules, butt-joined strokes, rect edges drawn twice)."""
    out: list[tuple[float, float, float]] = []
    by_coord: dict[float, list[tuple[float, float]]] = {}
    centers = _cluster_1d([s[0] for s in segs], tol)
    for coord, lo, hi in segs:
        c = min(centers, key=lambda x: abs(x - coord))
        by_coord.setdefault(c, []).append((lo, hi))
    for c, ivals in by_coord.items():
        ivals.sort()
        cur_lo, cur_hi = ivals[0]
        for lo, hi in ivals[1:]:
            if lo <= cur_hi + 3 * tol:
                cur_hi = max(cur_hi, hi)
            else:
                out.append((c, cur_lo, cur_hi))
                cur_lo, cur_hi = lo, hi
        out.append((c, cur_lo, cur_hi))
    return [s for s in out if s[2] - s[1] >= MIN_SPAN]


def detect_tables(cells: list, rulings: list) -> list[TableRegion]:
    """Text cells + painted segments (top-left coords) → table regions."""
    if not rulings:
        # no painted geometry at all — only the text passes can fire
        out = _detect_toc(cells)
        got = set()
        for r in out:
            got |= r.cell_ids
        out.extend(
            _detect_unruled([c for c in cells if id(c) not in got])
        )
        out.sort(key=lambda r: (r.bbox[1], r.bbox[0]))
        return out
    hs_raw = []  # (y, x0, x1)
    vs_raw = []  # (x, y0, y1)
    for x0, y0, x1, y1 in rulings:
        if abs(y1 - y0) <= 0.5 and abs(x1 - x0) >= MIN_SPAN:
            hs_raw.append(((y0 + y1) / 2, min(x0, x1), max(x0, x1)))
        elif abs(x1 - x0) <= 0.5 and abs(y1 - y0) >= MIN_SPAN:
            vs_raw.append(((x0 + x1) / 2, min(y0, y1), max(y0, y1)))
    hs = _merge_segments(hs_raw)
    vs = _merge_segments(vs_raw)
    if len(hs) < 3:
        return []

    # union-find over H x V crossings
    n = len(hs) + len(vs)
    parent = list(range(n))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    # crossings via an x-sorted index over the v-segments: O(|hs|·log|vs|
    # + matches) instead of the full |hs|×|vs| product — a crawl PDF can
    # paint thousands of rulings per page and per-document time isolation
    # must hold
    import bisect

    vs_order = sorted(range(len(vs)), key=lambda j: vs[j][0])
    vx = [vs[j][0] for j in vs_order]
    crossings: set[tuple[int, int]] = set()
    for i, (y, hx0, hx1) in enumerate(hs):
        lo = bisect.bisect_left(vx, hx0 - TOL)
        hi = bisect.bisect_right(vx, hx1 + TOL)
        for jj in range(lo, hi):
            j = vs_order[jj]
            _x, vy0, vy1 = vs[j]
            if vy0 - TOL <= y <= vy1 + TOL:
                crossings.add((i, j))
                ra, rb = find(i), find(len(hs) + j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)

    comps: dict[int, tuple[list[int], list[int]]] = {}
    for i in range(len(hs)):
        comps.setdefault(find(i), ([], []))[0].append(i)
    for j in range(len(vs)):
        comps.setdefault(find(len(hs) + j), ([], []))[1].append(j)
    cross_by_root: dict[int, int] = {}
    for i, _j in crossings:
        r = find(i)
        cross_by_root[r] = cross_by_root.get(r, 0) + 1

    regions: list[TableRegion] = []
    accepted_h: set[int] = set()
    for root, (h_idx, v_idx) in comps.items():
        if len(h_idx) < 3 or len(v_idx) < 3:
            continue
        row_lines = _cluster_1d([hs[i][0] for i in h_idx])
        col_lines = _cluster_1d([vs[j][0] for j in v_idx])
        if len(row_lines) < 3 or len(col_lines) < 3:
            continue
        # lattice completeness: painted crossings / ideal crossings
        n_cross = cross_by_root.get(root, 0)
        if n_cross < MIN_LATTICE_FILL * len(row_lines) * len(col_lines):
            continue
        # borderless outer columns/rows (LaTeX `{l|l|l}` without outer
        # pipes): when the h-rules overhang the outermost v-line, the
        # overhang is a real column whose boundary is the rule end —
        # extend the lattice so those cells aren't clipped out
        h_left = min(hs[i][1] for i in h_idx)
        h_right = max(hs[i][2] for i in h_idx)
        if col_lines[0] - h_left > 2 * TOL:
            col_lines.insert(0, h_left)
        if h_right - col_lines[-1] > 2 * TOL:
            col_lines.append(h_right)
        v_top = min(vs[j][1] for j in v_idx)
        v_bot = max(vs[j][2] for j in v_idx)
        if row_lines[0] - v_top > 2 * TOL:
            row_lines.insert(0, v_top)
        if v_bot - row_lines[-1] > 2 * TOL:
            row_lines.append(v_bot)
        top, bot = row_lines[0], row_lines[-1]
        left, right = col_lines[0], col_lines[-1]
        inside = [
            c
            for c in cells
            if left - TOL <= (c.l + c.r) / 2 <= right + TOL
            and top - TOL <= (c.t + c.b) / 2 <= bot + TOL
        ]
        if _is_code_listing(inside):
            continue
        built = _bin_into_lattice(inside, row_lines, col_lines)
        if built is None:
            continue
        data, consumed = built
        accepted_h.update(h_idx)
        regions.append(
            TableRegion(
                bbox=(left, top, right, bot), data=data, cell_ids=consumed
            )
        )

    consumed_all: set[int] = set()
    for r in regions:
        consumed_all |= r.cell_ids
    regions.extend(
        _detect_rules_only(
            [hs[i] for i in range(len(hs)) if i not in accepted_h],
            [c for c in cells if id(c) not in consumed_all],
        )
    )
    for r in regions:
        consumed_all |= r.cell_ids
    regions.extend(
        _detect_toc([c for c in cells if id(c) not in consumed_all])
    )
    for r in regions:
        consumed_all |= r.cell_ids
    regions.extend(
        _detect_unruled([c for c in cells if id(c) not in consumed_all])
    )
    regions.sort(key=lambda r: (r.bbox[1], r.bbox[0]))
    return regions


def _bin_into_lattice(
    cells_in: list, row_lines: list[float], col_lines: list[float]
):
    """Bin pre-filtered cells into boundary lattices → (TableData, ids)."""
    n_rows, n_cols = len(row_lines) - 1, len(col_lines) - 1
    inner_rows = row_lines[1:-1]
    inner_cols = col_lines[1:-1]
    binned: dict[tuple[int, int], list] = {}
    spans: dict[tuple[int, int], tuple[int, int]] = {}
    consumed: set[int] = set()
    for c in cells_in:
        r0 = bisect_right(inner_rows, c.t + 1.0)
        r1 = bisect_left(inner_rows, c.b - 1.0)
        c0 = bisect_right(inner_cols, c.l + 1.0)
        c1 = bisect_left(inner_cols, c.r - 1.0)
        r0, r1 = min(r0, n_rows - 1), min(max(r1, r0), n_rows - 1)
        c0, c1 = min(c0, n_cols - 1), min(max(c1, c0), n_cols - 1)
        consumed.add(id(c))
        key = (r0, c0)
        binned.setdefault(key, []).append(c)
        pr, pc = spans.get(key, (r0, c0))
        spans[key] = (max(pr, r1), max(pc, c1))
    if not binned:
        return None

    data = model.TableData(num_rows=n_rows, num_cols=n_cols, cells=[])
    for (r0, c0), group in sorted(binned.items()):
        group.sort(key=lambda c: (round(c.t, 1), c.l))
        text = " ".join(
            c.text.strip() for c in group if c.text.strip()
        ).strip()
        r1, c1 = spans[(r0, c0)]
        data.cells.append(
            model.TableCellData(
                text=text,
                row_span=r1 - r0 + 1,
                col_span=c1 - c0 + 1,
                start_row=r0,
                end_row=r1 + 1,
                start_col=c0,
                end_col=c1 + 1,
            )
        )
    grid: list[list[str | None]] = [[None] * n_cols for _ in range(n_rows)]
    for cd in data.cells:
        for rr in range(cd.start_row, min(cd.end_row, n_rows)):
            for cc in range(cd.start_col, min(cd.end_col, n_cols)):
                grid[rr][cc] = cd.text
    data.grid = grid
    return data, consumed


# pass D — dot-leader contents tables: the reference's TableFormer
# tableizes a TOC page into (entry + leader, page-ref) rows (redp5110's
# golden: one 43x2 table for the whole Contents page). The deterministic
# equivalent keys on the strongest signal a page can give: a band of
# lines each ending in a >=4-dot leader run followed by a roman/arabic
# folio reference.
import re as _re

_TOC_LINE_RE = _re.compile(
    r"^(.*?)((?:\.\s+){4,})\s*\.?\s*([ivxlcdm]{1,7}|\d{1,4})\s*$",
    _re.IGNORECASE,
)
_TOC_MIN_ROWS = 8
_TOC_MIN_FRAC = 0.6


def _nearest_rows(solid: list, rows_y: list[float]) -> list[list]:
    """Assign each cell to its nearest row center — O(n log r) bisect,
    not the O(n·r) scan (a crawl PDF can carry thousands of cells per
    page and per-document time isolation must hold)."""
    by_row: list[list] = [[] for _ in rows_y]
    for c in solid:
        yc = (c.t + c.b) / 2
        k = bisect_left(rows_y, yc)
        if k == 0:
            ix = 0
        elif k == len(rows_y):
            ix = len(rows_y) - 1
        else:
            ix = k if rows_y[k] - yc < yc - rows_y[k - 1] else k - 1
        by_row[ix].append(c)
    return by_row


def _detect_toc(cells: list) -> list[TableRegion]:
    solid = [c for c in cells if c.text.strip()]
    if len(solid) < _TOC_MIN_ROWS:
        return []
    heights = sorted(c.b - c.t for c in solid)
    med_h = heights[len(heights) // 2]
    rows_y = _cluster_1d(
        [(c.t + c.b) / 2 for c in solid], tol=max(TOL, 0.6 * med_h)
    )
    by_row = _nearest_rows(solid, rows_y)
    entries: list[tuple[list, str, str]] = []  # (cells, col1, col2)
    n_lines = 0
    for row in by_row:
        row.sort(key=lambda c: c.l)
        text = " ".join(c.text.strip() for c in row if c.text.strip())
        if not text:
            continue
        n_lines += 1
        m = _TOC_LINE_RE.match(text)
        if m:
            entries.append(
                (row, (m.group(1) + m.group(2)).strip(), m.group(3))
            )
    if len(entries) < _TOC_MIN_ROWS or len(entries) < _TOC_MIN_FRAC * n_lines:
        return []
    data = model.TableData(num_rows=len(entries), num_cols=2, cells=[])
    consumed: set[int] = set()
    grid: list[list[str | None]] = []
    for r, (row, col1, col2) in enumerate(entries):
        consumed |= {id(c) for c in row}
        for ci, txt in enumerate((col1, col2)):
            data.cells.append(
                model.TableCellData(
                    text=txt, row_span=1, col_span=1,
                    start_row=r, end_row=r + 1,
                    start_col=ci, end_col=ci + 1,
                )
            )
        grid.append([col1, col2])
    data.grid = grid
    band = [c for row, _a, _b in entries for c in row]
    bbox = (
        min(c.l for c in band), min(c.t for c in band),
        max(c.r for c in band), max(c.b for c in band),
    )
    return [TableRegion(bbox=bbox, data=data, cell_ids=consumed)]


# pass C — fully unruled tables (no painted geometry at all): the
# majority of real-world PDF tables, covered by the reference with the
# TableFormer NN (docling/models/table_structure_model.py:170-304). The
# deterministic stand-in demands much stronger alignment evidence than
# the ruled passes, because on an unruled page EVERY multi-column layout
# is a candidate: a band of >=4 consecutive multi-cell line-rows whose
# whitespace gutters are shared by >=80% of its rows, entry-like cell
# lengths, and uniform row pitch (a two-column prose layout fails the
# shortness bar; a sidebar fails the every-row-multi-cell bar).
_UNRULED_MIN_ROWS = 5
_UNRULED_MULTI_FRAC = 0.8
_UNRULED_PITCH_FACTOR = 2.5


def _detect_unruled(cells: list) -> list[TableRegion]:
    solid = [c for c in cells if c.text.strip()]
    if len(solid) < _UNRULED_MIN_ROWS * 2:
        return []
    heights = sorted(c.b - c.t for c in solid)
    med_h = heights[len(heights) // 2]
    rows_y = _cluster_1d(
        [(c.t + c.b) / 2 for c in solid], tol=max(TOL, 0.6 * med_h)
    )
    by_row = _nearest_rows(solid, rows_y)

    regions: list[TableRegion] = []
    i = 0
    while i < len(rows_y):
        # grow a band of consecutive multi-cell rows at uniform pitch
        if len(by_row[i]) < 2:
            i += 1
            continue
        j = i
        while (
            j + 1 < len(rows_y)
            and len(by_row[j + 1]) >= 2
            and rows_y[j + 1] - rows_y[j] <= _UNRULED_PITCH_FACTOR * med_h
        ):
            j += 1
        band_rows = by_row[i : j + 1]
        i = j + 1
        if len(band_rows) < _UNRULED_MIN_ROWS:
            continue
        band = [c for row in band_rows for c in row]
        short = sum(
            1 for c in band if len(c.text.split()) <= MAX_CELL_WORDS
        )
        if short < MIN_SHORT_FRAC * len(band):
            continue
        if _is_code_listing(band):
            continue
        left = min(c.l for c in band)
        right = max(c.r for c in band)
        # band-wide whitespace gutters (the pass-B rule)
        ivals = sorted((c.l, c.r) for c in band)
        gutters: list[float] = []
        cover_hi = ivals[0][0]
        for lo, hi in ivals:
            if lo - cover_hi >= MIN_GUTTER and cover_hi > left:
                gutters.append((cover_hi + lo) / 2)
            cover_hi = max(cover_hi, hi)
        if not gutters:
            continue
        # alignment evidence: >=80% of rows must SPLIT at some gutter
        # (a cell ending left of it and another starting right of it)
        def row_splits(row: list) -> bool:
            for g in gutters:
                if any(c.r <= g for c in row) and any(c.l >= g for c in row):
                    return True
            return False

        n_split = sum(1 for row in band_rows if row_splits(row))
        if n_split < _UNRULED_MULTI_FRAC * len(band_rows):
            continue
        top = min(c.t for c in band) - 1.0
        bot = max(c.b for c in band) + 1.0
        row_centers = sorted(
            sum((c.t + c.b) / 2 for c in row) / len(row) for row in band_rows
        )
        row_bounds = (
            [top]
            + [
                (row_centers[k] + row_centers[k + 1]) / 2
                for k in range(len(row_centers) - 1)
            ]
            + [bot]
        )
        col_bounds = [left] + gutters + [right]
        built = _bin_into_lattice(band, row_bounds, col_bounds)
        if built is None:
            continue
        data, consumed = built
        cols_used = {
            cd.start_col for cd in data.cells if cd.text.strip()
        }
        if len(cols_used) < 2:
            continue
        # density: a real unruled table is mostly filled; aligned cover
        # art / label-value forms with phantom gutter columns leave the
        # grid majority-empty (redp5110 cover: 4x3 with 5 empty slots)
        filled = sum(
            1 for row in data.grid for cell in row if cell and cell.strip()
        )
        if filled * 100 < 60 * len(data.grid) * len(data.grid[0]):
            continue
        regions.append(
            TableRegion(
                bbox=(left, top, right, bot), data=data, cell_ids=consumed
            )
        )
    return regions


# pass B tunables
def _is_code_listing(band: list) -> bool:
    """Majority-monospace content = a framed/ruled code listing, not a
    table (LaTeX lstlisting/tcolorbox paints rules that otherwise pass
    the lattice tests); ``pdf/labels.py`` will label it CODE instead."""
    from doc_parser_spark.pdf import labels

    mono = sum(
        1
        for c in band
        if getattr(c, "font_name", "")
        and labels._MONO_RE.search(c.font_name)
    )
    return mono * 2 >= len(band) > 0


MIN_GUTTER = 6.0  # pt of whitespace that separates columns
MAX_CELL_WORDS = 6  # tables hold entries, not prose
MIN_SHORT_FRAC = 0.7  # share of cells that must be entry-like
_STACK_OVERLAP = 0.8  # mutual x-extent overlap for rules of one table


def _detect_rules_only(
    free_h: list[tuple[float, float, float]], cells: list
) -> list[TableRegion]:
    """Booktabs-style tables: >=3 stacked horizontal rules sharing an
    x-extent, columns recovered from whitespace gutters no cell crosses."""
    regions: list[TableRegion] = []
    stacks: list[list[tuple[float, float, float]]] = []
    for seg in sorted(free_h):
        y, x0, x1 = seg
        placed = False
        for stack in stacks:
            s_x0 = min(s[1] for s in stack)
            s_x1 = max(s[2] for s in stack)
            ov = min(x1, s_x1) - max(x0, s_x0)
            if ov >= _STACK_OVERLAP * min(x1 - x0, s_x1 - s_x0):
                stack.append(seg)
                placed = True
                break
        if not placed:
            stacks.append([seg])
    for stack in stacks:
        ys = _cluster_1d([s[0] for s in stack])
        if len(ys) < 3:
            continue
        left = min(s[1] for s in stack)
        right = max(s[2] for s in stack)
        top, bot = ys[0], ys[-1]
        band = [
            c
            for c in cells
            if top + 1.0 < (c.t + c.b) / 2 < bot - 1.0
            and c.l >= left - TOL
            and c.r <= right + TOL
            and c.text.strip()
        ]
        if len(band) < 4:
            continue
        short = sum(
            1 for c in band if len(c.text.split()) <= MAX_CELL_WORDS
        )
        if short < MIN_SHORT_FRAC * len(band):
            continue  # prose between separators, not a table
        if _is_code_listing(band):
            continue
        heights = sorted(c.b - c.t for c in band)
        med_h = heights[len(heights) // 2]
        rows_y = _cluster_1d(
            [(c.t + c.b) / 2 for c in band], tol=max(TOL, 0.6 * med_h)
        )
        if len(rows_y) < 2:
            continue
        # whitespace gutters: x ranges inside [left, right] covered by
        # no cell — these are the column separators
        ivals = sorted((c.l, c.r) for c in band)
        gutters: list[float] = []
        cover_hi = ivals[0][0]  # leading margin never counts as a gutter
        for lo, hi in ivals:
            if lo - cover_hi >= MIN_GUTTER and cover_hi > left:
                gutters.append((cover_hi + lo) / 2)
            cover_hi = max(cover_hi, hi)
        if not gutters:
            continue  # single column = not a table
        row_bounds = (
            [top]
            + [
                (rows_y[i] + rows_y[i + 1]) / 2
                for i in range(len(rows_y) - 1)
            ]
            + [bot]
        )
        col_bounds = [left] + gutters + [right]
        built = _bin_into_lattice(band, row_bounds, col_bounds)
        if built is None:
            continue
        data, consumed = built
        # demand real tabular shape: >=2 rows whose cells split columns,
        # and >=2 columns actually holding text (indented prose/code makes
        # phantom gutter columns that stay empty)
        by_row: dict[int, int] = {}
        cols_used: set[int] = set()
        for cd in data.cells:
            by_row[cd.start_row] = by_row.get(cd.start_row, 0) + 1
            if cd.text.strip():
                cols_used.add(cd.start_col)
        multi = sum(1 for v in by_row.values() if v >= 2)
        if multi < 2:
            continue
        # MOST rows must split into columns (the module contract): a
        # brochure/sidebar page between decorative full-width rules has
        # parallel text flows that share a gutter, but only a minority of
        # its line-rows land in both columns (redp5110 cover: 8/30)
        if multi * 2 < len(rows_y):
            continue
        if len(cols_used) < 2:
            continue
        regions.append(
            TableRegion(
                bbox=(left, top, right, bot), data=data, cell_ids=consumed
            )
        )
    return regions
