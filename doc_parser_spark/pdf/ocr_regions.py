"""Deterministic OCR region detection (pure numpy).

Port of the reference's ``docling/models/base_ocr_model.py:40-113``
(``get_ocr_rects``): painted-bitmap rects are rasterized into a binary
page mask, dilated by a 20x20 box (merging nearby images), and the
connected components' bounding boxes become the rectangles handed to an
OCR engine. Coverage decides the mode:

* coverage > max(0.75, bitmap_area_threshold)  -> one full-page rect
* coverage > bitmap_area_threshold (def. 0.05) -> per-component rects
* otherwise                                    -> no OCR at all

Plus the programmatic-cell filter/merge (``base_ocr_model.py:115-170``):
OCR cells that intersect ANY programmatic cell are dropped (the
reference's R-tree probe is an existence test, so a vectorized
numpy interval check is an exact replacement), then existing + surviving
OCR cells are concatenated and re-indexed.

The engines themselves stay a provider boundary (``ocr_fn``); everything
up to and after the engine call is real and tested.
"""

from __future__ import annotations

import numpy as np

BITMAP_COVERAGE_THRESHOLD = 0.75  # base_ocr_model.py:43
DEFAULT_BITMAP_AREA_THRESHOLD = 0.05  # pipeline_options.py:78
_DILATE = 20  # 20x20 structure element (base_ocr_model.py:61-64)
_MAX_MASK_PIXELS = 64_000_000  # degenerate MediaBox guard (~8k x 8k)

Rect = tuple[float, float, float, float]  # (l, t, r, b), top-left origin


def _box_dilate(mask: np.ndarray, k: int) -> np.ndarray:
    """Binary dilation by a k x k ones structure via an integral image.

    ``scipy.ndimage.binary_dilation(structure=ones((k,k)))`` with the
    default centered origin reaches offsets ``-k//2 .. k//2 - 1`` on each
    axis for even k; a window sum > 0 over the same span is identical."""
    if not mask.any():
        return mask
    h, w = mask.shape
    lo, hi = k // 2, k - k // 2  # 10 back, 10 forward for k=20
    ii = np.zeros((h + 1, w + 1), dtype=np.int64)
    np.cumsum(np.cumsum(mask, axis=0), axis=1, out=ii[1:, 1:])
    r0 = np.clip(np.arange(h) - lo, 0, h)
    r1 = np.clip(np.arange(h) + hi, 0, h)
    c0 = np.clip(np.arange(w) - lo, 0, w)
    c1 = np.clip(np.arange(w) + hi, 0, w)
    win = (
        ii[r1[:, None], c1[None, :]]
        - ii[r0[:, None], c1[None, :]]
        - ii[r1[:, None], c0[None, :]]
        + ii[r0[:, None], c0[None, :]]
    )
    return win > 0


def _label_components(mask: np.ndarray) -> list[tuple[int, int, int, int]]:
    """4-connected components of a binary mask -> [(rmin, cmin, rmax, cmax)].

    Run-length two-pass with union-find (the classic algorithm behind
    ``scipy.ndimage.label``; rows hold few runs after dilation, so the
    Python loop is over runs, not pixels)."""
    parent: list[int] = []

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    runs_prev: list[tuple[int, int, int]] = []  # (c0, c1, label) exclusive c1
    boxes: dict[int, list[int]] = {}
    for r in range(mask.shape[0]):
        row = mask[r]
        if not row.any():
            runs_prev = []
            continue
        d = np.diff(row.astype(np.int8))
        starts = list(np.flatnonzero(d == 1) + 1)
        ends = list(np.flatnonzero(d == -1) + 1)
        if row[0]:
            starts.insert(0, 0)
        if row[-1]:
            ends.append(len(row))
        runs_cur: list[tuple[int, int, int]] = []
        for c0, c1 in zip(starts, ends):
            lbl = -1
            for p0, p1, plbl in runs_prev:
                if p0 < c1 and c0 < p1:  # column overlap (4-connectivity)
                    lbl = plbl if lbl < 0 else (union(lbl, plbl) or find(lbl))
            if lbl < 0:
                lbl = len(parent)
                parent.append(lbl)
            runs_cur.append((c0, c1, lbl))
        runs_prev = runs_cur
        for c0, c1, lbl in runs_cur:
            box = boxes.setdefault(lbl, [r, c0, r, c1 - 1])
            box[0] = min(box[0], r)
            box[1] = min(box[1], c0)
            box[2] = max(box[2], r)
            box[3] = max(box[3], c1 - 1)
    merged: dict[int, list[int]] = {}
    for lbl, (r0, c0, r1, c1) in boxes.items():
        root = find(lbl)
        box = merged.setdefault(root, [r0, c0, r1, c1])
        box[0] = min(box[0], r0)
        box[1] = min(box[1], c0)
        box[2] = max(box[2], r1)
        box[3] = max(box[3], c1)
    return [tuple(b) for _, b in sorted(merged.items())]


def find_ocr_rects(
    width: float,
    height: float,
    bitmap_rects: list[Rect],
    *,
    bitmap_area_threshold: float = DEFAULT_BITMAP_AREA_THRESHOLD,
    force_full_page_ocr: bool = False,
) -> tuple[float, list[Rect]]:
    """(coverage, rects to OCR) for one page — base_ocr_model.py:46-113.

    ``bitmap_rects`` are painted-image rects in page points, top-left
    origin (``PdfPage.bitmap_rects``). Returns page-point rects."""
    w_px, h_px = int(round(width)), int(round(height))
    if w_px <= 0 or h_px <= 0 or w_px * h_px > _MAX_MASK_PIXELS:
        return 0.0, []
    mask = np.zeros((h_px, w_px), dtype=bool)
    for l, t, r, b in bitmap_rects:
        x0 = max(0, min(w_px, int(round(l))))
        x1 = max(0, min(w_px, int(round(r)) + 1))  # ImageDraw fills inclusive
        y0 = max(0, min(h_px, int(round(t))))
        y1 = max(0, min(h_px, int(round(b)) + 1))
        if x1 > x0 and y1 > y0:
            mask[y0:y1, x0:x1] = True
    dilated = _box_dilate(mask, _DILATE)
    coverage = float(dilated.sum()) / (width * height)
    if force_full_page_ocr or coverage > max(
        BITMAP_COVERAGE_THRESHOLD, bitmap_area_threshold
    ):
        return coverage, [(0.0, 0.0, float(width), float(height))]
    if coverage > bitmap_area_threshold:
        # find_objects slices -> (start, stop-1) inclusive boxes
        return coverage, [
            (float(c0), float(r0), float(c1), float(r1))
            for r0, c0, r1, c1 in _label_components(dilated)
        ]
    return coverage, []


def filter_ocr_cells(ocr_cells: list, programmatic_cells: list) -> list:
    """Drop OCR cells that intersect any programmatic cell
    (base_ocr_model.py:115-140 — existence probe, closed intervals)."""
    if not programmatic_cells or not ocr_cells:
        return list(ocr_cells)
    pl = np.array([c.l for c in programmatic_cells])
    pt = np.array([c.t for c in programmatic_cells])
    pr = np.array([c.r for c in programmatic_cells])
    pb = np.array([c.b for c in programmatic_cells])
    out = []
    for c in ocr_cells:
        overlaps = (pl <= c.r) & (c.l <= pr) & (pt <= c.b) & (c.t <= pb)
        if not overlaps.any():
            out.append(c)
    return out


def combine_cells(
    existing_cells: list, ocr_cells: list, *, force_full_page_ocr: bool = False
) -> list:
    """Merge programmatic + OCR cells and re-index
    (base_ocr_model.py:160-175 ``_combine_cells``)."""
    if force_full_page_ocr:
        combined = list(ocr_cells)
    else:
        combined = list(existing_cells) + filter_ocr_cells(
            ocr_cells, existing_cells
        )
    for i, cell in enumerate(combined):
        cell.index = i
    return combined
