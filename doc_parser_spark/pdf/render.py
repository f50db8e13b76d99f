"""Deterministic page rasterizer for the parsed PDF model.

The reference renders page images through pypdfium2
(``docling/backend/docling_parse_v4_backend.py``: ``render(scale=...)``
behind ``pdf_lock``) and crops picture regions from the rendered page
(``docling/datamodel/base_models.py``: ``Page.get_image(scale, cropbox)``).
No native rasterizer ships in this environment, so this module renders the
*parsed geometry* instead of glyph outlines: a white canvas at
``72 * scale`` dpi where every :class:`~doc_parser_spark.pdf.minipdf.TextCell`
paints a per-character ink pattern derived from the character codes.

Properties that make it a real stand-in rather than a stub:

* fully deterministic — same page bytes → byte-identical PNG;
* geometry-faithful — ink lands exactly inside each cell's bbox at the
  requested scale, so bbox crops (picture/table regions) contain exactly
  the cells they cover, like a true render would;
* content-sensitive — changing one character changes the pixels, so
  image-level dedup/feature tests exercise realistic variation.

Swapping in a glyph rasterizer later changes only ``_paint_cell``.
"""

from __future__ import annotations

import numpy as np

from doc_parser_spark.pdf.minipdf import PdfPage

BACKGROUND = 255
INK_MIN = 32  # darkest ink; per-char value in [INK_MIN, INK_MIN + 159]


def _paint_cell(canvas: np.ndarray, cell, scale: float) -> None:
    h, w = canvas.shape
    l = int(round(cell.l * scale))
    t = int(round(cell.t * scale))
    r = int(round(cell.r * scale))
    b = int(round(cell.b * scale))
    l, r = max(0, min(l, w)), max(0, min(r, w))
    t, b = max(0, min(t, h)), max(0, min(b, h))
    if r <= l or b <= t or not cell.text:
        return
    # x-height band: glyphs occupy the middle ~70% of the line box
    y0 = t + max(0, int(round((b - t) * 0.15)))
    y1 = b - max(0, int(round((b - t) * 0.15)))
    if y1 <= y0:
        y0, y1 = t, b
    n = len(cell.text)
    xs = np.linspace(l, r, n + 1)
    for i, ch in enumerate(cell.text):
        if ch.isspace():
            continue
        x0, x1 = int(xs[i]), int(xs[i + 1])
        if x1 <= x0:
            x1 = min(x0 + 1, w)
        ink = INK_MIN + (ord(ch) * 37) % 160
        canvas[y0:y1, x0:x1] = np.minimum(canvas[y0:y1, x0:x1], ink)


def render_page(page: PdfPage, scale: float = 1.0) -> np.ndarray:
    """Rasterize one parsed page to a uint8 grayscale (H, W) array."""
    w = max(1, int(round(page.width * scale)))
    h = max(1, int(round(page.height * scale)))
    canvas = np.full((h, w), BACKGROUND, dtype=np.uint8)
    for cell in page.cells:
        _paint_cell(canvas, cell, scale)
    return canvas


def crop_region(
    image: np.ndarray, l: float, t: float, r: float, b: float
) -> np.ndarray:
    """Crop a [0,1]-normalized bbox from a rendered page image.

    Normalized coords match the chunker's bbox contract
    (``core/chunker.py: compose_vectors`` — reference
    basic_processor.py:778-795 divides by page size)."""
    h, w = image.shape[:2]
    x0 = max(0, min(int(round(l * w)), w))
    x1 = max(0, min(int(round(r * w)), w))
    y0 = max(0, min(int(round(t * h)), h))
    y1 = max(0, min(int(round(b * h)), h))
    if x1 <= x0:
        x1 = min(x0 + 1, w)
    if y1 <= y0:
        y1 = min(y0 + 1, h)
    return image[y0:y1, x0:x1]
