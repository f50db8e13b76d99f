"""Rotated-page OCR geometry — deterministic support math for the OCR
plug-point (reference: docling/utils/orientation.py + utils/ocr_utils.py).

The OCR engines themselves are a provider boundary (``ocr_fn`` in
``pdf/extractor.py``), but the coordinate algebra that maps an engine's
boxes on a rotated/scaled page image back into page space is pure math —
ported exactly so a plugged engine composes correctly.

A bounding rectangle is 4 corner points starting at the bottom-left
corner (r_0) and proceeding counterclockwise, in TOPLEFT page
coordinates — the reference's ``BoundingRectangle`` convention.
"""

from __future__ import annotations

from dataclasses import dataclass

CLIPPED_ORIENTATIONS = [0, 90, 180, 270]


@dataclass
class Rect:
    r_x0: float
    r_y0: float
    r_x1: float
    r_y1: float
    r_x2: float
    r_y2: float
    r_x3: float
    r_y3: float


def map_tesseract_script(script: str) -> str:
    """Tesseract script name → model language key (ocr_utils.py:10-18)."""
    if script in ("Katakana", "Hiragana"):
        return "Japanese"
    if script == "Han":
        return "HanS"
    if script == "Korean":
        return "Hangul"
    return script


def parse_tesseract_orientation(orientation: str) -> int:
    """Clockwise tesseract degrees → counterclockwise [0,360) angle
    (ocr_utils.py:20-32)."""
    parsed = int(orientation)
    if parsed not in CLIPPED_ORIENTATIONS:
        raise ValueError(
            f"invalid tesseract document orientation {orientation}, "
            f"expected orientation: {sorted(CLIPPED_ORIENTATIONS)}"
        )
    return (-parsed) % 360


def rotate_bounding_box(
    l: float, t: float, width: float, height: float, angle: int, im_size: tuple
) -> Rect:
    """Axis-aligned TOPLEFT box on a rotated image → corner rectangle in
    the unrotated frame (orientation.py:9-66, corner-for-corner)."""
    left, top = l, t
    im_w, im_h = im_size
    angle = angle % 360
    if angle == 0:
        return Rect(left, top + height, left + width, top + height,
                    left + width, top, left, top)
    if angle == 90:
        r_x0 = top + height
        r_y0 = im_w - left
        return Rect(r_x0, r_y0, r_x0, r_y0 - width,
                    r_x0 - height, r_y0 - width, r_x0 - height, r_y0)
    if angle == 180:
        r_x0 = im_w - left
        r_y0 = im_h - (top + height)
        return Rect(r_x0, r_y0, r_x0 - width, r_y0,
                    r_x0 - width, r_y0 + height, r_x0, r_y0 + height)
    if angle == 270:
        r_x0 = im_h - (top + height)
        r_y0 = left
        return Rect(r_x0, r_y0, r_x0, r_y0 + width,
                    r_x0 + height, r_y0 + width, r_x0 + height, r_y0)
    raise ValueError(
        f"invalid orientation {angle}, expected values in:"
        f" {sorted(CLIPPED_ORIENTATIONS)}"
    )


def ocr_box_to_rect(
    l: float, t: float, width: float, height: float,
    *, scale: float, orientation: int, im_size: tuple,
    offset_l: float = 0.0, offset_t: float = 0.0,
) -> Rect:
    """Engine box on a scaled+rotated crop → page-space rectangle
    (ocr_utils.py:35-71): rotate, un-scale, then shift by the crop
    offset."""
    r = rotate_bounding_box(l, t, width, height, orientation, im_size)
    vals = [getattr(r, f) / scale for f in (
        "r_x0", "r_y0", "r_x1", "r_y1", "r_x2", "r_y2", "r_x3", "r_y3")]
    for i in range(0, 8, 2):
        vals[i] += offset_l
        vals[i + 1] += offset_t
    return Rect(*vals)
