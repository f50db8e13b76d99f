"""OCR orientation math units (reference: docling/utils/orientation.py,
utils/ocr_utils.py — corner-for-corner parity)."""

import pytest

from doc_parser_spark.pdf.orientation import (
    map_tesseract_script,
    ocr_box_to_rect,
    parse_tesseract_orientation,
    rotate_bounding_box,
)

pytestmark = pytest.mark.unit


def _corners(r):
    return [(r.r_x0, r.r_y0), (r.r_x1, r.r_y1), (r.r_x2, r.r_y2), (r.r_x3, r.r_y3)]


def test_identity_rotation_is_ccw_from_bottom_left():
    r = rotate_bounding_box(10, 20, 30, 5, 0, (100, 200))
    assert _corners(r) == [(10, 25), (40, 25), (40, 20), (10, 20)]


def test_rotation_90():
    # box (l=10,t=20,w=30,h=5) on a 100x200 image rotated 90°
    r = rotate_bounding_box(10, 20, 30, 5, 90, (100, 200))
    assert _corners(r) == [(25, 90), (25, 60), (20, 60), (20, 90)]


def test_rotation_180():
    r = rotate_bounding_box(10, 20, 30, 5, 180, (100, 200))
    assert _corners(r) == [(90, 175), (60, 175), (60, 180), (90, 180)]


def test_rotation_270():
    r = rotate_bounding_box(10, 20, 30, 5, 270, (100, 200))
    assert _corners(r) == [(175, 10), (175, 40), (180, 40), (180, 10)]


def test_all_rotations_preserve_side_lengths():
    import math

    for angle in (0, 90, 180, 270):
        r = rotate_bounding_box(7, 13, 40, 9, angle, (300, 500))
        c = _corners(r)
        d01 = math.dist(c[0], c[1])
        d12 = math.dist(c[1], c[2])
        assert {round(d01), round(d12)} == {40, 9}


def test_invalid_angle_raises():
    with pytest.raises(ValueError):
        rotate_bounding_box(0, 0, 1, 1, 45, (10, 10))


def test_parse_tesseract_orientation():
    # clockwise tesseract degrees → counterclockwise angle (ocr_utils.py:20-32)
    assert parse_tesseract_orientation("0") == 0
    assert parse_tesseract_orientation("90") == 270
    assert parse_tesseract_orientation("180") == 180
    assert parse_tesseract_orientation("270") == 90
    with pytest.raises(ValueError):
        parse_tesseract_orientation("45")


def test_map_tesseract_script():
    assert map_tesseract_script("Katakana") == "Japanese"
    assert map_tesseract_script("Hiragana") == "Japanese"
    assert map_tesseract_script("Han") == "HanS"
    assert map_tesseract_script("Korean") == "Hangul"
    assert map_tesseract_script("Latin") == "Latin"


def test_ocr_box_scale_and_offset():
    # 2x-scaled crop at page offset (100, 50): un-scale then shift
    r = ocr_box_to_rect(
        10, 20, 30, 5, scale=2.0, orientation=0, im_size=(100, 200),
        offset_l=100.0, offset_t=50.0,
    )
    assert _corners(r) == [(105.0, 62.5), (120.0, 62.5), (120.0, 60.0), (105.0, 60.0)]
