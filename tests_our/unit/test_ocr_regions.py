"""OCR region detection (pdf/ocr_regions.py) — numpy port of the
reference's deterministic pre/post-OCR stages (base_ocr_model.py:40-170):
rasterize bitmap rects -> 20x20 dilation -> connected components ->
region rects; programmatic-cell filter; combine/re-index. End-to-end:
a fake ``ocr_fn`` roundtrips scanned pages through ``extract_pdf``."""

import numpy as np

from doc_parser_spark.core.serialize import export_text
from doc_parser_spark.pdf import minipdf, ocr_regions, writer
from doc_parser_spark.pdf.extractor import extract_pdf


def _cell(i, l, t, r, b, text="x", page_no=1):
    return minipdf.TextCell(
        index=i, text=text, l=l, t=t, r=r, b=b, font_size=11.0, page_no=page_no
    )


# -- find_ocr_rects -----------------------------------------------------------


def test_no_bitmaps_no_regions():
    cov, rects = ocr_regions.find_ocr_rects(612, 792, [])
    assert cov == 0.0 and rects == []


def test_low_coverage_drops_all_rects():
    # a 40x40 image is ~0.33% of the page < 5% threshold -> no OCR at all
    cov, rects = ocr_regions.find_ocr_rects(612, 792, [(100, 100, 140, 140)])
    assert 0 < cov < 0.05
    assert rects == []


def test_nearby_rects_merge_distant_stay_separate():
    # two images 15pt apart merge through the 20x20 dilation; a third one
    # 300pt away stays its own component
    rects_in = [
        (50, 50, 250, 250),
        (265, 50, 400, 250),  # 15pt gap to the first
        (50, 560, 250, 700),  # far below
    ]
    cov, rects = ocr_regions.find_ocr_rects(612, 792, rects_in)
    assert 0.05 < cov < 0.75
    assert len(rects) == 2
    (l0, t0, r0, b0), (l1, t1, r1, b1) = sorted(rects, key=lambda r: r[1])
    # merged component spans both top images (plus dilation margin)
    assert l0 <= 50 and r0 >= 400 and t0 <= 50 and b0 >= 250
    assert abs(l1 - 50) <= 11 and abs(b1 - 700) <= 11


def test_full_page_when_dominantly_bitmap():
    cov, rects = ocr_regions.find_ocr_rects(612, 792, [(0, 0, 612, 792)])
    assert cov > 0.75
    assert rects == [(0.0, 0.0, 612.0, 792.0)]


def test_force_full_page_overrides_coverage():
    cov, rects = ocr_regions.find_ocr_rects(
        612, 792, [], force_full_page_ocr=True
    )
    assert rects == [(0.0, 0.0, 612.0, 792.0)]


def test_label_components_matches_bruteforce():
    # deterministic pseudo-random masks vs a flood-fill reference
    rng = np.random.RandomState(7)
    for _ in range(20):
        mask = rng.rand(40, 50) > 0.72

        def flood_boxes(m):
            seen = np.zeros_like(m, dtype=bool)
            boxes = []
            for r in range(m.shape[0]):
                for c in range(m.shape[1]):
                    if m[r, c] and not seen[r, c]:
                        stack = [(r, c)]
                        seen[r, c] = True
                        r0 = r1 = r
                        c0 = c1 = c
                        while stack:
                            y, x = stack.pop()
                            r0, r1 = min(r0, y), max(r1, y)
                            c0, c1 = min(c0, x), max(c1, x)
                            for dy, dx in (
                                (1, 0), (-1, 0), (0, 1), (0, -1),
                            ):
                                ny, nx = y + dy, x + dx
                                if (
                                    0 <= ny < m.shape[0]
                                    and 0 <= nx < m.shape[1]
                                    and m[ny, nx]
                                    and not seen[ny, nx]
                                ):
                                    seen[ny, nx] = True
                                    stack.append((ny, nx))
                        boxes.append((r0, c0, r1, c1))
            return sorted(boxes)

        ours = sorted(ocr_regions._label_components(mask))
        assert ours == flood_boxes(mask)


def test_box_dilate_matches_bruteforce():
    rng = np.random.RandomState(3)
    mask = rng.rand(30, 35) > 0.95
    k = 20
    lo, hi = k // 2, k - k // 2
    ref = np.zeros_like(mask)
    h, w = mask.shape
    for r in range(h):
        for c in range(w):
            ref[r, c] = mask[
                max(0, r - lo) : min(h, r + hi),
                max(0, c - lo) : min(w, c + hi),
            ].any()
    assert (ocr_regions._box_dilate(mask, k) == ref).all()


# -- cell filter / combine ----------------------------------------------------


def test_filter_drops_overlapping_ocr_cells():
    prog = [_cell(0, 100, 100, 200, 120)]
    ocr = [
        _cell(0, 150, 110, 260, 130, "overlap"),  # intersects -> dropped
        _cell(1, 300, 300, 400, 320, "clear"),  # disjoint -> kept
        _cell(2, 200, 120, 250, 140, "touch"),  # edge-touch = intersect
    ]
    kept = ocr_regions.filter_ocr_cells(ocr, prog)
    assert [c.text for c in kept] == ["clear"]


def test_combine_reindexes_and_force_full_page():
    prog = [_cell(5, 100, 100, 200, 120, "prog")]
    ocr = [_cell(9, 300, 300, 400, 320, "ocr")]
    combined = ocr_regions.combine_cells(prog, ocr)
    assert [c.text for c in combined] == ["prog", "ocr"]
    assert [c.index for c in combined] == [0, 1]
    forced = ocr_regions.combine_cells(prog, ocr, force_full_page_ocr=True)
    assert [c.text for c in forced] == ["ocr"] and forced[0].index == 0


# -- bitmap rect recovery from the parse --------------------------------------


def test_parse_pdf_recovers_image_placements():
    pdf = writer.write_pdf_with_images(
        [([(72, 700, 12, "caption")], [(100, 200, 300, 250)])]
    )
    (page,) = minipdf.parse_pdf(pdf)
    assert len(page.bitmap_rects) == 1
    l, t, r, b = page.bitmap_rects[0]
    # placement (x=100, y=200, w=300, h=250) bottom-left -> top-left origin
    assert (l, r) == (100.0, 400.0)
    assert (t, b) == (792.0 - 450.0, 792.0 - 200.0)


# -- end-to-end through extract_pdf -------------------------------------------


def test_fake_ocr_fn_roundtrips_scanned_pdf():
    # page 1: text only; page 2: scanned (one full-page image, no text)
    pdf = writer.write_pdf_with_images(
        [
            ([(72, 700, 12, "digital text")], []),
            ([], [(0, 0, 612, 792)]),
        ]
    )

    calls = []

    def fake_ocr(page, ocr_rects):
        calls.append((page.page_no, tuple(ocr_rects)))
        return [
            _cell(0, 72, 100, 200, 112, "scanned words", page.page_no)
        ]

    doc, fallback = extract_pdf(pdf, ocr_fn=fake_ocr)
    assert not fallback
    text = export_text(doc)
    assert "digital text" in text and "scanned words" in text
    # page 1 has no bitmaps and has cells -> engine never called for it
    assert [pno for pno, _ in calls] == [2]
    assert calls[0][1] == ((0.0, 0.0, 612.0, 792.0),)


def test_region_ocr_merges_with_programmatic_cells():
    # one page: real text at top + a 45% bitmap region below -> the engine
    # runs on the region; overlapping OCR duplicates of the programmatic
    # text are filtered, non-overlapping OCR text is merged in
    pdf = writer.write_pdf_with_images(
        [([(72, 740, 12, "born digital")], [(72, 80, 540, 480)])]
    )

    def fake_ocr(page, ocr_rects):
        assert len(ocr_rects) == 1
        l, t, r, b = ocr_rects[0]
        assert t > 200  # region sits in the lower half (top-left origin)
        return [
            _cell(0, 72, 40, 180, 60, "born digital"),  # overlaps prog cell
            _cell(1, l + 10, t + 10, l + 150, t + 24, "figure label"),
        ]

    doc, _ = extract_pdf(pdf, ocr_fn=fake_ocr)
    text = export_text(doc)
    assert text.count("born digital") == 1
    assert "figure label" in text
