"""Hostile-input fuzz for the r5 extraction changes: the bidi
number-run attachment, epoch/Tc segmentation, wide-space splitting
(textengine.assemble_cells / _bidi_cell_text) and the free-form
reading-order fallback (layout.order_cells) must be total functions —
no crashes, no lost or duplicated content — on adversarial glyph
streams and cell layouts.
"""

from __future__ import annotations

import random

import pytest

from doc_parser_spark.pdf import layout
from doc_parser_spark.pdf.minipdf import TextCell
from doc_parser_spark.pdf.textengine import Glyph, _bidi_cell_text, assemble_cells

pytestmark = pytest.mark.unit

_CHARS = (
    "ab7 %-–−٪."
    "بتخلد"       # Arabic letters
    "ً"            # combining tanween
    "‏"      # RLM
    "ﬁ"           # ligature
)


def _rand_glyphs(rng: random.Random, n: int) -> list[Glyph]:
    out = []
    x = 0.0
    y = 700.0
    seg = 0
    for _ in range(n):
        ch = rng.choice(_CHARS)
        if rng.random() < 0.1:
            y -= rng.choice([0.0, 3.0, 14.0])
        if rng.random() < 0.2:
            seg += rng.randint(1, 3)
        if rng.random() < 0.15:
            x = rng.uniform(0, 500)  # pen jump (backward allowed)
        w = rng.choice([0.0, 2.0, 5.0, 12.0])
        out.append(
            Glyph(
                text=ch, x0=x, x1=x + w, y=y,
                size=rng.choice([8.0, 10.0, 13.0]),
                spaced=rng.random() < 0.8,
                font=rng.choice([1, 2]),
                font_name=rng.choice(["", "Cambria", "Arial"]),
                tc=rng.choice([0.0, 0.01]),
                seg=seg,
            )
        )
        x += w
    return out


def test_bidi_cell_text_is_total_and_content_preserving():
    rng = random.Random(140)
    for trial in range(200):
        glyphs = _rand_glyphs(rng, rng.randint(1, 40))
        runs = _bidi_cell_text(list(glyphs))
        flat = [g for r in runs for g in r]
        # no glyph lost or duplicated, whatever the direction mix
        assert sorted(id(g) for g in flat) == sorted(id(g) for g in glyphs)


def test_assemble_cells_is_total_on_adversarial_streams():
    rng = random.Random(141)
    for trial in range(60):
        glyphs = _rand_glyphs(rng, rng.randint(0, 80))
        cells = assemble_cells(list(glyphs), 792.0, 1, TextCell)
        ink = "".join(
            sorted("".join(g.text for g in glyphs if not g.text.isspace()))
        )
        got = "".join(sorted(c for cell in cells for c in cell.text
                             if not c.isspace()))
        # every non-space character survives into some cell exactly once
        # (double-strike dedup only fires on >70% overlapped repeats of
        # nonzero width; zero-width repeats at one pen position qualify)
        assert len(got) <= len(ink)
        assert set(got) <= set(ink)


def test_order_cells_is_a_permutation_on_random_layouts():
    rng = random.Random(142)
    for trial in range(120):
        n = rng.randint(0, 35)
        cells = []
        for i in range(n):
            x = rng.uniform(0, 560)
            y = rng.uniform(60, 740)
            w = rng.uniform(5, rng.choice([60, 200, 460]))
            h = rng.choice([8.0, 11.0, 15.0])
            cells.append(
                TextCell(index=i, text=f"c{i}", l=x, t=y, r=x + w, b=y + h,
                         font_size=h, page_no=1)
            )
        ordered = layout.order_cells(list(cells), 612.0)
        assert sorted(c.text for c in ordered) == sorted(
            c.text for c in cells
        )


def test_order_cells_islands_never_split_blocks_content():
    # structured stress: column grids with random islands — output is
    # always a permutation and never raises, including degenerate
    # overlap-everything layouts
    rng = random.Random(143)
    for trial in range(40):
        cells = []
        idx = 0
        for col in range(rng.randint(1, 3)):
            x0 = 60 + col * 180
            for row in range(rng.randint(1, 10)):
                cells.append(TextCell(index=idx, text=f"b{idx}", l=x0,
                                      t=80 + row * 14.0, r=x0 + 150,
                                      b=90 + row * 14.0, font_size=10,
                                      page_no=1))
                idx += 1
        for _ in range(rng.randint(0, 3)):  # islands anywhere
            x = rng.uniform(40, 400)
            y = rng.uniform(80, 600)
            cells.append(TextCell(index=idx, text=f"i{idx}", l=x, t=y,
                                  r=x + rng.uniform(40, 300), b=y + 16,
                                  font_size=13, page_no=1))
            idx += 1
        ordered = layout.order_cells(list(cells), 612.0)
        assert sorted(c.text for c in ordered) == sorted(
            c.text for c in cells
        )


def test_order_cells_is_input_order_invariant():
    # the reading order must be a function of geometry alone — shuffling
    # the input cell list must not change the output sequence
    rng = random.Random(144)
    for trial in range(40):
        n = rng.randint(2, 30)
        cells = []
        for i in range(n):
            x = rng.uniform(0, 560)
            y = rng.uniform(60, 740)
            cells.append(
                TextCell(index=i, text=f"c{i}", l=x, t=y,
                         r=x + rng.uniform(10, 300), b=y + 11.0,
                         font_size=10, page_no=1)
            )
        ref = [c.text for c in layout.order_cells(list(cells), 612.0)]
        for _ in range(3):
            shuffled = list(cells)
            rng.shuffle(shuffled)
            got = [c.text for c in layout.order_cells(shuffled, 612.0)]
            assert got == ref
