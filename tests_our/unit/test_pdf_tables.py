"""Ruled-table grid recovery (pdf/tables.py): painted grid lines ->
TableData structs, the deterministic stand-in for the reference's
TableFormer NN path (docling/models/table_structure_model.py, ML-scoped
out per SURVEY.md §7 — PDFs previously emitted no table struct at all)."""

from doc_parser_spark.core.serialize import export_markdown, export_text
from doc_parser_spark.pdf import minipdf, tables, writer
from doc_parser_spark.pdf.extractor import extract_pdf

COLS = [100.0, 120.0, 90.0]
ROWS = [24.0, 24.0, 24.0]
TEXTS = [
    ["name", "qty", "price"],
    ["bolt", "12", "0.40"],
    ["nut", "7", "0.15"],
]


def _ruled_pdf(extra_runs=None, x=72.0, y_top=700.0):
    runs = writer.table_cell_runs(x, y_top, COLS, ROWS, TEXTS)
    if extra_runs:
        runs = list(extra_runs) + runs
    ops = writer.table_ops(x, y_top, COLS, ROWS)
    return writer.write_pdf_with_graphics([(runs, ops)])


def test_rulings_recovered_from_content_stream():
    (page,) = minipdf.parse_pdf(_ruled_pdf())
    hs = [r for r in page.rulings if abs(r[1] - r[3]) <= 0.5]
    vs = [r for r in page.rulings if abs(r[0] - r[2]) <= 0.5]
    assert len(hs) == 4 and len(vs) == 4  # 3x3 grid = 4 lines each way


def test_detect_3x3_grid():
    (page,) = minipdf.parse_pdf(_ruled_pdf())
    regions = tables.detect_tables(page.cells, page.rulings)
    assert len(regions) == 1
    data = regions[0].data
    assert (data.num_rows, data.num_cols) == (3, 3)
    assert data.grid == TEXTS
    # every text cell was consumed out of the flow
    assert len(regions[0].cell_ids) == 9


def test_spanning_cell_gets_col_span():
    # header row: one cell spanning all three columns (no inner v-lines
    # crossing it is irrelevant — span comes from the text bbox)
    x, y_top = 72.0, 700.0
    runs = writer.table_cell_runs(
        x, y_top, COLS, ROWS, [["", "", ""], *TEXTS[1:]]
    )
    # wide header text crossing both inner column boundaries
    runs.append(
        (
            x + 10,
            y_top - 16,
            9.0,
            "hardware inventory summary table for the whole warehouse floor",
        )
    )
    ops = writer.table_ops(x, y_top, COLS, ROWS)
    pdf = writer.write_pdf_with_graphics([(runs, ops)])
    (page,) = minipdf.parse_pdf(pdf)
    regions = tables.detect_tables(page.cells, page.rulings)
    assert len(regions) == 1
    header = [c for c in regions[0].data.cells if c.start_row == 0]
    assert len(header) == 1 and header[0].col_span == 3


def test_unrelated_rules_do_not_make_tables():
    # underlines + a horizontal separator: no vertical family -> no table
    runs = writer.paragraph_runs(["alpha beta", "gamma delta"])
    ops = "72 690 m 300 690 l S 72 660 m 540 660 l S 72 640 m 200 640 l S"
    (page,) = minipdf.parse_pdf(writer.write_pdf_with_graphics([(runs, ops)]))
    assert tables.detect_tables(page.cells, page.rulings) == []


def test_clip_only_paths_ignored():
    runs = writer.paragraph_runs(["clip test"])
    ops = "0 0 612 792 re W n"  # clipping rect, never painted
    (page,) = minipdf.parse_pdf(writer.write_pdf_with_graphics([(runs, ops)]))
    assert page.rulings == []


def test_extract_pdf_emits_table_struct_in_reading_order():
    before = (72.0, 740.0, 11.0, "Intro paragraph above the table.")
    after = (72.0, 560.0, 11.0, "Closing remarks below the table.")
    pdf = _ruled_pdf(extra_runs=[before])
    # splice the closing line in: rebuild with both
    runs = [before, after] + writer.table_cell_runs(
        72.0, 700.0, COLS, ROWS, TEXTS
    )
    ops = writer.table_ops(72.0, 700.0, COLS, ROWS)
    pdf = writer.write_pdf_with_graphics([(runs, ops)])
    doc, fallback = extract_pdf(pdf)
    assert not fallback
    tbls = doc.tables()
    assert len(tbls) == 1 and tbls[0].table.grid == TEXTS
    md = export_markdown(doc)
    assert "| name" in md and "qty" in md and "bolt" in md
    # reading order: intro, table, closing
    assert (
        md.index("Intro paragraph")
        < md.index("| name")
        < md.index("Closing remarks")
    )
    # table text does not double-emit as body text
    txt_wo_tables = " ".join(
        n.text for n in doc.nodes if n.label == "text"
    )
    assert "bolt" not in txt_wo_tables


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    n_rows=st.integers(2, 5),
    n_cols=st.integers(2, 4),
    col_w=st.integers(60, 120),
    row_h=st.integers(18, 30),
    x=st.integers(40, 150),
    y_top=st.integers(400, 720),
    seed=st.integers(0, 10_000),
)
def test_property_ruled_grid_roundtrip(
    n_rows, n_cols, col_w, row_h, x, y_top, seed
):
    """Any fully ruled grid the writer paints is recovered exactly:
    same dimensions, same per-cell text placement."""
    import random

    rng = random.Random(seed)
    cols = [float(col_w + rng.randint(0, 30)) for _ in range(n_cols)]
    rows = [float(row_h) for _ in range(n_rows)]
    texts = [
        [f"c{r}x{c}" if rng.random() > 0.15 else "" for c in range(n_cols)]
        for r in range(n_rows)
    ]
    runs = writer.table_cell_runs(x, y_top, cols, rows, texts)
    ops = writer.table_ops(x, y_top, cols, rows)
    (page,) = minipdf.parse_pdf(writer.write_pdf_with_graphics([(runs, ops)]))
    regions = tables.detect_tables(page.cells, page.rulings)
    assert len(regions) == 1
    data = regions[0].data
    assert (data.num_rows, data.num_cols) == (n_rows, n_cols)
    expect = [[t if t else None for t in row] for row in texts]
    assert data.grid == expect


def _rule(x0, x1, y):
    return f"{x0:g} {y:g} m {x1:g} {y:g} l S"


def test_booktabs_rules_only_table():
    # LaTeX booktabs: toprule/midrule/bottomrule, NO vertical lines;
    # columns come from whitespace gutters
    x, w = 72.0, 300.0
    rows = [
        ("name", "qty", "price"),
        ("bolt", "12", "0.40"),
        ("nut", "7", "0.15"),
    ]
    runs = []
    y = 690.0
    for r, row in enumerate(rows):
        for c, txt in enumerate(row):
            runs.append((x + 8 + c * 110, y - 20 * r, 9.0, txt))
    ops = " ".join(
        [
            _rule(x, x + w, 700),  # toprule
            _rule(x, x + w, 680),  # midrule under the header
            _rule(x, x + w, 640),  # bottomrule
        ]
    )
    (page,) = minipdf.parse_pdf(writer.write_pdf_with_graphics([(runs, ops)]))
    regions = tables.detect_tables(page.cells, page.rulings)
    assert len(regions) == 1
    data = regions[0].data
    assert data.num_cols == 3 and data.num_rows == 3
    assert data.grid == [list(r) for r in rows]


def test_prose_between_separators_not_tableized():
    # 3 full-width horizontal separators with ordinary sentences between
    # them: long cells fail the entry-length gate -> no table
    runs = writer.paragraph_runs(
        [
            "This is an ordinary full sentence of running prose text.",
            "Another long line of body text that is clearly a paragraph.",
            "Third wordy sentence keeps the share of short cells low.",
            "And a fourth one so the band has enough cells to qualify.",
        ],
        x=80,
        top_y=690,
    )
    ops = " ".join([_rule(72, 540, 700), _rule(72, 540, 660), _rule(72, 540, 620)])
    (page,) = minipdf.parse_pdf(writer.write_pdf_with_graphics([(runs, ops)]))
    assert tables.detect_tables(page.cells, page.rulings) == []


def test_single_column_band_not_tableized():
    # short entries but no whitespace gutter -> not a table
    runs = [(80, 690 - 18 * i, 9.0, f"item{i}") for i in range(4)]
    ops = " ".join([_rule(72, 300, 700), _rule(72, 300, 676), _rule(72, 300, 612)])
    (page,) = minipdf.parse_pdf(writer.write_pdf_with_graphics([(runs, ops)]))
    assert tables.detect_tables(page.cells, page.rulings) == []


def test_two_tables_on_one_page():
    t2_y = 540.0
    runs = writer.table_cell_runs(72.0, 700.0, COLS, ROWS, TEXTS)
    texts2 = [["a", "b"], ["c", "d"]]
    runs += writer.table_cell_runs(
        300.0, t2_y, [80.0, 80.0], [20.0, 20.0], texts2
    )
    ops = (
        writer.table_ops(72.0, 700.0, COLS, ROWS)
        + " "
        + writer.table_ops(300.0, t2_y, [80.0, 80.0], [20.0, 20.0])
    )
    (page,) = minipdf.parse_pdf(writer.write_pdf_with_graphics([(runs, ops)]))
    regions = tables.detect_tables(page.cells, page.rulings)
    assert len(regions) == 2
    assert regions[0].data.grid == TEXTS  # sorted by top coordinate
    assert regions[1].data.grid == texts2


def test_table_only_page_does_not_fall_back():
    """A page whose ENTIRE text is consumed by a detected ruled table is
    real content: the extractor must keep the structured parse (table
    struct intact, fallback=False), not retry with the naive scan."""
    doc, fallback = extract_pdf(_ruled_pdf())
    assert fallback is False
    from doc_parser_spark.core import model

    tbl = [
        n for n, _ in doc.iterate_items(layers=(model.BODY,))
        if n.label == model.TABLE and n.table is not None
    ]
    assert tbl and tbl[0].table.cells  # the recovered table survived
    md = export_markdown(doc)
    assert "bolt" in md and "price" in md


def test_unruled_whitespace_table():
    # pass C: NO painted geometry at all — a 6x3 grid recovered purely
    # from the shared whitespace gutters (the TableFormer-covered
    # majority case, VERDICT r3 #2)
    rows = [
        ("name", "qty", "price"),
        ("bolt", "12", "0.40"),
        ("nut", "7", "0.15"),
        ("washer", "30", "0.05"),
        ("screw", "22", "0.30"),
        ("anchor", "4", "1.10"),
    ]
    runs = []
    for r, row in enumerate(rows):
        for c, txt in enumerate(row):
            runs.append((80 + c * 110, 690 - 18 * r, 9.0, txt))
    (page,) = minipdf.parse_pdf(writer.write_pdf_with_graphics([(runs, "")]))
    assert page.rulings == []
    regions = tables.detect_tables(page.cells, page.rulings)
    assert len(regions) == 1
    data = regions[0].data
    assert (data.num_rows, data.num_cols) == (6, 3)
    assert data.grid == [list(r) for r in rows]


def test_unruled_prose_columns_not_tableized():
    # a two-column PROSE layout shares one big gutter but its lines are
    # sentences — the entry-length gate must refuse to tableize it
    left = [
        "This left column is plain running body text over here.",
        "Second wordy line of the left hand prose column block.",
        "Third left line keeps the short cell share well low.",
        "Fourth left line of ordinary paragraph content too.",
        "Fifth left line so the candidate band is tall enough.",
    ]
    right = [
        "And this right column is also ordinary prose text.",
        "More sentence material in the right column lines.",
        "Right column line three with plenty of words in.",
        "Right column line four also reads as a sentence.",
        "Right column line five concludes the paragraph.",
    ]
    runs = []
    for i, (a, b) in enumerate(zip(left, right)):
        runs.append((72, 690 - 14 * i, 9.0, a))
        runs.append((330, 690 - 14 * i, 9.0, b))
    (page,) = minipdf.parse_pdf(writer.write_pdf_with_graphics([(runs, "")]))
    assert tables.detect_tables(page.cells, page.rulings) == []


def test_unruled_short_band_not_tableized():
    # 4 aligned rows only — below the 5-row evidence bar pass C demands
    # (a ruled 4-row table still comes in through pass A/B)
    rows = [("a", "1"), ("b", "2"), ("c", "3"), ("d", "4")]
    runs = []
    for r, row in enumerate(rows):
        for c, txt in enumerate(row):
            runs.append((80 + c * 120, 690 - 18 * r, 9.0, txt))
    (page,) = minipdf.parse_pdf(writer.write_pdf_with_graphics([(runs, "")]))
    assert tables.detect_tables(page.cells, page.rulings) == []


def test_table_inside_picture_cluster_suppressed():
    # a ruled grid painted INSIDE a raster figure (axis labels, part
    # callouts) is figure content: the extractor drops table regions
    # mostly covered by a bitmap-picture cluster, like the reference's
    # layout NN which labels such regions PICTURE (amt_handbook fixture)
    runs = writer.table_cell_runs(72.0, 700.0, COLS, ROWS, TEXTS)
    ops = writer.table_ops(72.0, 700.0, COLS, ROWS)
    pdf = writer.write_pdf_with_graphics([(runs, ops)])
    (page,) = minipdf.parse_pdf(pdf)
    assert tables.detect_tables(page.cells, page.rulings)  # sanity
    # blanket the grid with a bitmap placement and run the extractor path
    page.bitmap_rects = [(60.0, 80.0, 420.0, 780.0)]
    import doc_parser_spark.pdf.minipdf as mp

    orig = mp.parse_pdf
    mp.parse_pdf = lambda data: [page]
    try:
        doc, _ = extract_pdf(pdf)
    finally:
        mp.parse_pdf = orig
    assert doc.tables() == []


def test_toc_dot_leader_table():
    # pass D: a Contents page — lines ending in dot leaders + folio
    # refs — becomes one 2-col table (entry+leader, page-ref), the
    # TableFormer treatment of redp5110's golden
    leader = ". " * 8
    entries = [
        ("Notices " + leader, "vii"),
        ("Preface " + leader, "xi"),
        ("Chapter 1. Security " + leader, "1"),
        ("1.1 Fundamentals " + leader, "2"),
        ("1.2 Current state " + leader, "2"),
        ("Chapter 2. Roles " + leader, "7"),
        ("2.1 Roles " + leader, "8"),
        ("2.2 Separation of duties " + leader, "10"),
        ("Chapter 3. RCAC " + leader, "13"),
    ]
    runs = []
    for i, (txt, page) in enumerate(entries):
        runs.append((72, 690 - 16 * i, 9.0, txt + page))
    (page_obj,) = minipdf.parse_pdf(
        writer.write_pdf_with_graphics([(runs, "")])
    )
    regions = tables.detect_tables(page_obj.cells, page_obj.rulings)
    assert len(regions) == 1
    data = regions[0].data
    assert (data.num_rows, data.num_cols) == (9, 2)
    assert data.grid[0][1] == "vii" and data.grid[-1][1] == "13"
    assert data.grid[3][0].startswith("1.1 Fundamentals")


def test_prose_page_is_not_a_toc():
    # ordinary sentences with an occasional ellipsis never reach the
    # >=8-row, >=60%-of-lines dot-leader bar
    runs = writer.paragraph_runs(
        ["A sentence without leaders.", "Another plain line here.",
         "Wait... this has an ellipsis 3", "More body text follows.",
         "Fifth line of prose.", "Sixth line of prose.",
         "Seventh line of prose.", "Eighth line of prose."],
        x=80, top_y=690,
    )
    (page_obj,) = minipdf.parse_pdf(
        writer.write_pdf_with_graphics([(runs, "")])
    )
    assert tables.detect_tables(page_obj.cells, page_obj.rulings) == []
