"""Unit tests for the layout-evaluation harness (SURVEY.md §5)."""

import pytest

from doc_parser_spark.core.evaluation import (
    calculate_f1,
    evaluate_document,
    intersection_over_union,
    match_bboxes,
)

pytestmark = pytest.mark.unit


def bb(l, t, r, b):
    return {"l": l, "t": t, "r": r, "b": b}


def test_iou_basics():
    assert intersection_over_union(bb(0, 0, 10, 10), bb(0, 0, 10, 10)) == pytest.approx(1.0, abs=1e-4)
    assert intersection_over_union(bb(0, 0, 10, 10), bb(20, 20, 30, 30)) == 0.0
    # half overlap: inter 50, union 150
    assert intersection_over_union(bb(0, 0, 10, 10), bb(5, 0, 15, 10)) == pytest.approx(1 / 3, abs=1e-3)


def test_greedy_one_to_one_matching():
    gts = [
        {"id": "a", "page": 1, "bbox": bb(0, 0, 10, 10), "category_name": "text"},
        {"id": "b", "page": 1, "bbox": bb(20, 0, 30, 10), "category_name": "table"},
    ]
    preds = [
        {"page": 1, "bbox": bb(1, 0, 11, 10), "type": "text"},
        {"page": 1, "bbox": bb(21, 0, 31, 10), "type": "text"},  # wrong class
        {"page": 2, "bbox": bb(0, 0, 10, 10), "type": "text"},   # wrong page
    ]
    matches, class_acc = match_bboxes(gts, preds)
    assert len(matches) == 2
    assert class_acc == pytest.approx(0.5)
    # one-to-one: a gt never matches twice
    assert len({m["gt_idx"] for m in matches}) == 2
    assert len({m["pred_idx"] for m in matches}) == 2


def test_f1_computation():
    scores = calculate_f1([{"x": 1}] * 3, n_groundtruth=4, n_predictions=5)
    assert scores["TP"] == 3 and scores["FP"] == 2 and scores["FN"] == 1
    assert scores["precision"] == pytest.approx(0.6)
    assert scores["recall"] == pytest.approx(0.75)
    assert scores["f1_score"] == pytest.approx(2 * 0.6 * 0.75 / 1.35)


def test_evaluate_document_end_to_end_with_pdf_extraction():
    from doc_parser_spark.core.serialize import flatten_spans
    from doc_parser_spark.pdf.extractor import extract_pdf
    from doc_parser_spark.pdf.writer import paragraph_runs, write_pdf

    runs = [(72.0, 720.0, 18.0, "Title Here")]
    runs += paragraph_runs(["body line one.", "body line two."], top_y=680)
    doc, _ = extract_pdf(write_pdf([runs]))
    spans = [s for s in flatten_spans(doc) if s["bbox"] is not None]
    preds = [
        {"page": s["page_no"], "bbox": s["bbox"], "type": s["label"]}
        for s in spans
    ]
    # groundtruth == our own boxes → perfect score
    gts = [
        {"id": i, "page": p["page"], "bbox": p["bbox"], "category_name": p["type"]}
        for i, p in enumerate(preds)
    ]
    scores = evaluate_document(gts, preds)
    assert scores["f1_score"] == pytest.approx(1.0)
    assert scores["class_accuracy"] == pytest.approx(1.0)
    # perturbed groundtruth below the IoU threshold → recall drops
    shifted = [
        {**g, "bbox": {k: v + 500 for k, v in g["bbox"].items()}} for g in gts
    ]
    scores2 = evaluate_document(shifted, preds)
    assert scores2["TP"] == 0 and scores2["f1_score"] == 0.0
