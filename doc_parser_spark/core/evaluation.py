"""Layout-evaluation harness: IoU-greedy bbox matching + P/R/F1.

From-scratch reimplementation of the fork's evaluation layer
(``doc_preprocessors/evaluation/evaluation.py:11-138``): IoU between
``{l,t,r,b}`` boxes, greedy highest-IoU-first one-to-one matching of
groundtruth vs predicted boxes per page (threshold 0.2), class accuracy
over the matches, and TP/FP/FN precision/recall/F1.

Works both as a pure function (unit tests, single documents) and as a
Spark aggregation: :func:`evaluate_spans_df` joins a groundtruth DataFrame
against extracted ``spans`` and computes corpus-level scores without
collecting boxes to the driver.
"""

from __future__ import annotations


def intersection_over_union(bbox1: dict, bbox2: dict, eps: float = 1e-6) -> float:
    """IoU of two {l,t,r,b} boxes (reference :11-37; the reference computes
    areas as (r-l)*(t-b) with bottom-left-origin boxes — equivalent here
    with |Δ| since our boxes are top-left-origin)."""
    l1, t1, r1, b1 = bbox1["l"], bbox1["t"], bbox1["r"], bbox1["b"]
    l2, t2, r2, b2 = bbox2["l"], bbox2["t"], bbox2["r"], bbox2["b"]

    left = max(l1, l2)
    right = min(r1, r2)
    top = max(min(t1, b1), min(t2, b2))
    bottom = min(max(t1, b1), max(t2, b2))
    if right <= left or bottom <= top:
        return 0.0

    intersection = (right - left) * (bottom - top)
    area1 = abs(r1 - l1) * abs(b1 - t1)
    area2 = abs(r2 - l2) * abs(b2 - t2)
    union = area1 + area2 - intersection
    return intersection / (union + eps)


def match_bboxes(
    groundtruth: list[dict], predicted: list[dict], iou_threshold: float = 0.2
) -> tuple[list[dict], float]:
    """Greedy one-to-one matching, highest IoU first (reference :40-113).

    groundtruth rows: {id, page, bbox, category_name}
    predicted rows:   {page, bbox, type}
    Returns (matches, class_accuracy)."""
    all_matches = []
    for gt_idx, gt in enumerate(groundtruth):
        for pred_idx, pred in enumerate(predicted):
            if pred.get("bbox") is None or gt["page"] != pred.get("page"):
                continue
            iou = intersection_over_union(gt["bbox"], pred["bbox"])
            if iou >= iou_threshold:
                all_matches.append(
                    {
                        "gt_idx": gt_idx,
                        "pred_idx": pred_idx,
                        "gt_id": gt.get("id"),
                        "gt_class": gt.get("category_name"),
                        "pred_class": pred.get("type"),
                        "iou": iou,
                    }
                )

    all_matches.sort(key=lambda m: m["iou"], reverse=True)
    matched_gt: set[int] = set()
    matched_pred: set[int] = set()
    final = []
    for m in all_matches:
        if m["gt_idx"] not in matched_gt and m["pred_idx"] not in matched_pred:
            matched_gt.add(m["gt_idx"])
            matched_pred.add(m["pred_idx"])
            final.append(m)

    correct = sum(1 for m in final if m["gt_class"] == m["pred_class"])
    class_accuracy = correct / len(final) if final else 0.0
    return final, class_accuracy


def calculate_f1(
    matches: list[dict], n_groundtruth: int, n_predictions: int
) -> dict:
    """TP/FP/FN → precision/recall/F1 (reference :116-138)."""
    tp = len(matches)
    fp = n_predictions - tp
    fn = n_groundtruth - tp
    precision = tp / (tp + fp) if (tp + fp) > 0 else 0.0
    recall = tp / (tp + fn) if (tp + fn) > 0 else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return {
        "precision": precision,
        "recall": recall,
        "f1_score": f1,
        "TP": tp,
        "FP": fp,
        "FN": fn,
    }


def evaluate_document(
    groundtruth: list[dict], predicted: list[dict], iou_threshold: float = 0.2
) -> dict:
    """One-document evaluation: matches + class accuracy + P/R/F1."""
    matches, class_acc = match_bboxes(groundtruth, predicted, iou_threshold)
    scores = calculate_f1(
        matches,
        n_groundtruth=len(groundtruth),
        n_predictions=sum(1 for p in predicted if p.get("bbox") is not None),
    )
    scores["class_accuracy"] = class_acc
    scores["n_matches"] = len(matches)
    return scores


def evaluate_spans_df(spark, groundtruth_df, documents_out):
    """Corpus-level evaluation over Spark DataFrames.

    ``groundtruth_df``: (url, page int, l, t, r, b, category_name).
    ``documents_out``: the extraction output (nested spans with bboxes).
    Per-document greedy matching runs inside an Arrow batch via
    applyInPandas (state per url); corpus scores aggregate natively."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    preds = (
        documents_out.select("url", F.explode("spans").alias("s"))
        .where(F.col("s.bbox").isNotNull())
        .select(
            "url",
            F.col("s.page_no").alias("page"),
            F.col("s.bbox.l").alias("l"),
            F.col("s.bbox.t").alias("t"),
            F.col("s.bbox.r").alias("r"),
            F.col("s.bbox.b").alias("b"),
            F.col("s.label").alias("type"),
        )
        .withColumn("side", F.lit("pred"))
    )
    gts = groundtruth_df.select(
        "url", "page", "l", "t", "r", "b",
        F.col("category_name").alias("type"),
    ).withColumn("side", F.lit("gt"))

    both = gts.unionByName(preds)

    out_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("tp", T.LongType()),
            T.StructField("n_gt", T.LongType()),
            T.StructField("n_pred", T.LongType()),
            T.StructField("n_class_correct", T.LongType()),
        ]
    )

    def per_url(pdf: pd.DataFrame) -> pd.DataFrame:
        url = pdf["url"].iloc[0]
        gt_rows = [
            {"id": i, "page": int(r.page),
             "bbox": {"l": r.l, "t": r.t, "r": r.r, "b": r.b},
             "category_name": r.type}
            for i, r in enumerate(pdf[pdf["side"] == "gt"].itertuples())
        ]
        pred_rows = [
            {"page": int(r.page),
             "bbox": {"l": r.l, "t": r.t, "r": r.r, "b": r.b},
             "type": r.type}
            for r in pdf[pdf["side"] == "pred"].itertuples()
        ]
        matches, _ = match_bboxes(gt_rows, pred_rows)
        correct = sum(1 for m in matches if m["gt_class"] == m["pred_class"])
        return pd.DataFrame(
            [{
                "url": url, "tp": len(matches), "n_gt": len(gt_rows),
                "n_pred": len(pred_rows), "n_class_correct": correct,
            }]
        )

    per_doc = both.groupBy("url").applyInPandas(per_url, schema=out_schema)
    return per_doc.agg(
        F.sum("tp").alias("TP"),
        (F.sum("n_pred") - F.sum("tp")).alias("FP"),
        (F.sum("n_gt") - F.sum("tp")).alias("FN"),
        F.sum("n_class_correct").alias("class_correct"),
    )
