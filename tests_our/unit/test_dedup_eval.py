"""dedup_eval: precision/recall of the approximate detectors vs exact
Jaccard ground truth on a crafted near-dup corpus."""

import pytest

from doc_parser_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.unit
def test_metrics_on_crafted_corpus(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away"
    near = base + " tonight"                       # high-Jaccard near-dup
    rows = [(1, base), (2, near)]
    # unrelated filler so buckets aren't degenerate-by-corpus-size
    rows += [
        (10 + i, f"completely different text number {i} with unique "
                 f"words alpha{i} beta{i} gamma{i} delta{i}")
        for i in range(8)
    ]
    out = {
        r["method"]: r.asDict()
        for r in dedup.dedup_eval(_docs(spark, rows)).collect()
    }
    assert sorted(out) == ["minhash_lsh", "simhash"]
    truth = out["minhash_lsh"]["n_truth"]
    assert truth >= 1  # the (1, 2) pair passes exact Jaccard 0.5
    for m, r in out.items():
        assert 0 <= r["n_hits"] <= min(r["n_pred"], r["n_truth"]), m
        assert r["precision_x1000"] == 1000 * r["n_hits"] // max(r["n_pred"], 1)
        assert r["recall_x1000"] == 1000 * r["n_hits"] // max(r["n_truth"], 1)
    # LSH candidates must recover the constructed near-dup pair
    assert out["minhash_lsh"]["recall_x1000"] > 0


@pytest.mark.unit
def test_no_duplicates_gives_dense_zero_rows(spark):
    rows = [
        (i, f"totally unrelated document {i} " + " ".join(
            f"tok{i}_{j}" for j in range(20)))
        for i in range(6)
    ]
    out = {
        r["method"]: r.asDict()
        for r in dedup.dedup_eval(_docs(spark, rows)).collect()
    }
    # both method rows present even with nothing predicted or true
    assert sorted(out) == ["minhash_lsh", "simhash"]
    for r in out.values():
        assert r["n_truth"] == 0 and r["n_hits"] == 0
        assert r["recall_x1000"] == 0
