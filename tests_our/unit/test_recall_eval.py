"""recall_eval: ANN recall@k against the exact baseline."""

import random

import pytest

from doc_parser_spark.operators import similarity as sim


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )


@pytest.mark.unit
def test_grid_is_dense_and_bounded(spark):
    rng = random.Random(3)
    vecs = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(40)]
    out = [r.asDict() for r in sim.recall_eval(_emb(spark, vecs),
                                               n_queries=3, k=4).collect()]
    # 3 methods × 3 queries, every row bounded and denominated
    assert len(out) == 9
    assert {r["method"] for r in out} == {"lsh", "sq8", "matryoshka"}
    for r in out:
        assert 0 <= r["n_hits"] <= r["k_exact"] <= 4
        assert r["recall_x1000"] == 1000 * r["n_hits"] // r["k_exact"]


@pytest.mark.unit
def test_all_positive_corpus_gives_perfect_lsh(spark):
    """All-positive vectors share one sign bucket, so LSH candidates =
    whole corpus and its recall must be 1000."""
    rng = random.Random(9)
    vecs = [[rng.uniform(0.1, 1) for _ in range(16)] for _ in range(25)]
    out = {
        (r["method"], r["query_id"]): r["recall_x1000"]
        for r in sim.recall_eval(_emb(spark, vecs), n_queries=2, k=3).collect()
    }
    assert out[("lsh", 0)] == 1000 and out[("lsh", 1)] == 1000
