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


@pytest.mark.unit
def test_knn_label_eval_clustered_labels(spark):
    """Two well-separated label clusters: every query's neighbors share
    its label, so accuracy must be perfect; a far-out singleton with a
    unique label must be voted WRONG (its neighbors all carry other
    labels)."""
    rng = random.Random(21)
    vecs, labels = [], []
    for i in range(12):  # label 0 cluster around +e1
        vecs.append([1.0 + rng.uniform(-0.05, 0.05),
                     rng.uniform(-0.05, 0.05), 0.0])
        labels.append(0)
    for i in range(12):  # label 1 cluster around +e2
        vecs.append([rng.uniform(-0.05, 0.05),
                     1.0 + rng.uniform(-0.05, 0.05), 0.0])
        labels.append(1)
    rows = [
        (i, [float(x) for x in v], l)
        for i, (v, l) in enumerate(zip(vecs, labels))
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )
    out = {r["query_id"]: r.asDict()
           for r in sim.knn_label_eval(df, n_queries=6, k=3).collect()}
    assert len(out) == 6
    assert all(r["correct"] for r in out.values())
    assert all(r["n_votes"] == 3 for r in out.values())

    # a vector with a unique label planted inside cluster 0: its
    # neighbors all vote label 0, so the eval must mark it wrong —
    # give it vec_id 5 so it falls inside the query range
    rows[5] = (5, [1.0, 0.0, 0.0], 9)
    df2 = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )
    out2 = {r["query_id"]: r.asDict()
            for r in sim.knn_label_eval(df2, n_queries=6, k=3).collect()}
    assert out2[5]["correct"] is False
    assert out2[5]["pred_label"] == 0
    assert all(out2[i]["correct"] for i in range(5))
