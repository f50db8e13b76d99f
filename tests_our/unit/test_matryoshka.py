"""matryoshka_topk: two-stage truncated-prefix retrieval."""

import math
import random

import pytest

from doc_parser_spark.operators import similarity as sim


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )


def _cos(a, b, d=None):
    a, b = a[:d], b[:d]
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


@pytest.mark.unit
def test_full_prefix_equals_exact_topk(spark):
    """With dims_trunc = full dimension and an expand window covering the
    corpus, the two-stage result must equal brute-force cosine_topk."""
    rng = random.Random(7)
    vecs = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(30)]
    df = _emb(spark, vecs)
    exact = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in sim.cosine_topk(df, n_queries=3, k=4).collect()
    }
    two = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in sim.matryoshka_topk(
            df, n_queries=3, k=4, dims_trunc=8, expand=30
        ).collect()
    }
    assert two == exact


@pytest.mark.unit
def test_rerank_uses_full_cosine(spark):
    """A vector that looks close in the prefix but diverges in the tail
    must be demoted by stage 2 (the whole point of re-ranking)."""
    q = [1.0, 0.0, 0.0, 0.0]
    decoy = [1.0, 0.0, -0.9, -0.9]  # perfect prefix-2 match, bad tail
    good = [0.9, 0.1, 0.05, 0.0]
    df = _emb(spark, [q, decoy, good])
    out = sim.matryoshka_topk(
        df, n_queries=1, k=2, dims_trunc=2, expand=2
    ).collect()
    by_rank = {r["rank"]: r for r in out}
    assert by_rank[1]["neighbor_id"] == 2  # good wins on full cosine
    assert by_rank[2]["neighbor_id"] == 1
    # stage-1 score really is the prefix cosine
    assert by_rank[2]["cosine_trunc"] == pytest.approx(1.0, abs=1e-5)
    assert by_rank[2]["cosine"] < by_rank[1]["cosine"]


@pytest.mark.unit
def test_recall_against_exact(spark):
    """On random unit-ish vectors, prefix shortlisting with expand=4
    recovers most of the exact top-k (sanity on the MRL premise)."""
    rng = random.Random(11)
    vecs = []
    for _ in range(80):
        base = [rng.gauss(0, 1.0 / (1 + 0.2 * d)) for d in range(16)]
        vecs.append(base)
    df = _emb(spark, vecs)
    exact = sim.cosine_topk(df, n_queries=4, k=5).collect()
    two = sim.matryoshka_topk(
        df, n_queries=4, k=5, dims_trunc=8, expand=4
    ).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    got = {(r["query_id"], r["neighbor_id"]) for r in two}
    recall = len(exact_set & got) / len(exact_set)
    assert recall >= 0.6, recall


@pytest.mark.unit
def test_validation(spark):
    df = _emb(spark, [[1.0, 0.0]])
    with pytest.raises(ValueError):
        sim.matryoshka_topk(df, dims_trunc=0)
