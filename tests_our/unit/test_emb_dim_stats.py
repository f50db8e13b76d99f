"""embedding_dim_stats: integer-exact per-dimension health panel."""

import math

import pytest

from doc_parser_spark.operators import similarity as sim


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )


@pytest.mark.unit
def test_hand_computed(spark):
    df = _emb(spark, [[0.5, -0.25], [1.5, 0.0], [-0.5, 0.75]])
    out = {r["dim"]: r.asDict() for r in sim.embedding_dim_stats(df).collect()}
    assert sorted(out) == [1, 2]
    d1 = out[1]
    assert d1["n_values"] == 3 and d1["n_nan"] == 0
    # floor(1e6·v): 500000, 1500000, -500000
    assert d1["sum_x1e6"] == 1500000
    assert d1["min_x1e6"] == -500000 and d1["max_x1e6"] == 1500000
    d2 = out[2]
    assert d2["sum_x1e6"] == -250000 + 0 + 750000
    assert d2["n_zeroish"] == 1  # the exact 0.0


@pytest.mark.unit
def test_nan_counted_out_of_band(spark):
    df = _emb(spark, [[float("nan"), 1.0], [2.0, 1.0]])
    out = {r["dim"]: r.asDict() for r in sim.embedding_dim_stats(df).collect()}
    assert out[1]["n_nan"] == 1 and out[1]["n_values"] == 1
    assert out[1]["sum_x1e6"] == 2000000
    assert out[2]["n_nan"] == 0


@pytest.mark.unit
def test_order_independence(spark):
    """The quantize-then-integer-sum design must make partitioning
    irrelevant (the reason we don't sum floats)."""
    import random

    rng = random.Random(5)
    vecs = [[rng.uniform(-2, 2) for _ in range(6)] for _ in range(50)]
    a = sim.embedding_dim_stats(_emb(spark, vecs).repartition(1)).collect()
    b = sim.embedding_dim_stats(_emb(spark, vecs).repartition(13)).collect()
    key = lambda r: r["dim"]
    assert sorted((r.asDict() for r in a), key=key) == sorted(
        (r.asDict() for r in b), key=key
    )
