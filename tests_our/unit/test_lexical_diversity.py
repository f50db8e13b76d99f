"""lexical_diversity (doc_ttr): windowed type-token ratio."""

import pytest

from doc_parser_spark.operators import text_analysis as ta


def _run(spark, rows, window=100):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in ta.lexical_diversity(df, window=window).collect()
    }


@pytest.mark.unit
def test_hand_computed(spark):
    out = _run(
        spark,
        [
            (1, "a b a c b a"),          # 6 tokens, 3 types
            (2, "The the THE"),          # case-folded: 1 type
            (3, "dog dog. dog"),         # punctuation variant = own type
            (4, ""),
            (5, None),
        ],
    )
    assert (out[1]["n_words"], out[1]["n_types"]) == (6, 3)
    assert out[1]["ttr_x1000"] == 500
    assert out[2]["n_types"] == 1 and out[2]["ttr_x1000"] == 333
    assert out[3]["n_types"] == 2
    for d in (4, 5):
        assert out[d]["n_words"] == 0 and out[d]["ttr_x1000"] == 0


@pytest.mark.unit
def test_window_corrects_length_bias(spark):
    # long repetitive doc: full-doc TTR tiny, window TTR sees the same
    # 5-type cycle; diverse doc keeps both high
    rep = " ".join(["a b c d e"] * 200)        # 1000 tokens, 5 types
    div = " ".join(f"w{i}" for i in range(1000))
    out = _run(spark, [(1, rep), (2, div)], window=50)
    assert out[1]["ttr_x1000"] == 5
    assert out[1]["ttr_w_x1000"] == 100  # 5 types / 50-token window
    assert out[2]["ttr_x1000"] == 1000
    assert out[2]["ttr_w_x1000"] == 1000


@pytest.mark.unit
def test_short_doc_window_uses_actual_length(spark):
    out = _run(spark, [(1, "x y x")], window=100)
    # window denominator = min(n_words, window) = 3
    assert out[1]["ttr_w_x1000"] == 1000 * 2 // 3


@pytest.mark.unit
def test_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        ta.lexical_diversity(df, window=0)
