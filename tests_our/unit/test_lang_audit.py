"""lang_audit: declared-vs-predicted language verdict ladder."""

import pytest

from doc_parser_spark.operators import text_analysis as ta


@pytest.mark.unit
def test_verdict_ladder(spark):
    rows = [
        (1, "the of and to in is it that was for with as", "en"),   # match
        (2, "the of and to in is it that was for with as", "fr"),   # mismatch
        (3, "zzz qqq xxx", "en"),                                   # undetermined
        (4, "the of and to in is", None),                           # unlabeled
        (5, None, "de"),                                            # empty text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r.asDict() for r in ta.lang_audit(df).collect()}
    assert out[1]["verdict"] == "match" and out[1]["pred_lang"] == "en"
    assert out[2]["verdict"] == "mismatch"
    assert out[3]["verdict"] == "undetermined"
    assert out[4]["verdict"] == "unlabeled"
    assert out[5]["verdict"] == "undetermined"  # no stopword evidence
    assert out[4]["declared_lang"] == ""


@pytest.mark.unit
def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame(
        [(1, "a", "en")], "doc_id long, text string, lang string"
    )
    plan = ta.lang_audit(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
