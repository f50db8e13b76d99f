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


@pytest.mark.unit
def test_bpe_fertility_hand_computed(spark):
    # one language where merges help (repeated pairs), one where the
    # words stay fully split — fertility must separate them
    rows = [
        (1, "aaaa aaaa aaaa aaaa aaaa aaaa", "en"),
        (2, "aaaa aaaa aaaa aaaa aaaa aaaa", "en"),
        (3, "xq zj qv xq zj qv", "zz"),
        (4, None, "zz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["lang"]: r.asDict() for r in ta.bpe_fertility(df).collect()}
    assert out["en"]["n_docs"] == 2 and out["zz"]["n_docs"] == 2
    assert out["en"]["total_words"] == 12
    # merges learned on 'aaaa' collapse it below its 4 chars
    assert out["en"]["total_bpe"] < 4 * 12
    assert (
        out["en"]["fertility_x100"]
        == 100 * out["en"]["total_bpe"] // out["en"]["total_words"]
    )
    # the rare 2-char words can never merge below ~their pair count and
    # 'zz' fertility (tokens/word) stays >= 1.0
    assert out["zz"]["fertility_x100"] >= 100
