"""doc_readability: Flesch–Kincaid integer fixed-point, hand-pinned."""

import pytest

from doc_parser_spark.operators import text_analysis as ta


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in ta.readability(df).collect()}


@pytest.mark.unit
def test_hand_computed(spark):
    out = _run(
        spark,
        [
            # "the cat sat." -> 3 words, 1 sentence, 3 syllables
            (1, "the cat sat."),
            # runs collapse: "Hi!! Ok? Sure..." -> 3 sentences, 3 words,
            # syllables: hi=1, ok=1, sure=2 (u, e) -> 4
            (2, "Hi!! Ok? Sure..."),
            # no punctuation -> 0 sentence runs, s_eff floors to 1
            (3, "one two three"),
            (4, ""),
            (5, None),
        ],
    )
    r1 = out[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (3, 1, 3)
    # fk = 39*3//1 + 1180*3//3 - 1559 = 117 + 1180 - 1559 = -262
    assert r1["fk_x100"] == -262
    # fre = 20684 - 203*3//2 - 8460*3//3 = 20684 - 304 - 8460 = 11920
    assert r1["fre_x100"] == 11920
    assert r1["band"] == "basic"

    r2 = out[2]
    assert (r2["n_words"], r2["n_sentences"], r2["n_syllables"]) == (3, 3, 4)

    r3 = out[3]
    # "three" vowel groups: 'ee' -> 1; one=2 (o,e), two=1 -> 4 syllables
    assert (r3["n_words"], r3["n_sentences"], r3["n_syllables"]) == (3, 0, 4)
    assert r3["wps_x100"] == 300  # s_eff = 1

    for d in (4, 5):
        assert out[d]["band"] == "empty"
        assert out[d]["fk_x100"] == 0 and out[d]["fre_x100"] == 0


@pytest.mark.unit
def test_polysyllables_raise_grade(spark):
    out = _run(
        spark,
        [
            (1, "See the dog run. It is fun."),
            (2, "Extraordinary circumlocution demonstrates polysyllabic "
                "erudition. Quantitative organizational heterogeneity "
                "alleviates informational asymmetry."),
        ],
    )
    assert out[2]["fk_x100"] > out[1]["fk_x100"]
    assert out[2]["fre_x100"] < out[1]["fre_x100"]
    assert out[1]["band"] == "basic"
    assert out[2]["band"] == "advanced"


@pytest.mark.unit
def test_numeric_tokens_floor_one_syllable(spark):
    out = _run(spark, [(1, "42 99 --- xyz.")])
    # every vowel-free token floors to 1 syllable
    assert out[1]["n_syllables"] == 4


@pytest.mark.unit
def test_preexisting_u0001_is_not_a_sentence_boundary(spark):
    # adversarial input carrying the sentinel byte: U+0001 must not be
    # counted as a sentence boundary or a vowel group (stripped before
    # the sentinel substitution in both engines)
    out = _run(spark, [(1, "a\x01b cat sat."), (2, "\x01\x01\x01")])
    r1 = out[1]
    assert r1["n_sentences"] == 1
    # tokens: 'a\x01b' (a -> 1 vowel group), 'cat', 'sat' -> 3 syllables
    assert (r1["n_words"], r1["n_syllables"]) == (3, 3)
    r2 = out[2]
    # only-sentinel text strips to empty
    assert r2["band"] == "empty" and r2["n_sentences"] == 0
