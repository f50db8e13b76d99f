"""Composed curation funnel: flags, keep verdict, one-pass funnel report."""

from pyspark.sql import Row

from doc_parser_spark.operators.curate import curate_flags, curation_funnel


def _text(i: int) -> str:
    # ≥50 words, ≥2 stopwords, mean word len in [3,10], no repeated n-grams
    return " ".join(["the", "and", "is"] + [f"alpha{i}w{j}" for j in range(57)])


def _corpus(spark):
    bench_text = _text(99)
    rows = [
        Row(doc_id=0, text=bench_text, source="src0", url="http://bench.org/0"),
        Row(doc_id=1, text=_text(1), source="srcA", url="http://a.com/1"),
        Row(doc_id=2, text=_text(1), source="srcA", url="http://a.com/2"),  # exact dup of 1
        Row(doc_id=3, text=_text(3), source="srcB", url="http://b.com/3"),
        # contaminated: ~2/3 of its 3-grams are verbatim benchmark text
        Row(
            doc_id=4,
            text=bench_text + " " + " ".join(f"own4w{j}" for j in range(30)),
            source="srcB",
            url="http://b.com/4",
        ),
        # fails quality (no stopwords) and repetition (one dup 5-gram)
        Row(doc_id=5, text="spam " * 200, source="srcB", url="http://b.com/5"),
    ]
    return spark.createDataFrame(rows)


def test_curate_flags_and_keep(spark):
    docs = _corpus(spark)
    flags = {r.doc_id: r for r in curate_flags(docs, bench_source="src0").collect()}
    assert set(flags) == {0, 1, 2, 3, 4, 5}
    # benchmark doc is excluded via pass_decontamination=False
    assert not flags[0].pass_decontamination and not flags[0].keep
    # doc 1 survives everything
    assert flags[1].keep
    # doc 2 is the exact dup — loses canonicality, everything else passes
    assert not flags[2].is_exact_canonical and not flags[2].keep
    assert flags[2].pass_quality
    # doc 4 contaminated
    assert not flags[4].pass_decontamination and not flags[4].keep
    # doc 5 trips the repetition gate
    assert not flags[5].pass_repetition and not flags[5].keep
    assert flags[3].keep


def test_curation_funnel_single_pass(spark):
    docs = _corpus(spark)
    flags = curate_flags(docs, bench_source="src0")
    funnel = {r.stage: (r.n_in, r.n_out) for r in curation_funnel(flags).collect()}
    assert funnel["pass_quality"][0] == 6
    # monotone non-increasing, chained n_in == previous n_out
    order = [
        "pass_quality", "pass_repetition", "is_exact_canonical",
        "is_neardup_canonical", "pass_decontamination", "pass_host_cap",
    ]
    for a, b in zip(order, order[1:]):
        assert funnel[b][0] == funnel[a][1]
        assert funnel[b][1] <= funnel[b][0]
    # final survivors equal the keep count
    n_keep = flags.where("keep").count()
    assert funnel["pass_host_cap"][1] == n_keep


def test_host_cap_stage(spark):
    docs = _corpus(spark).where("doc_id > 0")  # all have url
    flags = {
        r.doc_id: r
        for r in curate_flags(
            docs, bench_source="src0", url_col="url", max_per_host=1
        ).collect()
    }
    a_caps = [flags[i].pass_host_cap for i in (1, 2)]
    assert sorted(a_caps) == [False, True]  # a.com capped to 1
