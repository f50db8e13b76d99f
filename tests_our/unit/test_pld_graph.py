"""pld_graph: PSL rollup of host edges to the pay-level-domain graph."""

import pytest

from doc_parser_spark.operators import web


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


@pytest.mark.unit
def test_rollup_and_intra_domain_drop(spark):
    rows = [
        # three hosts of a.com all link to b.com -> one PLD edge, w=3
        ("www.a.com", "b.com"),
        ("blog.a.com", "b.com"),
        ("a.com", "cdn.b.com"),
        # intra-domain navigation drops
        ("www.a.com", "shop.a.com"),
        # duplicate host pair counts once (distinct-first)
        ("www.a.com", "b.com"),
    ]
    out = {
        (r["src"], r["dst"]): r["n_host_pairs"]
        for r in web.pld_graph(_edges(spark, rows)).collect()
    }
    assert out == {("a.com", "b.com"): 3}


@pytest.mark.unit
def test_multi_suffix_and_ip_literals(spark):
    rows = [
        ("news.bbc.co.uk", "media.bbc.co.uk"),   # same PLD bbc.co.uk -> drop
        ("news.bbc.co.uk", "x.guardian.co.uk"),
        ("10.0.0.7", "a.com"),                    # IPv4 stays whole
    ]
    out = {
        (r["src"], r["dst"]): r["n_host_pairs"]
        for r in web.pld_graph(_edges(spark, rows)).collect()
    }
    assert out == {
        ("bbc.co.uk", "guardian.co.uk"): 1,
        ("10.0.0.7", "a.com"): 1,
    }


@pytest.mark.unit
def test_case_folding(spark):
    out = web.pld_graph(
        _edges(spark, [("WWW.A.com", "B.COM"), ("www.a.com", "b.com")])
    ).collect()
    assert len(out) == 1 and out[0]["n_host_pairs"] == 1
