"""Property tests: the iterative relational operators vs independent
pure-Python references on seeded-random graphs — cycles, chains,
multi-seed trust, dangling mass. One Spark job per case batch (the
hypothesis-per-example style would pay JVM latency 100×)."""

from __future__ import annotations

import random

import pytest

from doc_parser_spark.operators import web

pytestmark = pytest.mark.unit


def _ref_pagerank(edges, iterations):
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({n for p in e for n in p})
    out = {}
    for s, _ in e:
        out[s] = out.get(s, 0) + 1
    r = {n: 1_000_000 for n in nodes}
    for _ in range(iterations):
        contrib = {n: 0 for n in nodes}
        for s, d in e:
            contrib[d] += r[s] // out[s]
        r = {n: 150_000 + (85 * contrib[n]) // 100 for n in nodes}
    return r


def _ref_trustrank(edges, seeds, iterations):
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({n for p in e for n in p})
    sd = [n for n in nodes if n in seeds]
    base = 1_000_000 // len(sd)
    out = {}
    for s, _ in e:
        out[s] = out.get(s, 0) + 1
    t = {n: (base if n in sd else 0) for n in nodes}
    for _ in range(iterations):
        contrib = {n: 0 for n in nodes}
        for s, d in e:
            contrib[d] += t[s] // out[s]
        t = {
            n: (15 * (base if n in sd else 0) + 85 * contrib[n]) // 100
            for n in nodes
        }
    return t


def _random_graph(rng, n_nodes, n_edges):
    return [
        (f"h{rng.randint(0, n_nodes - 1)}", f"h{rng.randint(0, n_nodes - 1)}")
        for _ in range(n_edges)
    ]


def test_rank_ops_match_python_reference_on_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(4):
        edges = _random_graph(rng, 12, 30)
        if not any(s != d for s, d in edges):
            continue
        e_df = spark.createDataFrame(edges, "src string, dst string")
        pr_ref = _ref_pagerank(edges, 3)
        pr = {r.host: r.rank_scaled
              for r in web.host_pagerank(e_df, iterations=3).collect()}
        assert pr == pr_ref, f"pagerank trial {trial}"
        seeds = sorted(pr_ref)[: max(1, len(pr_ref) // 3)]
        tr_ref = _ref_trustrank(edges, set(seeds), 3)
        s_df = spark.createDataFrame([(s,) for s in seeds], "host string")
        tr = {r.host: r.trust_scaled
              for r in web.host_trustrank(e_df, s_df, iterations=3).collect()}
        assert tr == tr_ref, f"trustrank trial {trial}"
        # fused spam-mass carries BOTH vectors bit-exactly
        sm = {r.host: r for r in
              web.host_spam_mass(e_df, s_df, iterations=3).collect()}
        for h, row in sm.items():
            assert row.rank_scaled == pr_ref[h]
            assert row.trust_scaled == tr_ref[h]


def _ref_chains(rows, max_hops):
    # min-struct collapse
    best = {}
    for url, st, loc in rows:
        key = (st, loc if loc is not None else "")
        cur = best.get(url)
        # Spark min(struct(status, location)): NULL location sorts FIRST
        sk = (st, loc is not None, loc or "")
        if cur is None or sk < cur[0]:
            best[url] = (sk, st, loc)
    nxt = {}
    for url, (_, st, loc) in best.items():
        if 300 <= st < 400 and loc:
            nxt[url] = loc
    known = set(best)
    out = {}
    for url in best:
        cur, path, hops = url, [url], 0
        verdict = None
        while hops < max_hops:
            dst = nxt.get(cur)
            if dst is None:
                verdict = "resolved" if cur in known else "dangling"
                break
            if dst in path:
                cur, hops, verdict = dst, hops + 1, "loop"
                break
            path.append(dst)
            cur, hops = dst, hops + 1
        if verdict is None:
            if nxt.get(cur) is not None:
                verdict = "truncated"
            else:
                verdict = "resolved" if cur in known else "dangling"
        out[url] = (cur, hops, verdict)
    return out


def test_redirect_chains_match_python_reference(spark):
    rng = random.Random(7)
    for trial in range(3):
        urls = [f"u{i}" for i in range(10)]
        rows = []
        for u in urls:
            kind = rng.random()
            if kind < 0.5:
                rows.append((u, 301, rng.choice(urls + ["ghost1", "ghost2"])))
            elif kind < 0.6:  # duplicate capture
                rows.append((u, 302, rng.choice(urls)))
                rows.append((u, 301, rng.choice(urls)))
            else:
                rows.append((u, 200, ""))
        df = spark.createDataFrame(
            rows, "url string, status int, location string"
        )
        got = {r.url: (r.final_url, r.n_hops, r.verdict)
               for r in web.redirect_chains(df, max_hops=4).collect()}
        assert got == _ref_chains(rows, 4), f"trial {trial}: {rows}"


def _ref_lpa(edges, iterations):
    fwd = {(s, d) for s, d in edges if s != d}
    sym = sorted(fwd | {(d, s) for s, d in fwd})
    nodes = sorted({n for p in sym for n in p})
    nbrs = {}
    for s, d in sym:
        nbrs.setdefault(s, []).append(d)
    lbl = {n: n for n in nodes}
    for _ in range(iterations):
        new = {}
        for n in nodes:
            cnt = {lbl[n]: 1}  # inclusion variant: one self-vote
            for d in nbrs[n]:
                cnt[lbl[d]] = cnt.get(lbl[d], 0) + 1
            # majority, min-label tie-break
            new[n] = min(cnt, key=lambda c: (-cnt[c], c))
        lbl = new
    return lbl


def test_lpa_matches_python_reference_on_random_graphs(spark):
    rng = random.Random(1234)
    for trial in range(4):
        edges = _random_graph(rng, 14, 28)
        if not any(s != d for s, d in edges):
            continue
        e_df = spark.createDataFrame(edges, "src string, dst string")
        ref = _ref_lpa(edges, 3)
        got = {r.host: r.community_id
               for r in web.host_communities(e_df, iterations=3).collect()}
        assert got == ref, f"lpa trial {trial}: {edges}"
