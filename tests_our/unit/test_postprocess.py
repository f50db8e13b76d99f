"""Overlap-dedup postprocess units (reference math:
docling/utils/layout_postprocessor.py:17-48, 86-106, 405-528)."""

import pytest

from doc_parser_spark.pdf.postprocess import (
    LayoutCluster,
    UnionFind,
    check_overlap,
    remove_overlapping_clusters,
    should_prefer_cluster,
    OVERLAP_PARAMS,
)

pytestmark = pytest.mark.unit


class Cell:
    def __init__(self, index, t, l):
        self.index, self.t, self.l = index, t, l


def C(id, l, t, r, b, label="text", conf=1.0, cells=()):  # noqa: N802
    return LayoutCluster(id=id, label=label, l=l, t=t, r=r, b=b,
                         confidence=conf, cells=list(cells))


def test_union_find_groups():
    uf = UnionFind([1, 2, 3, 4, 5])
    uf.union(1, 2)
    uf.union(2, 3)
    uf.union(4, 5)
    groups = sorted(sorted(g) for g in uf.get_groups().values())
    assert groups == [[1, 2, 3], [4, 5]]


def test_check_overlap_iou_and_containment():
    a = C(1, 0, 0, 10, 10)
    # high IoU
    assert check_overlap(a, C(2, 0, 0, 10, 11))
    # small box fully inside a: containment fires even though IoU is tiny
    assert check_overlap(a, C(3, 4, 4, 5, 5))
    # disjoint
    assert not check_overlap(a, C(4, 20, 20, 30, 30))
    # moderate overlap below both thresholds
    assert not check_overlap(a, C(5, 5, 0, 15, 10))
    # degenerate zero-area never overlaps
    assert not check_overlap(a, C(6, 1, 1, 1, 9))


def test_prefer_rules():
    p = OVERLAP_PARAMS["regular"]
    text = C(1, 0, 0, 10, 10, "text", conf=0.9)
    li = C(2, 0, 0, 10, 10.5, "list_item", conf=0.5)
    # Rule 1: similar-area list_item beats text despite lower confidence
    assert should_prefer_cluster(li, text, p)
    # Rule 2: code absorbs an 80%-contained other
    code = C(3, 0, 0, 20, 20, "code", conf=0.1)
    inner = C(4, 1, 1, 5, 5, "text", conf=0.99)
    assert should_prefer_cluster(code, inner, p)
    # fallback: smaller + significantly less confident loses
    small = C(5, 0, 0, 5, 5, "text", conf=0.5)
    big = C(6, 0, 0, 6, 5, "text", conf=0.9)
    assert not should_prefer_cluster(small, big, p)
    assert should_prefer_cluster(big, small, p)


def test_remove_overlapping_merges_cells_in_order():
    a = C(1, 0, 0, 10, 10, conf=0.9, cells=[Cell(2, 5, 0), Cell(1, 0, 0)])
    dup = C(2, 0, 0, 10, 10.2, conf=0.4, cells=[Cell(1, 0, 0), Cell(3, 8, 0)])
    other = C(3, 50, 50, 60, 60, cells=[Cell(9, 50, 50)])
    out = remove_overlapping_clusters([a, dup, other])
    by_id = {c.id: c for c in out}
    assert set(by_id) == {1, 3}  # winner: higher confidence, similar area
    # loser's cells merged, deduped by index (cell 1 once), sorted by (t,l)
    assert [c.index for c in by_id[1].cells] == [1, 2, 3]
    assert [c.index for c in by_id[3].cells] == [9]


def test_transitive_chain_collapses_to_one():
    chain = [
        C(i, i * 1.0, 0, i * 1.0 + 10, 10, conf=0.5 + 0.1 * i) for i in range(3)
    ]
    # adjacent pairs: IoU 9/11 ≈ 0.82 > 0.8; ends only transitively joined
    # (IoU 8/12 ≈ 0.67) → still one union group
    out = remove_overlapping_clusters(chain)
    assert len(out) == 1
    assert out[0].id == 2  # largest confidence among rule survivors
