"""Layout-cluster overlap dedup — the deterministic core of the reference's
``LayoutPostprocessor`` (docling/utils/layout_postprocessor.py).

Our own rule-based clustering (``layout.py:cluster_blocks``) partitions
cells, so it never emits overlapping clusters — but an NN layout model
plugged into ``pdf/extractor.py`` does (that's why the reference has this
pass). This module ports the exact math so the plug point is complete:

* ``UnionFind`` with rank + path compression (layout_postprocessor.py:17-48);
* ``check_overlap``: IoU > 0.8 OR either-direction containment > 0.8
  (:86-106);
* ``should_prefer_cluster`` label rules — LIST_ITEM beats TEXT at similar
  area, CODE absorbs 80%-contained others, else the area/confidence
  threshold test (:405-440);
* group winner: first rule-surviving candidate, upgraded to a larger one
  when confidence is within ``conf_threshold`` (:441-473);
* loser cells merged into the winner, deduplicated by first appearance,
  re-sorted in reading order (:474-528, :561-569).

The R-tree candidate index is replaced by an O(n²) scan: n here is
clusters-per-page (tens), where an index costs more than it saves; the
accepted-pair predicate is identical.
"""

from __future__ import annotations

from dataclasses import dataclass, field

OVERLAP_PARAMS = {
    "regular": {"area_threshold": 1.3, "conf_threshold": 0.05},
    "picture": {"area_threshold": 2.0, "conf_threshold": 0.3},
    "wrapper": {"area_threshold": 2.0, "conf_threshold": 0.2},
}


@dataclass
class LayoutCluster:
    id: int
    label: str  # "text" | "list_item" | "code" | "picture" | ...
    l: float
    t: float
    r: float
    b: float
    confidence: float = 1.0
    cells: list = field(default_factory=list)

    def area(self) -> float:
        return max(0.0, self.r - self.l) * max(0.0, self.b - self.t)

    def intersection_area(self, o: "LayoutCluster") -> float:
        w = min(self.r, o.r) - max(self.l, o.l)
        h = min(self.b, o.b) - max(self.t, o.t)
        return w * h if w > 0 and h > 0 else 0.0

    def iou(self, o: "LayoutCluster") -> float:
        inter = self.intersection_area(o)
        union = self.area() + o.area() - inter
        return inter / union if union > 0 else 0.0

    def intersection_over_self(self, o: "LayoutCluster") -> float:
        a = self.area()
        return self.intersection_area(o) / a if a > 0 else 0.0


class UnionFind:
    """Disjoint-set forest (same role as layout_postprocessor.py:17-48);
    iterative path-halving find, size-weighted union."""

    def __init__(self, elements):
        self._up = {e: e for e in elements}
        self._size = {e: 1 for e in elements}

    def find(self, x):
        up = self._up
        while up[x] != x:
            up[x] = up[up[x]]  # path halving
            x = up[x]
        return x

    def union(self, x, y):
        rx, ry = self.find(x), self.find(y)
        if rx == ry:
            return
        if self._size[rx] < self._size[ry]:
            rx, ry = ry, rx
        self._up[ry] = rx
        self._size[rx] += self._size[ry]

    def get_groups(self) -> dict:
        groups: dict = {}
        for e in self._up:
            groups.setdefault(self.find(e), []).append(e)
        return groups


def check_overlap(
    a: LayoutCluster,
    b: LayoutCluster,
    overlap_threshold: float = 0.8,
    containment_threshold: float = 0.8,
) -> bool:
    """IoU or either-direction containment beyond threshold (:86-106)."""
    if a.area() <= 0 or b.area() <= 0:
        return False
    return (
        a.iou(b) > overlap_threshold
        or a.intersection_over_self(b) > containment_threshold
        or b.intersection_over_self(a) > containment_threshold
    )


def should_prefer_cluster(
    candidate: LayoutCluster, other: LayoutCluster, params: dict
) -> bool:
    """Label rules then area/confidence fallback (:405-440)."""
    if candidate.label == "list_item" and other.label == "text":
        area_ratio = candidate.area() / other.area()
        if abs(1 - area_ratio) < 0.2:
            return True
    if candidate.label == "code":
        if other.intersection_over_self(candidate) > 0.8:
            return True
    area_ratio = candidate.area() / other.area()
    conf_diff = other.confidence - candidate.confidence
    if area_ratio <= params["area_threshold"] and conf_diff > params["conf_threshold"]:
        return False
    return True


def _select_best_from_group(group: list, params: dict) -> LayoutCluster:
    """First rule-surviving candidate, upgraded to a larger near-equal-
    confidence one (:441-473)."""
    current_best = None
    for candidate in group:
        should_select = True
        for other in group:
            if other is candidate:
                continue
            if not should_prefer_cluster(candidate, other, params):
                should_select = False
                break
        if should_select:
            if current_best is None:
                current_best = candidate
            elif (
                candidate.area() > current_best.area()
                and current_best.confidence - candidate.confidence
                <= params["conf_threshold"]
            ):
                current_best = candidate
    return current_best if current_best else group[0]


def remove_overlapping_clusters(
    clusters: list,
    cluster_type: str = "regular",
    overlap_threshold: float = 0.8,
    containment_threshold: float = 0.8,
    sort_key=None,
) -> list:
    """Union overlapping clusters, keep each group's winner, merge the
    losers' cells into it (:474-528). ``sort_key`` orders the merged cells
    (reading order); default keeps (t, l)."""
    if not clusters:
        return []
    params = OVERLAP_PARAMS[cluster_type]
    by_id = {c.id: c for c in clusters}
    uf = UnionFind(by_id.keys())
    items = list(clusters)
    for i, a in enumerate(items):
        for b in items[i + 1 :]:
            if check_overlap(a, b, overlap_threshold, containment_threshold):
                uf.union(a.id, b.id)

    if sort_key is None:
        sort_key = lambda cell: (  # noqa: E731
            getattr(cell, "t", 0.0), getattr(cell, "l", 0.0)
        )

    result = []
    for group_ids in uf.get_groups().values():
        if len(group_ids) == 1:
            result.append(by_id[group_ids[0]])
            continue
        group = [by_id[cid] for cid in group_ids]
        best = _select_best_from_group(group, params)
        for c in group:
            if c is not best:
                best.cells.extend(c.cells)
        # dedup by first appearance on cell identity/index (:561-569)
        seen = set()
        unique = []
        for cell in best.cells:
            key = getattr(cell, "index", id(cell))
            if key not in seen:
                seen.add(key)
                unique.append(cell)
        best.cells = sorted(unique, key=sort_key)
        result.append(best)
    return result
