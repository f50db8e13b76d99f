"""Property tests for the driver-held Lloyd's trainer (similarity._lloyd).

Six oracle queries ride on the claim that the numpy-vectorized trainer is
ARITHMETIC-EXACT to a sequential left-fold formulation (the contract the
DuckDB twins implement). This replica executes that formulation the naive
way — pure-Python loops, one float64 accumulation per dimension in order —
and the property asserts bit-equality of every centroid coordinate.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from doc_parser_spark.operators.similarity import _lloyd

pytestmark = pytest.mark.unit


def _lloyd_replica(vecs, cents, iters):
    """Sequential reference: left-fold distances, first-min argmin,
    floor(x*1e6) int sums, one double division per coordinate."""
    n = len(vecs)
    dims = len(vecs[0])
    k = len(cents)
    for _ in range(iters):
        counts = [0] * k
        sums = [[0] * dims for _ in range(k)]
        for row in vecs:
            best, best_d = 0, None
            for ci in range(k):
                acc = 0.0
                for d in range(dims):
                    diff = row[d] - cents[ci][d]
                    acc = acc + diff * diff
                if best_d is None or acc < best_d:
                    best_d, best = acc, ci
            counts[best] += 1
            for d in range(dims):
                sums[best][d] += int(math.floor(row[d] * 1000000.0))
        nxt = []
        for ci in range(k):
            if counts[ci] == 0:
                nxt.append(cents[ci])
            else:
                nxt.append(
                    [(sums[ci][d] / counts[ci]) / 1e6 for d in range(dims)]
                )
        cents = nxt
    return cents


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(
        st.lists(
            st.floats(
                min_value=-4.0,
                max_value=4.0,
                allow_nan=False,
                allow_infinity=False,
                width=32,  # embeddings arrive as float32
            ),
            min_size=6,
            max_size=6,
        ),
        min_size=3,
        max_size=40,
    ),
    k=st.integers(min_value=1, max_value=5),
    iters=st.integers(min_value=1, max_value=3),
)
def test_lloyd_bit_equals_sequential_replica(data, k, iters):
    vecs = np.array(data, dtype="float64")
    k = min(k, len(vecs))
    init = [[float(v) for v in vecs[i]] for i in range(k)]
    fast = _lloyd(vecs, [list(c) for c in init], iters)
    slow = _lloyd_replica([list(r) for r in vecs], [list(c) for c in init], iters)
    assert len(fast) == len(slow) == k
    for cf, cs in zip(fast, slow):
        for a, b in zip(cf, cs):
            # bit-equality, not approx — the oracle contract is exact
            assert a == b, (a, b)


def test_lloyd_empty_cell_keeps_previous_centroid():
    # two far clusters, a third centroid no point is nearest to
    vecs = np.array([[0.0, 0.0], [0.1, 0.0], [9.0, 9.0], [9.1, 9.0]])
    init = [[0.0, 0.0], [9.0, 9.0], [100.0, 100.0]]
    out = _lloyd(vecs, [list(c) for c in init], 2)
    assert out[2] == [100.0, 100.0]
