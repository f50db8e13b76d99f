"""Kernel-level tests for the streaming sessionizer state machine
(_update_sessions driven directly with a fake GroupState): timeout
numbering continuity, late-event high-water-mark handling, and
decimal-exact sums."""

import pandas as pd


class FakeState:
    def __init__(self):
        self._val = None
        self.hasTimedOut = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = tuple(v)

    def remove(self):
        self._val = None

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def _batch(rows):
    return pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
            "value": [r[2] for r in rows],
        }
    )


def _run(state, rows=None, timed_out=False):
    from doc_parser_spark.streaming.stream import _update_sessions

    state.hasTimedOut = timed_out
    out = list(
        _update_sessions(
            (7,), [] if rows is None else [_batch(rows)], state
        )
    )
    return pd.concat(out, ignore_index=True)


def test_timeout_preserves_session_numbering():
    st = FakeState()
    out = _run(st, [(1, "2024-01-01 10:00:00", 1.0),
                    (2, "2024-01-01 10:10:00", 2.0)])
    assert out.empty  # session still open
    # watermark passes 10:10 + 30min -> timeout closes session 0
    closed = _run(st, timed_out=True)
    assert list(closed.itertuples(index=False)) == [
        (7, 0, 2, 3.0)
    ]
    assert st.exists  # numbering residue kept
    # the user returns: numbering continues at 1, exactly like batch
    out = _run(st, [(3, "2024-01-02 09:00:00", 5.0)])
    assert out.empty
    closed = _run(st, timed_out=True)
    assert list(closed.itertuples(index=False)) == [(7, 1, 1, 5.0)]


def test_late_event_does_not_regress_high_water_mark():
    st = FakeState()
    _run(st, [(1, "2024-01-01 10:00:00", 1.0)])
    # in-watermark late event (09:45) joins; the session max stays 10:00
    _run(st, [(2, "2024-01-01 09:45:00", 1.0)])
    sn, last, n, sv, has_open = st.get
    assert n == 2 and has_open
    assert last == int(pd.Timestamp("2024-01-01 10:00:00").value) // 1000
    # 10:20 is within gap of the session max (20 min) -> same session,
    # even though it is 35 min after the late event
    out = _run(st, [(3, "2024-01-01 10:20:00", 1.0)])
    assert out.empty and st.get[2] == 3
    # timeout timestamp derives from the max, not the late event
    assert st.timeout_ms == (st.get[1] + 1_800_000_000) // 1000


def test_sum_matches_decimal_half_up():
    # 2.675 is the float where round() (banker's) and DECIMAL HALF_UP
    # diverge; the kernel must take the batch (HALF_UP) side
    st = FakeState()
    _run(st, [(1, "2024-01-01 10:00:00", 2.675)])
    closed = _run(st, timed_out=True)
    assert closed["sum_value"][0] == 2.68


def test_gap_split_emits_batch_identical_numbering():
    st = FakeState()
    closed = _run(st, [
        (1, "2024-01-01 10:00:00", 1.0),
        (2, "2024-01-01 10:40:00", 2.0),   # 40 min gap -> new session
        (3, "2024-01-01 10:50:00", 3.0),
    ])
    assert list(closed.itertuples(index=False)) == [(7, 0, 1, 1.0)]
    sn, last, n, sv, has_open = st.get
    assert (sn, n) == (1, 2) and has_open
