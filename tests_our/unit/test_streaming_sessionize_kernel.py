"""Kernel-level tests for the streaming sessionizer state machine
(_update_sessions driven directly with a fake GroupState): watermark
sealing, late-event bridging, timeout numbering continuity, null-value
semantics, and decimal-exact sums."""

import pandas as pd

US = 1_000_000
GAP_US = 1_800_000_000  # 30 min


def _us(ts: str) -> int:
    return int(pd.Timestamp(ts).value) // 1000


class FakeState:
    def __init__(self):
        self._val = None
        self.hasTimedOut = False
        self.timeout_ms = None
        self.watermark_ms = 0

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

    def getCurrentWatermarkMs(self):
        return self.watermark_ms


def _batch(rows):
    return pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
            "value": [r[2] for r in rows],
        }
    )


def _run(state, rows=None, timed_out=False, watermark=None):
    from doc_parser_spark.streaming.stream import _update_sessions

    state.hasTimedOut = timed_out
    if watermark is not None:
        state.watermark_ms = _us(watermark) // 1000
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
    # watermark passes 10:10 + 30min -> timeout seals session 0
    closed = _run(st, timed_out=True, watermark="2024-01-01 10:40:00")
    assert list(closed.itertuples(index=False)) == [
        (7, 0, 2, 3.0)
    ]
    assert st.exists  # numbering residue kept
    assert st.get[1] == [] and st.get[2] == []  # buffer drained
    # the user returns: numbering continues at 1, exactly like batch
    out = _run(st, [(3, "2024-01-02 09:00:00", 5.0)])
    assert out.empty
    closed = _run(st, timed_out=True, watermark="2024-01-02 09:30:00")
    assert list(closed.itertuples(index=False)) == [(7, 1, 1, 5.0)]


def test_in_batch_gap_waits_for_watermark_and_late_event_bridges():
    """The batch twin merges 10:00/10:20/10:40 into ONE session; a
    stream that sealed on the in-arrival 10:00->10:40 gap could never
    agree once the late 10:20 arrived."""
    st = FakeState()
    closed = _run(st, [
        (1, "2024-01-01 10:00:00", 1.0),
        (2, "2024-01-01 10:40:00", 2.0),  # 40-min in-batch gap
    ])
    assert closed.empty  # NOT sealed: watermark hasn't passed 10:30
    # the bridging late event arrives while still admissible
    closed = _run(st, [(3, "2024-01-01 10:20:00", 3.0)])
    assert closed.empty
    # watermark passes 10:40 + gap -> one merged session, batch-identical
    closed = _run(st, timed_out=True, watermark="2024-01-01 11:20:00")
    assert list(closed.itertuples(index=False)) == [(7, 0, 3, 6.0)]


def test_watermark_seals_leading_session_keeps_trailing_open():
    st = FakeState()
    closed = _run(
        st,
        [
            (1, "2024-01-01 10:00:00", 1.0),
            (2, "2024-01-01 12:00:00", 2.0),  # separate gap session
        ],
        watermark="2024-01-01 11:00:00",  # seals 10:00+30min, not 12:00
    )
    assert list(closed.itertuples(index=False)) == [(7, 0, 1, 1.0)]
    sn, ts_buf, _ = st.get
    assert sn == 1 and ts_buf == [_us("2024-01-01 12:00:00")]
    # timeout re-fires at the kept session's seal time
    assert st.timeout_ms == (_us("2024-01-01 12:30:00")) // 1000


def test_null_values_skip_sum_but_count_events():
    st = FakeState()
    _run(st, [(1, "2024-01-01 10:00:00", 1.5),
              (2, "2024-01-01 10:05:00", float("nan"))])
    closed = _run(st, timed_out=True, watermark="2024-01-01 10:40:00")
    assert list(closed.itertuples(index=False)) == [(7, 0, 2, 1.5)]
    # an all-null session emits a null sum (batch SUM over all NULLs)
    st2 = FakeState()
    _run(st2, [(1, "2024-01-01 10:00:00", float("nan"))])
    closed = _run(st2, timed_out=True, watermark="2024-01-01 10:40:00")
    row = list(closed.itertuples(index=False))[0]
    assert (row[0], row[1], row[2]) == (7, 0, 1) and pd.isna(row[3])


def test_sum_matches_decimal_half_up():
    # 2.675 is the float where round() (banker's) and DECIMAL HALF_UP
    # diverge; the kernel must take the batch (HALF_UP) side
    st = FakeState()
    _run(st, [(1, "2024-01-01 10:00:00", 2.675)])
    closed = _run(st, timed_out=True, watermark="2024-01-01 11:00:00")
    assert closed["sum_value"][0] == 2.68


def test_sealed_sessions_emit_in_numbering_order():
    st = FakeState()
    closed = _run(
        st,
        [
            (1, "2024-01-01 09:00:00", 1.0),
            (2, "2024-01-01 10:00:00", 2.0),
            (3, "2024-01-01 11:00:00", 3.0),
        ],
        watermark="2024-01-01 11:00:00",  # seals the first two sessions
    )
    assert list(closed.itertuples(index=False)) == [
        (7, 0, 1, 1.0),
        (7, 1, 1, 2.0),
    ]
    assert st.get[0] == 2  # next session number


def test_randomized_out_of_order_delivery_matches_batch_reference():
    """Property: for ANY admissible delivery order and batch chunking,
    the sealed sessions equal a straightforward batch reference
    (sort -> gap-split -> aggregate) once the watermark passes
    everything. Late events are only delivered while still admissible
    (ts >= watermark), mirroring Spark's pre-filter."""
    import random

    base = pd.Timestamp("2024-01-01 08:00:00")
    rng = random.Random(1234)
    for trial in range(25):
        n = rng.randint(1, 24)
        # event times with a mix of tight and session-breaking gaps
        offsets, cur = [], 0
        for _ in range(n):
            cur += rng.choice([60, 300, 900, 1801, 3600, 7200])
            offsets.append(cur)
        events = [
            (i, base + pd.Timedelta(seconds=off), round(rng.uniform(0, 9), 3))
            for i, off in enumerate(offsets)
        ]

        from doc_parser_spark.streaming.stream import _round2, _scale4

        # streamed delivery: shuffle, chunk; an event is ADMITTED only
        # while ts >= watermark (Spark's pre-filter drops the rest
        # before the function); the watermark advances to the max event
        # time seen so far (0s lateness — aggressive sealing)
        st = FakeState()
        shuffled = events[:]
        rng.shuffle(shuffled)
        delivered, got = [], []
        wm_ms, i = 0, 0
        while i < len(shuffled):
            size = rng.randint(1, 4)
            raw = shuffled[i : i + size]
            i += size
            chunk = [
                e for e in raw if int(e[1].value) // 1_000_000 >= wm_ms
            ]
            if not chunk:
                continue
            delivered += chunk
            st.watermark_ms = wm_ms
            out = _run(st, [(e[0], str(e[1]), e[2]) for e in chunk])
            got += list(out.itertuples(index=False, name=None))
            wm_ms = max(
                wm_ms,
                max(int(e[1].value) // 1_000_000 for e in chunk),
            )
        # drain: push the watermark past everything
        st.watermark_ms = (
            int((base + pd.Timedelta(seconds=cur + 4000)).value)
            // 1_000_000
        )
        out = _run(st, timed_out=True)
        got += list(out.itertuples(index=False, name=None))

        # batch reference over the ADMITTED events: sort by ts, split on
        # >30min gaps — the parity contract covers every admitted event
        ref, cur_s = [], []
        for ev in sorted(delivered, key=lambda e: e[1]):
            if cur_s and (ev[1] - cur_s[-1][1]).total_seconds() > 1800:
                ref.append(cur_s)
                cur_s = []
            cur_s.append(ev)
        if cur_s:
            ref.append(cur_s)
        expected = [
            (7, j, len(s), _round2(sum(_scale4(v) for _, _, v in s)))
            for j, s in enumerate(ref)
        ]
        assert got == expected, f"trial {trial}: {got} != {expected}"
