"""AS-OF join rewrite semantics (relational.asof_join): most recent
right row at-or-before each left timestamp per key; ties match; left
rows without history keep NULLs."""

from datetime import datetime


def test_asof_join_hand_computed(spark):
    from doc_parser_spark.operators.relational import asof_join

    t = lambda s: datetime(2024, 1, 1, *s)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, "A", t((10, 0, 5)), 1.0),
            (2, "A", t((10, 0, 0)), 2.0),   # equal-ts tie: must match
            (3, "B", t((9, 0, 0)), 3.0),    # before any B quote: NULLs
        ],
        "event_id long, user_id string, ts timestamp_ntz, value double",
    )
    right = spark.createDataFrame(
        [
            ("A", t((10, 0, 0)), 100),
            ("A", t((10, 0, 4)), 104),
            ("A", t((10, 0, 6)), 106),      # after every left row: never used
            ("B", t((12, 0, 0)), 200),
        ],
        "user_id string, ts timestamp_ntz, quote long",
    )
    out = {
        r["event_id"]: (r["ts_asof"], r["quote_asof"])
        for r in asof_join(
            left, right, on="user_id", ts="ts", right_cols=("quote",)
        ).collect()
    }
    assert out[1] == (t((10, 0, 4)), 104)
    assert out[2] == (t((10, 0, 0)), 100)
    assert out[3] == (None, None)
    # original left columns survive untouched
    cols = asof_join(left, right, right_cols=("quote",)).columns
    assert cols == ["event_id", "user_id", "ts", "value", "ts_asof", "quote_asof"]


def test_interval_join_hand_computed(spark):
    import pytest

    from doc_parser_spark.operators.relational import interval_join

    t = lambda s: datetime(2024, 1, 1, *s)  # noqa: E731
    events = spark.createDataFrame(
        [
            (1, "A", t((10, 0, 0))),   # == start: inside (half-open)
            (2, "A", t((10, 9, 59))),  # inside
            (3, "A", t((10, 10, 0))),  # == end: OUTSIDE
            (4, "A", t((9, 59, 59))),  # before
            (5, "B", t((10, 5, 0))),   # right key, other user's window
        ],
        "event_id long, user_id string, ts timestamp_ntz",
    )
    windows = spark.createDataFrame(
        [("w1", "A", t((10, 0, 0)), t((10, 10, 0))),
         ("w2", "B", t((10, 0, 0)), t((10, 10, 0)))],
        "win string, user_id string, start_ts timestamp_ntz, end_ts timestamp_ntz",
    )
    # bucket smaller than the interval so one window explodes onto
    # several buckets — events must still match exactly once
    out = interval_join(
        events, windows, on="user_id", left_ts="ts",
        right_start="start_ts", right_end="end_ts", bucket_seconds=120,
    ).select("event_id", "win").collect()
    got = sorted((r["event_id"], r["win"]) for r in out)
    assert got == [(1, "w1"), (2, "w1"), (5, "w2")]

    with pytest.raises(ValueError):
        interval_join(events, windows, bucket_seconds=0)


def test_props_stats_json_extraction(spark):
    from doc_parser_spark.operators.relational import props_stats

    df = spark.createDataFrame(
        [
            (1, "click", '{"k": 5}'),
            (2, "click", '{"k": 7}'),
            (3, "click", '{"other": 1}'),  # field absent -> NULL k
            (4, "view", "not json"),       # malformed -> NULL k
        ],
        "event_id long, event_type string, props string",
    )
    out = {r["event_type"]: r for r in props_stats(df).collect()}
    c = out["click"]
    assert (c["n_events"], c["n_with_field"], c["sum_k"], c["min_k"], c["max_k"]) == (
        3, 2, 12, 5, 7)
    v = out["view"]
    assert (v["n_events"], v["n_with_field"], v["sum_k"]) == (1, 0, None)


def test_asof_join_matches_bruteforce_random(spark):
    import random
    from datetime import timedelta

    from doc_parser_spark.operators.relational import asof_join

    rnd = random.Random(42)
    base = datetime(2024, 1, 1)
    lefts = [
        (i, f"u{rnd.randrange(8)}", base + timedelta(seconds=rnd.randrange(5000)))
        for i in range(120)
    ]
    # right unique per (key, ts) per the operator contract
    rmap = {}
    for i in range(200):
        k = (f"u{rnd.randrange(8)}",
             base + timedelta(seconds=rnd.randrange(5000)))
        rmap.setdefault(k, 1000 + i)
    rights = [(k, ts, v) for (k, ts), v in rmap.items()]

    left = spark.createDataFrame(
        lefts, "event_id long, user_id string, ts timestamp_ntz")
    right = spark.createDataFrame(
        rights, "user_id string, ts timestamp_ntz, quote long")

    expected = {}
    for eid, k, ts in lefts:
        cand = [(rts, v) for (rk, rts, v) in rights if rk == k and rts <= ts]
        expected[eid] = max(cand) if cand else (None, None)

    got = {
        r["event_id"]: (r["ts_asof"], r["quote_asof"])
        for r in asof_join(left, right, right_cols=("quote",)).collect()
    }
    assert got == expected


def test_funnel_strict_ordering(spark):
    from doc_parser_spark.operators.relational import funnel

    rows = [
        # u1 completes all three in order
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 00:01:00", "click"),
        (1, "2024-01-01 00:02:00", "purchase"),
        # u2 purchases BEFORE clicking: purchase must not count
        (2, "2024-01-01 00:00:00", "view"),
        (2, "2024-01-01 00:02:00", "click"),
        (2, "2024-01-01 00:01:00", "purchase"),
        # u3 same-timestamp view+click: strict > means click doesn't chain
        (3, "2024-01-01 00:00:00", "view"),
        (3, "2024-01-01 00:00:00", "click"),
        # u4 never views: clicks alone complete nothing
        (4, "2024-01-01 00:00:00", "click"),
        # u5 re-views after an early click; later click chains
        (5, "2024-01-01 00:00:00", "view"),
        (5, "2024-01-01 00:03:00", "click"),
    ]
    events = spark.createDataFrame(
        [(u, ts, t) for u, ts, t in rows],
        "user_id long, ts_s string, event_type string",
    ).selectExpr("user_id", "cast(ts_s as timestamp) AS ts", "event_type")
    by = {r["user_id"]: r for r in funnel(events).collect()}
    assert by[1]["steps_completed"] == 3
    assert by[2]["steps_completed"] == 2 and by[2]["first_purchase"] is None
    assert by[3]["steps_completed"] == 1 and by[3]["first_click"] is None
    assert by[4]["steps_completed"] == 0 and by[4]["first_view"] is None
    assert by[5]["steps_completed"] == 2

    # one exchange total: window chain + rollup share the user key
    plan = funnel(events)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan
