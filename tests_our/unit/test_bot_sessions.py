"""bot_sessions: machine-pacing detection over the gap-split walk."""

import datetime as dt

import pytest

from doc_parser_spark.operators import relational as rel

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    # rows: (event_id, user_id, offset_seconds, event_type)
    data = [
        (eid, T0 + dt.timedelta(seconds=off), uid, etype, 1.0, "{}")
        for eid, uid, off, etype in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


@pytest.mark.unit
def test_bot_vs_human_pacing(spark):
    rows = []
    # user 1: 10 events exactly 1s apart -> mean gap 1000ms -> bot
    rows += [(i, 1, i, "view") for i in range(10)]
    # user 2: 10 events 60s apart -> human pacing
    rows += [(100 + i, 2, i * 60, "view") for i in range(10)]
    # user 3: only 3 rapid events -> under min_events, not a bot
    rows += [(200 + i, 3, i, "view") for i in range(3)]
    out = {
        r["user_id"]: r.asDict()
        for r in rel.bot_sessions(_events(spark, rows)).collect()
    }
    assert out[1]["is_bot"] is True
    assert out[1]["mean_gap_ms"] == 1000
    assert out[1]["duration_ms"] == 9000
    assert out[2]["is_bot"] is False
    assert out[2]["mean_gap_ms"] == 60000
    assert out[3]["is_bot"] is False and out[3]["n_events"] == 3


@pytest.mark.unit
def test_gap_split_and_error_share(spark):
    # user 5: burst of 6 fast events (1s apart), a 31-minute silence,
    # then 2 more — two sessions; first has 3 errors out of 6
    rows = [(i, 5, i, "error" if i < 3 else "view") for i in range(6)]
    rows += [(10, 5, 10 + 31 * 60, "view"), (11, 5, 12 + 31 * 60, "view")]
    out = {
        r["session_no"]: r.asDict()
        for r in rel.bot_sessions(_events(spark, rows)).collect()
    }
    assert sorted(out) == [0, 1]
    assert out[0]["n_events"] == 6
    assert out[0]["n_errors"] == 3
    assert out[0]["error_permille"] == 500
    assert out[0]["is_bot"] is True
    assert out[1]["n_events"] == 2 and out[1]["is_bot"] is False


@pytest.mark.unit
def test_single_event_session(spark):
    out = rel.bot_sessions(_events(spark, [(1, 9, 0, "view")])).collect()
    r = out[0].asDict()
    assert r["duration_ms"] == 0 and r["mean_gap_ms"] == 0
    assert r["is_bot"] is False
