"""Temporal operator semantics: as-of join edge cases (equal
timestamps, no prior right row, right-only churn) and gap
sessionization boundaries."""

import datetime as dt

import pytest

from solana_data_etl_pipeline_spark.operators.temporal import asof_join, session_stats, sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (100, 1, ts(10)),  # after clicks at 0 and 5 -> asof 5
            (101, 1, ts(5)),  # equal-ts click visible -> asof 5
            (102, 1, ts(1)),  # only click 0 before -> asof 0
            (103, 2, ts(3)),  # user 2 has no clicks -> null
            (104, 3, ts(1)),  # click strictly after -> null
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (900, 1, ts(0), 10.0),
            (901, 1, ts(5), 20.0),
            (902, 3, ts(2), 30.0),
        ],
        "event_id long, user_id long, ts timestamp, click_value double",
    )
    return left, right


def test_asof_join_semantics(frames):
    left, right = frames
    out = {
        r.event_id: (r.asof_ts, r.asof_click_value)
        for r in asof_join(left, right, on="user_id", ts="ts", right_cols=["click_value"]).collect()
    }
    assert out[100] == (ts(5), 20.0)
    assert out[101] == (ts(5), 20.0)  # right row at equal ts IS visible
    assert out[102] == (ts(0), 10.0)
    assert out[103] == (None, None)  # key with no right rows
    assert out[104] == (None, None)  # right row only in the future
    assert len(out) == 5  # left rows preserved exactly


def test_asof_join_tie_break_latest_right_id_wins(spark):
    left = spark.createDataFrame([(1, 1, ts(1))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, 1, ts(0), 1.0), (11, 1, ts(0), 2.0)],
        "event_id long, user_id long, ts timestamp, v double",
    )
    out = asof_join(left, right, on="user_id", ts="ts", right_cols=["v"]).collect()[0]
    assert out.asof_v == 2.0  # larger tie id = later record wins


def test_sessionize_gap_boundaries(spark):
    df = spark.createDataFrame(
        [
            (1, 1, ts(0)),
            (2, 1, ts(29)),  # 29 min gap -> same session
            (3, 1, ts(60)),  # 31 min gap -> new session
            (4, 1, ts(61)),
            (5, 2, ts(0)),  # separate key -> own session
        ],
        "event_id long, user_id long, ts timestamp",
    )
    seqs = {r.event_id: r.session_seq for r in sessionize(df, gap_minutes=30).collect()}
    assert seqs == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_sessionize_exact_gap_is_same_session(spark):
    df = spark.createDataFrame(
        [(1, 1, ts(0)), (2, 1, ts(30))],
        "event_id long, user_id long, ts timestamp",
    )
    seqs = {r.event_id: r.session_seq for r in sessionize(df, gap_minutes=30).collect()}
    assert seqs == {1: 1, 2: 1}  # gap == threshold does NOT split


def test_session_stats_aggregates(spark):
    df = spark.createDataFrame(
        [(1, 1, ts(0)), (2, 1, ts(10)), (3, 1, ts(60))],
        "event_id long, user_id long, ts timestamp",
    )
    rows = {r.session_seq: r for r in session_stats(df, gap_minutes=30).collect()}
    assert rows[1].n_events == 2
    assert rows[1].duration_sec == 600
    assert rows[1].session_start == ts(0) and rows[1].session_end == ts(10)
    assert rows[2].n_events == 1
    assert rows[2].duration_sec == 0
