"""Edge-case semantics for the behavioral suite (plans/behavioral.py)
on crafted micro-data. The DuckDB oracle (tools/selfcheck.py) covers
value parity on the testdata; these pin the *semantics* the oracle
can't distinguish there: strict funnel ordering, zero-filled gaps,
cohort offsets, cumulative monotonicity.
"""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from solana_data_etl_pipeline_spark.plans import behavioral as B


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, d, h), u, t, 1.0, "{}") for i, (d, h, u, t) in enumerate(rows)],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )


@pytest.fixture(scope="module")
def funnel_events(spark):
    # u1 completes all 4 stages in order; u2 purchases BEFORE clicking
    # (must not count at click/purchase); u3 signs up only; u4 never
    # signs up (must not count anywhere).
    return _ev(
        spark,
        [
            (1, 0, 1, "signup"), (1, 1, 1, "view"), (1, 2, 1, "click"), (1, 3, 1, "purchase"),
            (2, 0, 2, "signup"), (2, 1, 2, "view"), (2, 3, 2, "purchase"), (2, 4, 2, "click"),
            (3, 0, 3, "signup"),
            (4, 0, 4, "view"), (4, 1, 4, "click"), (4, 2, 4, "purchase"),
        ],
    )


def test_funnel_strict_ordering(funnel_events):
    got = {r.stage: r.users for r in B.event_funnel(funnel_events).collect()}
    assert got == {"signup": 3, "view": 2, "click": 2, "purchase": 1}


def test_funnel_same_timestamp_counts(spark):
    # first click at exactly the first view's timestamp still converts
    ev = _ev(spark, [(1, 0, 1, "signup"), (1, 1, 1, "view"), (1, 1, 1, "click")])
    got = {r.stage: r.users for r in B.event_funnel(ev).collect()}
    assert got["click"] == 1


def test_hourly_gapfill_zero_rows_and_span(spark):
    # errors at hours 0 and 3 of Jan 1; events span hours 0..5
    ev = _ev(
        spark,
        [(1, 0, 1, "error"), (1, 3, 1, "error"), (1, 3, 2, "error"), (1, 5, 1, "view")],
    )
    rows = sorted(B.hourly_gapfill(ev).collect(), key=lambda r: r.hour_ts)
    assert len(rows) == 6  # full calendar span, not just observed hours
    assert [r.cnt for r in rows] == [1, 0, 0, 2, 0, 0]


def test_cumulative_new_users_monotone(spark):
    ev = _ev(
        spark,
        [(1, 0, 1, "view"), (1, 5, 2, "view"), (2, 0, 1, "view"), (3, 0, 3, "view")],
    )
    rows = sorted(B.cumulative_new_users(ev).collect(), key=lambda r: r.first_day)
    # day1: users 1,2 new; day3: user 3 new; user 1's day-2 return adds nothing
    assert [(r.new_users, r.cumulative_users) for r in rows] == [(2, 2), (1, 3)]


def test_cohort_offsets(spark):
    # user 1 first active week of Jan 1 (Mon), returns 2 weeks later;
    # user 2 joins week 2 only.
    ev = _ev(spark, [(1, 0, 1, "view"), (15, 0, 1, "view"), (8, 0, 2, "view")])
    got = {(r.cohort_week.isoformat(), r.week_offset): r.active_users
           for r in B.weekly_cohort_retention(ev).collect()}
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_stratified_sample_rates(spark):
    from solana_data_etl_pipeline_spark.operators import text as X

    docs = spark.createDataFrame(
        [(i, "t", ["en", "zh", "xx"][i % 3], "s", 1) for i in range(300)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {r.stratum: r for r in X.stratified_sample_stats(docs, {"en": 0, "zh": 100}).collect()}
    assert rows["zh"].sampled == rows["zh"].total == 100  # rate 100 keeps all
    assert rows["en"].sampled == 0                        # rate 0 keeps none
    assert rows["xx"].sampled == 0 and rows["xx"].rate_pct == 0  # unmapped stratum dropped
