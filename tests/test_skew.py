"""Salted aggregation must be result-identical to the direct
aggregation, including under heavy key skew."""

import pytest

from pyspark.sql import functions as F

from solana_data_etl_pipeline_spark.operators.skew import (
    salted_agg,
    salted_count,
    salted_count_distinct,
    with_salt,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a uniform tail
    hot = spark.range(0, 900).select(
        F.lit("hot").alias("k"), (F.col("id") % 37).alias("v")
    )
    tail = spark.range(0, 100).select(
        F.concat(F.lit("k"), (F.col("id") % 10).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionByName(tail)


def test_with_salt_is_deterministic_and_bounded(skewed):
    a = with_salt(skewed, 8).select("_salt").collect()
    b = with_salt(skewed, 8).select("_salt").collect()
    assert [r._salt for r in a] == [r._salt for r in b]
    assert all(0 <= r._salt < 8 for r in a)
    # the hot key actually spreads across salts
    n = with_salt(skewed.filter(F.col("k") == "hot"), 8).select("_salt").distinct().count()
    assert n > 1


def test_salted_count_matches_direct(skewed):
    direct = {r.k: r["count"] for r in skewed.groupBy("k").count().collect()}
    salted = {r.k: r.cnt for r in salted_count(skewed, ["k"], salt=8).collect()}
    assert salted == direct


def test_salted_agg_matches_direct(skewed):
    direct = {
        r.k: (r.total, r.mx)
        for r in skewed.groupBy("k").agg(F.sum("v").alias("total"), F.max("v").alias("mx")).collect()
    }
    salted = {
        r.k: (r.total, r.mx)
        for r in salted_agg(
            skewed,
            ["k"],
            {"total": (F.sum("v"), F.sum("_p_total")), "mx": (F.max("v"), F.max("_p_mx"))},
            salt=8,
        ).collect()
    }
    assert salted == direct


def test_salted_count_distinct_matches_direct(skewed):
    direct = {
        r.k: r.nd for r in skewed.groupBy("k").agg(F.countDistinct("v").alias("nd")).collect()
    }
    salted = {r.k: r.n_distinct for r in salted_count_distinct(skewed, ["k"], "v", salt=8).collect()}
    assert salted == direct


def _plain_session_stats(df, gap_minutes):
    return (
        df.groupBy(F.col("user_id"), F.session_window("ts", f"{gap_minutes} minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def _rows(df):
    return sorted(
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events) for r in df.collect()
    )


def test_salted_sessions_match_plain_under_hot_key(spark):
    """One user with a large multi-day event burst (the SCALE.md-named
    skew mode) plus normal users: the two-phase bucketed sessionization
    must be row-identical to the built-in session_window plan,
    including sessions that straddle bucket boundaries."""
    import datetime as dt

    from solana_data_etl_pipeline_spark.operators.skew import salted_session_stats

    base = dt.datetime(2024, 3, 1)
    rows = []
    # hot user: 3000 events, mixed within-session jitter and real gaps,
    # crossing several 6h buckets (incl. events landing exactly on
    # bucket edges)
    t = base
    for i in range(3000):
        step = [45, 90, 200, 3700][i % 4] if i % 97 else 8000  # >1h gap every 97th
        t = t + dt.timedelta(seconds=step)
        rows.append(("hot", t, f"e{i}"))
    # tail users: few events each, some single-event sessions
    for u in range(20):
        for j in range(5):
            rows.append((f"u{u}", base + dt.timedelta(hours=u, minutes=j * 70), f"t{u}_{j}"))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_id string")

    gap = 60  # minutes
    got = salted_session_stats(df, gap_minutes=gap, bucket_hours=6)
    want = _plain_session_stats(df, gap)
    assert _rows(got) == _rows(want)

    # plan shape: the EVENT-level exchange must partition on
    # (user_id, bucket) -- the skew split -- while only the much
    # smaller session-level stitch partitions on user_id alone
    import re

    plan = got._jdf.queryExecution().executedPlan().toString()
    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    event_level = [e for e in exchanges if "user_id" in e and "_groupingexpression" in e]
    assert event_level, f"no (key, bucket) exchange found in: {exchanges}"


def test_salted_sessions_stitch_across_bucket_boundary(spark):
    """A session whose events straddle the bucket edge must come back
    as ONE session with correct bounds and count."""
    import datetime as dt

    from solana_data_etl_pipeline_spark.operators.skew import salted_session_stats

    edge = dt.datetime(2024, 3, 2, 0, 0, 0)  # exact 24h bucket boundary
    rows = [
        ("u", edge - dt.timedelta(minutes=20), "a"),
        ("u", edge - dt.timedelta(minutes=5), "b"),
        ("u", edge + dt.timedelta(minutes=10), "c"),  # 15 min after b: same session
        ("u", edge + dt.timedelta(hours=2), "d"),  # > gap: new session
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_id string")
    got = salted_session_stats(df, gap_minutes=30, bucket_hours=24)
    sessions = sorted(got.collect(), key=lambda r: r.session_start)
    assert len(sessions) == 2
    assert sessions[0].n_events == 3
    assert str(sessions[0].session_start).startswith("2024-03-01 23:40")
    assert str(sessions[0].session_end).startswith("2024-03-02 00:10")
    assert sessions[1].n_events == 1
