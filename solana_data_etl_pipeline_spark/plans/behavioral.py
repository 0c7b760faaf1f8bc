"""Behavioral / time-series analytics over the event stream.

The reference's analytics stop at fixed-window counts and top-k
(reference src/analytics.rs:243-712); a production event warehouse is
asked richer questions of the same fact table: who is new, who comes
back, how users move through a funnel, and what the series looks like
with its gaps made explicit. These plans implement those four
families Spark-first over the raw ``events`` table.

Scale notes (100 TB design point):

- Every plan starts with a per-user or per-bucket aggregation that is
  partial+final (map-side combine), so the single shuffle each plan
  needs carries one row per user / per time-bucket -- not per event.
- Results are time-grain-sized (one row per day/week/stage), so the
  ordered cumulative window at the end of ``cumulative_new_users``
  runs over a tiny aggregate, not the fact table; the single-partition
  window there is bounded by calendar size, never data size.
- The gap-fill spine is generated from a 1-row min/max aggregate via
  ``sequence`` + ``explode`` -- its length is bounded by the calendar
  range (hours), independent of event volume, and the join back to
  the hourly counts broadcasts the spine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cumulative_new_users(events: DataFrame) -> DataFrame:
    """Daily new users (first-ever activity that day) and the running
    total. The classic "running distinct count" is re-expressed as
    min-date-per-user + cumulative sum -- exact, and needs one shuffle
    on user_id instead of a stateful distinct over the whole stream."""
    first_seen = events.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    daily = first_seen.groupBy("first_day").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("first_day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "first_day",
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


def weekly_cohort_retention(events: DataFrame) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active week,
    distinct actives per (cohort, week-offset). Two aggregations and
    one join -- the join key is user_id, and the cohort side is one
    row per user, so at scale it is a co-partitioned shuffle join
    where both sides were already hashed on user_id by their aggs."""
    week = F.date_trunc("week", F.col("ts"))
    cohorts = events.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = events.select("user_id", week.alias("activity_week")).distinct()
    return (
        activity.join(cohorts, "user_id")
        .groupBy(
            F.to_date("cohort_week").alias("cohort_week"),
            (F.datediff(F.to_date("activity_week"), F.to_date("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )


FUNNEL_STAGES = ["signup", "view", "click", "purchase"]


def event_funnel(events: DataFrame, stages: list[str] | None = None) -> DataFrame:
    """Strict-order funnel on first occurrence: a user converts at
    stage k iff their first stage-k event is at-or-after their first
    stage-(k-1) event. One conditional-min aggregation per user (a
    single shuffle carrying |stages| timestamps per user), then a
    calendar-free per-row stage test and a tiny count per stage."""
    stages = stages or FUNNEL_STAGES
    mins = events.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t{i}")
            for i, s in enumerate(stages)
        ]
    )
    # reached(k) = all of t0..tk present and non-decreasing
    reached = []
    for i in range(len(stages)):
        cond = F.col("t0").isNotNull()
        for j in range(1, i + 1):
            cond = cond & F.col(f"t{j}").isNotNull() & (F.col(f"t{j}") >= F.col(f"t{j-1}"))
        reached.append(F.sum(cond.cast("int")).alias(f"s{i}"))
    wide = mins.agg(*reached)
    # pivot the 1-row aggregate to stage rows via array+explode -- a
    # union of per-stage selects would re-execute the whole upstream
    # aggregation (and rescan the fact table) once per stage
    stage_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage_idx"),
                F.lit(s).alias("stage"),
                F.col(f"s{i}").cast("long").alias("users"),
            )
            for i, s in enumerate(stages)
        ]
    )
    return wide.select(F.explode(stage_structs).alias("r")).select("r.*")


def hourly_gapfill(events: DataFrame, event_type: str = "error") -> DataFrame:
    """Hourly counts for one event type with missing hours made
    explicit as zero rows (the gap-filled series every downstream
    moving-average / anomaly job needs). The spine comes from a 1-row
    min/max agg over the *full* stream -> sequence + explode; its
    length is calendar-bounded. The hourly counts (sparse) left-join
    onto the spine; Spark broadcasts the larger-but-bounded spine or
    the counts, whichever AQE sizes smaller."""
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour_ts")
    )
    counts = (
        events.filter(F.col("event_type") == event_type)
        .groupBy(hour.alias("hour_ts"))
        .agg(F.count("*").alias("cnt"))
    )
    return spine.join(counts, "hour_ts", "left").select(
        "hour_ts", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
