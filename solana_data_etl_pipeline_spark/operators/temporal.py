"""Temporal operators: as-of join and sessionization.

Spark lacks a first-class AS-OF join; the scalable formulation is the
union + time-ordered window scan (never a per-key loop, never a
correlated subquery):

- as-of:   UNION both sides tagged, sort within the key partition by
           (ts, tie-break), carry the right side's last non-null value
           forward with last(..., ignorenulls) -- ONE shuffle on the
           join key, linear scan per key, no candidate blow-up. This is
           the classic "merge as-of" from time-series engines
           (kdb aj / pandas merge_asof) re-expressed as a window.
- session: lag + gap-flag + running sum over the same (key, ts)
           ordering -- one shuffle, then a session-keyed aggregation
           that reuses the partitioning.

Both orderings include a unique id tie-break so results are
deterministic and engine-portable (oracle-checkable).

At 100 TB both operators shuffle each row exactly once on the entity
key; skewed keys (one user with millions of events) are the failure
mode to watch -- mitigate upstream with key-salting + two-phase session
stitching if a key exceeds a partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_sec(c: Column) -> Column:
    """Epoch seconds (floor) of a TIMESTAMP or TIMESTAMP_NTZ column.
    Casts through TIMESTAMP_LTZ explicitly ("timestamp" would resolve
    back to NTZ under spark.sql.timestampType=TIMESTAMP_NTZ, which
    cannot cast to BIGINT); under the engine's UTC session zone this
    matches an oracle's naive-timestamp date_diff('second', ...)."""
    return c.cast("timestamp_ltz").cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    tie: str = "event_id",
) -> DataFrame:
    """For each left row, attach the most recent right row with the
    same `on` key and right.ts <= left.ts (ties broken by `tie` id:
    the largest wins, matching 'latest record' semantics).

    Implementation: tagged union -> window last(ignorenulls) ordered by
    (ts, side, tie), where right rows sort BEFORE left rows at equal
    timestamps so an equal-ts right row is visible to the left row.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, ts)]
    l = left.withColumn("_side", F.lit(1))
    r = (
        right.select(
            F.col(on),
            F.col(ts),
            F.col(tie),
            F.col(ts).alias("_r_ts"),
            *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        )
        .withColumn("_side", F.lit(0))
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col(tie).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *left.columns,
        "_side",
        F.last("_r_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in right_cols],
    )
    # a right row newer than a left row's ts can never leak backwards:
    # the window is cumulative, so asof_ts <= ts by construction.
    return carried.filter(F.col("_side") == 1).drop("_side")


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
    tie: str = "event_id",
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the
    time since the key's previous event exceeds `gap_minutes`.

    Returns the input plus `session_seq` (1-based per-key session
    ordinal). One shuffle on the key; the running sum reuses the same
    window partitioning (no second exchange).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(tie).asc())
    prev = F.lag(ts).over(w)
    new_flag = F.when(
        prev.isNull() | (epoch_sec(F.col(ts)) - epoch_sec(prev) > gap_minutes * 60), 1
    ).otherwise(0)
    return df.withColumn("session_seq", F.sum(new_flag).over(w.rowsBetween(Window.unboundedPreceding, 0)))


def session_stats(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
    tie: str = "event_id",
) -> DataFrame:
    """Per-session aggregates: (key, session_seq, start, end,
    n_events, duration_sec). The groupBy key prefix matches the
    sessionize window partitioning, so AQE/EnsureRequirements can
    avoid a second full shuffle of the wide rows.
    """
    s = sessionize(df, key, ts, gap_minutes, tie)
    return s.groupBy(F.col(key), F.col("session_seq")).agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count("*").alias("n_events"),
        (epoch_sec(F.max(F.col(ts))) - epoch_sec(F.min(F.col(ts)))).alias("duration_sec"),
    )
