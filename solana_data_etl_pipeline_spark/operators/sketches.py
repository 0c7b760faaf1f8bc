"""Mergeable HLL sketch rollups (Apache DataSketches via the built-in
``hll_sketch_agg`` family, JVM-side).

The reference computes exact ``COUNT(DISTINCT wallet)`` per window by
rescanning the warehouse (reference src/analytics.rs:577-599). At
100 TB the scale-correct pattern is to materialize a *sketch* per
fine-grained partition (day) once, then answer any coarser window
(week / month / all-time) by merging sketches -- merge is lossless
for HLL, so the rollup estimate is identical to sketching the raw
rows, without ever rescanning them.

These cannot be DuckDB-oracled (sketch binaries are engine-specific),
so the suite registers the rollup as a rows-only query; the accuracy
and merge-consistency contracts are pinned in tests/test_approx.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def daily_user_sketches(events: DataFrame) -> DataFrame:
    """One HLL sketch of user_id per day -- the materialized building
    block. Single partial+final agg; the shuffle carries one sketch
    (~KBs) per (partition, day), not user rows."""
    return events.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg(F.col("user_id")).alias("user_sketch"),
        F.count("*").alias("events"),
    )


def merge_user_sketches(daily: DataFrame) -> DataFrame:
    """Coarse rollup from the materialized daily sketches: one merged
    estimate, never touching the raw events again."""
    return daily.agg(F.hll_union_agg("user_sketch").alias("merged")).select(
        F.hll_sketch_estimate("merged").alias("est_users")
    )


def user_exact_rollup(events: DataFrame) -> DataFrame:
    """Exact COUNT(DISTINCT) twin of :func:`user_sketch_rollup` --
    identical ROLLUP grouping sets (Expand + distinct agg) with exact
    counts instead of HLL estimates, so the grouping-set *shape* is
    fully DuckDB-oracle-able while the sketch variant stays rows-only.
    At 100 TB you run the sketch version; this is the correctness
    anchor that pins the plan the two share."""
    return (
        events.rollup(F.to_date("ts").alias("day"))
        .agg(F.count_distinct(F.col("user_id")).alias("n_users"))
        .select(
            F.when(F.col("day").isNull(), F.lit("total")).otherwise(F.lit("day")).alias("grain"),
            "day",
            "n_users",
        )
    )


def user_sketch_rollup(events: DataFrame) -> DataFrame:
    """Per-day + grand-total distinct-user estimates in ONE scan via
    ROLLUP grouping sets (Expand + single partial+final agg) -- the
    day rows are what you would materialize; the total row demonstrates
    the coarser grain from the same pass."""
    return (
        events.rollup(F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg(F.col("user_id"))).alias("est_users"))
        .select(
            F.when(F.col("day").isNull(), F.lit("total")).otherwise(F.lit("day")).alias("grain"),
            "day",
            "est_users",
        )
    )
