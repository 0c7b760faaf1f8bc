"""Dimension-table builders over the canonical event log.

The reference documents dim_wallets / dim_programs / dim_tokens as
warehouse tables maintained by scheduled jobs
(reference docs/SCHEMA.md:196-262) and shows the intended consumption
shape -- a fact-to-dim LEFT JOIN with a COALESCE fallback for unnamed
programs (docs/SCHEMA.md:362-370). Spark-first, each dim is ONE
hash-aggregation over the event log (single shuffle on the dim key);
no scheduled mutation machinery is needed because the builder IS the
materialized view definition -- write the result with
plans/canonical.py-style overwrite writers on whatever cadence.

Scale notes:

- Each builder shuffles once on its natural key (wallet / program_id /
  token_mint); all measures are map-side-combinable aggregates.
- dim_wallets' received-transfer counts aggregate on a DIFFERENT key
  (to_wallet), which is its own single-shuffle aggregation joined back
  on the dim key; the join is between two already-reduced per-key
  tables, orders of magnitude smaller than the log.
- The fact->dim join broadcasts the dim: a program dimension is
  bounded by the number of distinct programs ever seen -- the classic
  small-dim star join (same shape tests pin for the TPC-H suite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Programs with above-average event counts get a human-readable name
# in dim_programs (name-registry semantics: only well-known programs
# are named, docs/SCHEMA.md:227). Mean-relative so the LEFT-join
# COALESCE exercises BOTH the named and unnamed branch at every data
# scale; the mean is an aggregate OF THE DIM TABLE (per-program rows),
# a broadcast scalar, never a second pass over the log.


def dim_wallets(events: DataFrame) -> DataFrame:
    """dim_wallets (reference docs/SCHEMA.md:196-219): per-wallet
    first/last activity plus computed aggregates. Keyed on acting
    wallets; counterpart-only ids contribute received counts via a
    per-key join."""
    base = events.groupBy("wallet").agg(
        F.min("block_time").alias("first_seen_time"),
        F.max("block_time").alias("last_seen_time"),
        F.sum(F.when(F.col("event_type") == "transaction", 1).otherwise(0))
        .cast("long")
        .alias("total_transactions"),
        F.sum(F.when(F.col("event_type") == "token_transfer", 1).otherwise(0))
        .cast("long")
        .alias("total_tokens_sent"),
    )
    recv = (
        events.filter(F.col("event_type") == "token_transfer")
        .groupBy(F.col("to_wallet").alias("wallet"))
        .agg(F.count(F.lit(1)).alias("total_tokens_received"))
    )
    return (
        base.join(recv, "wallet", "left")
        .select(
            "wallet",
            "first_seen_time",
            "last_seen_time",
            "total_transactions",
            "total_tokens_sent",
            F.coalesce("total_tokens_received", F.lit(0)).cast("long").alias("total_tokens_received"),
        )
    )


def dim_programs(events: DataFrame) -> DataFrame:
    """dim_programs (reference docs/SCHEMA.md:221-241): one row per
    program with first/last seen and a name only for programs with
    above-average activity."""
    agg = (
        events.filter(F.col("program_id").isNotNull())
        .groupBy("program_id")
        .agg(
            F.min("block_time").alias("first_seen_time"),
            F.max("block_time").alias("last_seen_time"),
            F.count(F.lit(1)).alias("event_count"),
        )
    )
    # the mean is an unpartitioned window over the ALREADY-REDUCED
    # per-program rows (bounded by distinct programs) -- not a second
    # aggregate subtree, which would re-scan and re-JSON-parse the log
    # (measured: 3 scans -> 2)
    from pyspark.sql import Window

    mean = F.avg("event_count").over(Window.partitionBy())
    named = F.col("event_count") >= mean
    return agg.select(
        "program_id",
        F.when(named, F.concat(F.lit("prog_"), F.col("program_id"))).alias("program_name"),
        F.when(named, F.lit("wellknown")).otherwise(F.lit("longtail")).alias("program_type"),
        "first_seen_time",
        "last_seen_time",
    )


def dim_tokens(events: DataFrame) -> DataFrame:
    """dim_tokens (reference docs/SCHEMA.md:243-262): one row per mint
    with deterministic symbol metadata and observed-activity measures
    standing in for supply (no chain registry in the test universe)."""
    return (
        events.filter(F.col("event_type") == "token_transfer")
        .groupBy("token_mint")
        .agg(
            F.count(F.lit(1)).alias("transfer_count"),
            F.countDistinct("from_wallet").alias("holder_estimate"),
            F.min("block_time").alias("first_seen_time"),
            F.max("block_time").alias("last_seen_time"),
        )
        .select(
            "token_mint",
            F.upper(F.regexp_replace("token_mint", "^mint_", "")).alias("token_symbol"),
            F.lit(9).alias("decimals"),
            "transfer_count",
            "holder_estimate",
            "first_seen_time",
            "last_seen_time",
        )
    )


def program_dim_rollup(events: DataFrame) -> DataFrame:
    """The documented consumption shape (docs/SCHEMA.md:362-370):
    fact LEFT JOIN dim_programs with COALESCE(program_name,
    program_id). The dim side is built from the same log here; in a
    warehouse it would be the persisted dim table.

    Plan: the aggregation is pushed BELOW the join (eager aggregation
    -- valid because the join key IS the group key and the dim is
    unique per key, so grouping the joined fact equals joining the
    grouped fact). The log is scanned and aggregated ONCE; the
    broadcast star join then runs over per-program rows on both
    sides. The naive join-then-group form scanned (and JSON-parsed)
    the log twice -- measured 2 scans -> 1."""
    fact = events.filter(F.col("program_id").isNotNull())
    agg = fact.groupBy("program_id").agg(F.count(F.lit(1)).alias("event_count"))
    # dim from the already-reduced per-program rows (same rows
    # dim_programs aggregates; the rollup drops first/last_seen)
    from pyspark.sql import Window

    mean = F.avg("event_count").over(Window.partitionBy())
    named = F.col("event_count") >= mean
    dim = agg.select(
        "program_id",
        F.when(named, F.concat(F.lit("prog_"), F.col("program_id"))).alias("program_name"),
        F.when(named, F.lit("wellknown")).otherwise(F.lit("longtail")).alias("program_type"),
    )
    return (
        agg.join(F.broadcast(dim), "program_id", "left")
        .select(
            "program_id",
            F.coalesce("program_name", F.col("program_id")).alias("display_name"),
            "program_type",
            "event_count",
        )
    )


def merge_dim_wallets(existing: DataFrame, delta_events: DataFrame) -> DataFrame:
    """Incremental dim maintenance: fold a DELTA of new events into an
    already-materialized dim_wallets without rescanning history --
    algebraically exact because every dim_wallets measure is a
    mergeable aggregate (min/max/sum).

    merge(dim(A), B) == dim(A UNION B) for disjoint event sets (pinned
    by test). Plan: aggregate the delta (one shuffle over NEW data
    only), full-outer join against the existing dim on wallet, and
    combine measures -- the cost scales with the delta plus the dim,
    never with event history. This is the 100 TB form of the
    reference's "updated via scheduled jobs" note (docs/SCHEMA.md:204):
    the scheduled job processes a day, not the lifetime log.
    """
    delta = dim_wallets(delta_events)
    e, d = existing.alias("e"), delta.alias("d")
    c = lambda side, name: F.col(f"{side}.{name}")  # noqa: E731

    def summed(name):
        return (F.coalesce(c("e", name), F.lit(0)) + F.coalesce(c("d", name), F.lit(0))).cast(
            "long"
        ).alias(name)

    return e.join(d, F.col("e.wallet") == F.col("d.wallet"), "full_outer").select(
        F.coalesce(c("e", "wallet"), c("d", "wallet")).alias("wallet"),
        F.least(c("e", "first_seen_time"), c("d", "first_seen_time")).alias("first_seen_time"),
        F.greatest(c("e", "last_seen_time"), c("d", "last_seen_time")).alias("last_seen_time"),
        summed("total_transactions"),
        summed("total_tokens_sent"),
        summed("total_tokens_received"),
    )
