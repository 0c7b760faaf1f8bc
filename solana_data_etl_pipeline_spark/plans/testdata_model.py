"""Projection of the driver's synthetic tables into the engine's models.

The driver testdata (`/root/testdata/sf*/`) has a generic event stream
`events(event_id, ts, user_id, event_type, value, props)` instead of
Solana blocks. To exercise the *same* analytics plans the reference
runs on `fact_transactions`, we project it into the normalized event
model of plans/analytics.py with a deterministic mapping:

    purchase|error -> 'transaction'   (error rows are failed txs)
    click          -> 'program_instruction'
    view           -> 'token_transfer'
    program_id     = props->>'k'      (JSON drill-down parity with the
                                       reference's raw_payload access,
                                       reference src/analytics.rs:367)
    wallet         = user_id
    token_mint     = 'mint_' || props->>'k'
    err_type       = 'E' || user_id%7 (NULL 1-in-5 to exercise COALESCE)

`NORM_SQL` is the exact same mapping in ANSI SQL (DuckDB), used as a
CTE by every analytics oracle so the Spark plan and the oracle see
identical inputs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# Plan/value caches keyed by (session id, sf_dir[, table]). DataFrames
# are reusable lazy plans; re-reading per query re-lists files and
# re-fetches footers, and the as_of scalar costs one collect job per
# analytics query without this. Keyed on id(spark) so a fresh driver
# session (new JVM) never sees another session's plans.
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}
_AS_OF_CACHE: dict[tuple[int, str], "dt.datetime"] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) parquet read as raw nanos via
        # spark.sql.legacy.parquet.nanosAsLong; truncate to micros (what
        # DuckDB's nanos->micros cast does too) and restore NTZ type.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"))
    _TABLE_CACHE[key] = df
    return df


def normalized_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        F.col("ts").alias("block_time"),
        F.when(F.col("event_type").isin("purchase", "error"), F.lit("transaction"))
        .when(F.col("event_type") == "click", F.lit("program_instruction"))
        .when(F.col("event_type") == "view", F.lit("token_transfer"))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        k.alias("program_id"),
        F.col("user_id").cast("string").alias("wallet"),
        F.concat(F.lit("mint_"), k).alias("token_mint"),
        F.col("user_id").cast("string").alias("from_wallet"),
        F.concat(F.lit("w"), (F.col("user_id") % 10).cast("string")).alias("to_wallet"),
        (F.col("event_type") == "error").alias("failed"),
        F.when(
            (F.col("event_type") == "error") & (F.col("user_id") % 5 != 0),
            F.concat(F.lit("E"), (F.col("user_id") % 7).cast("string")),
        ).alias("err_type"),
    )


NORM_SQL = """
norm AS (
  SELECT
    ts AS block_time,
    CASE WHEN event_type IN ('purchase', 'error') THEN 'transaction'
         WHEN event_type = 'click' THEN 'program_instruction'
         WHEN event_type = 'view' THEN 'token_transfer'
         ELSE event_type END AS event_type,
    json_extract_string(props, '$.k') AS program_id,
    CAST(user_id AS VARCHAR) AS wallet,
    'mint_' || json_extract_string(props, '$.k') AS token_mint,
    CAST(user_id AS VARCHAR) AS from_wallet,
    'w' || CAST(user_id % 10 AS VARCHAR) AS to_wallet,
    event_type = 'error' AS failed,
    CASE WHEN event_type = 'error' AND user_id % 5 <> 0
         THEN 'E' || CAST(user_id % 7 AS VARCHAR) END AS err_type
  FROM events
),
tmax AS (SELECT max(ts) AS t FROM events)
"""


def as_of(spark: SparkSession, sf_dir: str) -> dt.datetime:
    """Deterministic 'now': max event time in the dataset (the SQL
    oracles use the matching scalar subquery ``(SELECT max(ts) ...)``).
    Memoized per (session, sf_dir) -- the value is a dataset constant."""
    key = (id(spark), sf_dir)
    if key not in _AS_OF_CACHE:
        _AS_OF_CACHE[key] = load_table(spark, sf_dir, "events").agg(F.max("ts")).first()[0]
    return _AS_OF_CACHE[key]
