"""SparkSession factory.

Defaults are chosen for the 100 TB design point and scaled down by env
vars for local testing:

- AQE on (runtime coalesce, skew-join splitting) -- replaces the
  reference's static chunk sizing (reference src/backfill.rs:22-31).
- shuffle partitions sized from env (driver runs local[32]); on a real
  cluster this should be ~2-3x total cores and AQE coalesces down.
- broadcast threshold generous: every dim table in the star schema is
  tiny relative to the fact table, so dim joins must never shuffle.
- Arrow enabled for the few Pandas-UDF paths (extensions only).
- Session timezone pinned to UTC: the reference stores TIMESTAMPTZ and
  computes date arithmetic in UTC (reference src/parsers.rs:33-41).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "solana-etl-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle_partitions = os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        # Engine convention: all timestamps are UTC wall-clock, carried as
        # TIMESTAMP_NTZ end-to-end (parquet naive timestamps stay naive;
        # matches the DuckDB oracle's timestamp semantics exactly).
        .config("spark.sql.timestampType", "TIMESTAMP_NTZ")
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Coalesce post-shuffle partitions by BYTES (the advisory
        # size), not by core count: with the default parallelismFirst
        # the tiny shuffles of sub-GB stages stay fragmented across
        # 2x cores partitions and task overhead dominates -- measured
        # r14: dedup_minhash_lsh 2.30->1.84 s at 32 cores, 1.97->1.30 s
        # at 8 (the PERF_r13 anti-scaling class). Scale-adaptive by
        # construction: at 100 TB the same advisory target keeps
        # shuffles wide because the bytes are there (guide §2.2).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Some inputs carry TIMESTAMP(NANOS) parquet columns, which the
        # Spark reader rejects outright; read them as raw nano longs and
        # convert explicitly (see testdata_model.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffledHashJoinFactor", "3")
    )
    return builder.getOrCreate()
