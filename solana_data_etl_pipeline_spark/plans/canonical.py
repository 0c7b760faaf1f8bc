"""Canonical event log -> normalized event model + analytics runner.

This is the reference-parity query path: the same plans in
plans/analytics.py run over events produced by operators/parse.py,
with JSON drill-downs into raw_payload exactly where the reference
reads its JSONB column (reference src/analytics.rs:367,:414,:502,:538).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solana_data_etl_pipeline_spark.plans import analytics as A


def normalize_canonical(events: DataFrame) -> DataFrame:
    """Project canonical events into the normalized model consumed by
    plans/analytics.py.

    wallet comes from the typed column (populated from accountKeys[0]
    at parse time) with a raw_payload JSON fallback -- the reference
    always digs `raw_payload->'transaction'->'message'->'accountKeys'->>0`
    (src/analytics.rs:367); keeping the fallback preserves
    schema-on-read parity for events ingested by other writers."""
    wallet_fallback = F.get_json_object("raw_payload", "$.transaction.message.accountKeys[0].pubkey")
    return events.select(
        F.col("block_time"),
        F.col("event_type"),
        F.col("program_id"),
        F.coalesce(F.col("wallet"), wallet_fallback).alias("wallet"),
        F.col("token_mint"),
        F.coalesce(F.col("from_wallet"), F.col("wallet")).alias("from_wallet"),
        F.col("to_wallet"),
        (~F.coalesce(F.col("success"), F.lit(True))).alias("failed"),
        F.get_json_object("error_message", "$.type").alias("err_type"),
    )


def run_analytics(events: DataFrame, as_of: dt.datetime, output_path: str | None = None) -> dict[str, DataFrame]:
    """A1-A14: compute every analytics table from the fact log.

    Reference behavior: drop-and-recreate + sequential recompute of all
    analytics_* tables (src/analytics.rs:22-27,220-241). Here the fact
    DataFrame is cached once and all plans share the scan; with
    `output_path` each result overwrites `analytics_<name>` parquet
    (DELETE + re-INSERT == mode('overwrite'), A14)."""
    from solana_data_etl_pipeline_spark.plans import dimensions as DIM

    norm = normalize_canonical(events).persist()
    try:
        results = {name: plan(norm, as_of) for name, plan in A.ALL_PLANS.items()}
        # dimension tables ride the same scheduled recompute (the
        # reference maintains them "via materialized views or
        # scheduled jobs", docs/SCHEMA.md:204): dim_* overwrite
        # alongside the analytics_* tables, sharing the cached scan
        results.update(
            {
                "dim_wallets": DIM.dim_wallets(norm),
                "dim_programs": DIM.dim_programs(norm),
                "dim_tokens": DIM.dim_tokens(norm),
            }
        )
        if output_path:
            for name, df in results.items():
                prefix = "" if name.startswith("dim_") else "analytics_"
                df.write.mode("overwrite").parquet(f"{output_path}/{prefix}{name}")
        else:
            for df in results.values():
                df.count()  # materialize while the shared scan is cached
        return results
    finally:
        norm.unpersist()
