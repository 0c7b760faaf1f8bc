"""Telemetry event producer (reference src/events.rs:62-72).

The reference defines a TelemetryEvent subtype (API usage, feature
usage) flattened onto the canonical event base, but its block parser
never emits one -- the subtype exists only as a struct. This module is
the missing producer: it maps a generic API/feature usage log into
canonical events that flow through the SAME sinks, dedup, and
analytics as chain events (one log, many subtypes -- the reference's
single fact_transactions design, docs/SCHEMA.md).

event_id follows the reference's deterministic recipe
sha256("{slot}:{tx_signature}:{instruction_index}:{event_type}")
(src/events.rs:75-86) with the request id standing in for the tx
signature, so replays are idempotent through the warehouse anti-join
exactly like chain events.

Scale shape: pure projection -- pipelines with the source scan, zero
shuffles; the canonical projection (_finish) null-fills the chain-only
columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solana_data_etl_pipeline_spark.operators.parse import _event_id, _finish

TELEMETRY_EVENT_TYPE = "telemetry"


def telemetry_events(log: DataFrame, slot_col: str | None = None) -> DataFrame:
    """Canonical telemetry events from a usage-log frame with columns
    (ts timestamp, user_id, api_endpoint, feature_name, request_id,
    response_code, latency_ms [, slot]). Missing canonical columns are
    null-filled; `slot` defaults to 0 when the log has no chain
    anchor (telemetry is not block-derived)."""
    slot = F.col(slot_col).cast("long") if slot_col else F.lit(0).cast("long")
    base = log.select(
        slot.alias("slot"),
        F.col("ts").cast("timestamp").alias("block_time"),
        F.col("request_id").cast("string").alias("tx_signature"),
        F.lit(-1).alias("instruction_index"),
        F.lit(TELEMETRY_EVENT_TYPE).alias("event_type"),
        F.col("user_id").cast("string").alias("user_id"),
        F.col("api_endpoint").cast("string").alias("api_endpoint"),
        F.col("feature_name").cast("string").alias("feature_name"),
        F.col("request_id").cast("string").alias("request_id"),
        F.col("response_code").cast("int").alias("response_code"),
        F.col("latency_ms").cast("long").alias("latency_ms"),
        # success mirrors the HTTP outcome so failure-rate analytics
        # (A9/A10) work unchanged on telemetry slices
        (F.col("response_code") < 400).alias("success"),
        F.when(
            F.col("response_code") >= 400, F.concat(F.lit("HTTP_"), F.col("response_code").cast("string"))
        ).alias("error_message"),
    )
    event_id = _event_id(
        F.col("slot"), F.col("tx_signature"), F.col("instruction_index"), F.col("event_type")
    )
    return _finish(base.withColumn("event_id", event_id))
