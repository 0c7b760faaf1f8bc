"""Structured Streaming twin of the ingest + analytics pipeline.

The reference's `incremental` loop is a hand-rolled micro-batch stream
(offset = slot, trigger = sleep, checkpoint = etl_metadata row,
reference src/incremental.rs:10-104). This module is the native
upgrade (SURVEY.md section 7 phase 4): the SAME parse plan
(operators/parse.py is scan -> explode -> projection -> union, fully
streaming-compatible) driven by `readStream`, with

- bounded-state dedup: `dropDuplicatesWithinWatermark(event_id)` --
  the streaming equivalent of the sink's anti-join idempotency; state
  is evicted once the watermark passes, so it holds hours of keys,
  not the table's lifetime;
- event-time windowed aggregation: the A5 hourly-volume query
  (reference src/analytics.rs:329-340) as a live tumbling window with
  late-data tolerance -- semantics the reference cannot express (its
  A5 recomputes over the warehouse);
- exactly-once file sink: parquet + checkpointLocation; replayed
  micro-batches after crash/restart are deduplicated by the sink's
  transaction log.

Scale notes: the stream shuffles once per stateful operator (dedup
keys, window keys), partitioned by `spark.sql.shuffle.partitions`;
state lives in the embedded store keyed by the checkpoint, so restarts
resume with bounded catch-up. A file landing zone is used as the
source here (driver-testable, cloud-object-store-shaped); a message
bus source slots into `stream_blocks` without touching anything
downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_data_etl_pipeline_spark.operators.parse import parse_blocks
from solana_data_etl_pipeline_spark.schemas import BLOCK_SCHEMA

DEFAULT_WATERMARK = "1 hour"


def stream_blocks(spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming block source: JSONL block dumps landing in a
    directory, typed with BLOCK_SCHEMA (PERMISSIVE: malformed lines ->
    NULL slot, filtered -- the reference's warn-and-continue)."""
    reader = spark.readStream.schema(BLOCK_SCHEMA).option("mode", "PERMISSIVE")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(input_dir).filter(F.col("slot").isNotNull())


def stream_events(blocks: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Blocks -> canonical events with bounded-state streaming dedup on
    the deterministic event_id (at-least-once upstream delivery becomes
    exactly-once-effect, the reference's ON CONFLICT semantics)."""
    events = parse_blocks(blocks)
    return events.withWatermark("block_time", watermark).dropDuplicatesWithinWatermark(["event_id"])


def hourly_volume_stream(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """A5 as a live event-time tumbling window: transactions per hour,
    late rows folded in until the watermark passes (then the window
    finalizes and its state is dropped)."""
    return (
        events.filter(F.col("event_type") == "transaction")
        .withWatermark("block_time", watermark)
        .groupBy(F.window("block_time", "1 hour").alias("w"))
        .agg(F.count("*").alias("tx_count"))
        .select(F.col("w.start").alias("hour_start"), "tx_count")
    )


def transfer_attribution_stream(
    events: DataFrame,
    watermark: str = DEFAULT_WATERMARK,
    tolerance: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join: each token-transfer event enriched
    with its parent transaction's outcome, matched on tx_signature
    within an event-time tolerance. Both sides carry a watermark AND
    the join condition bounds the event-time distance, so each side's
    buffered state is evicted as the watermark advances -- the state
    held is O(events within watermark+tolerance), never the stream's
    history. Works identically on a batch DataFrame (withWatermark is
    a no-op there), which is what the parity test exploits."""
    tx = (
        events.filter(F.col("event_type") == "transaction")
        .select(
            F.col("tx_signature").alias("tx_sig"),
            F.col("block_time").alias("tx_time"),
            "success",
            F.col("wallet").alias("fee_wallet"),
        )
        .withWatermark("tx_time", watermark)
    )
    tr = (
        events.filter(F.col("event_type") == "token_transfer")
        .select(
            "event_id",
            "tx_signature",
            F.col("block_time").alias("transfer_time"),
            "token_mint",
            "token_amount",
        )
        .withWatermark("transfer_time", watermark)
    )
    cond = (
        (tr.tx_signature == tx.tx_sig)
        & (F.col("transfer_time") >= F.expr(f"tx_time - INTERVAL {tolerance}"))
        & (F.col("transfer_time") <= F.expr(f"tx_time + INTERVAL {tolerance}"))
    )
    return tr.join(tx, cond, "inner").select(
        "event_id", "tx_signature", "transfer_time", "token_mint", "token_amount",
        "success", "fee_wallet",
    )


def run_block_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = DEFAULT_WATERMARK,
    available_now: bool = True,
):
    """End-to-end ingest stream: landing zone -> parse -> dedup ->
    date-partitioned parquet with exactly-once checkpointing.

    `available_now=True` drains everything currently in the source and
    stops (bounded run: tests, catch-up jobs); False runs continuously
    (the reference's `incremental` loop, minus the sleep hand-rolling).
    Returns the StreamingQuery; with available_now the query is awaited
    and already terminated.
    """
    events = stream_events(stream_blocks(spark, input_dir), watermark)
    events = events.withColumn("event_date", F.to_date("block_time"))
    writer = (
        events.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("event_date")
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def run_block_stream_quarantined(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Ingest stream with a dead-letter side: malformed landing-zone
    lines (and structurally-valid records missing their slot) land as
    reference-etl_errors-shaped rows in `quarantine_dir` instead of
    being silently dropped, while good blocks parse into
    date-partitioned canonical events exactly as run_block_stream.

    foreachBatch splits each micro-batch over ONE cached scan. The
    quarantine append is at-least-once under micro-batch replay; its
    deterministic error_id (sha256 of the raw payload) makes the
    replays dedupable downstream -- the same contract fact events get
    from event_id.
    """
    from solana_data_etl_pipeline_spark.sinks.quarantine import (
        CORRUPT_COL,
        split_corrupt,
        with_corrupt_column,
    )

    raw = (
        spark.readStream.schema(with_corrupt_column(BLOCK_SCHEMA))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(input_dir)
    )

    def _sink(batch_df, batch_id):
        batch_df.persist()
        try:
            good, quarantine = split_corrupt(batch_df, "slot")
            events = parse_blocks(good).withColumn("event_date", F.to_date("block_time"))
            events.write.mode("append").partitionBy("event_date").parquet(output_dir)
            if quarantine.limit(1).count():
                quarantine.write.mode("append").parquet(quarantine_dir)
        finally:
            batch_df.unpersist()

    writer = (
        raw.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


TELEMETRY_LOG_SCHEMA = (
    "ts timestamp, user_id string, api_endpoint string, feature_name string, "
    "request_id string, response_code int, latency_ms long"
)


def stream_telemetry(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming telemetry source: JSONL usage-log records landing in a
    directory (API gateway / feature flags export shape)."""
    return (
        spark.readStream.schema(TELEMETRY_LOG_SCHEMA)
        .option("mode", "PERMISSIVE")
        .json(input_dir)
        .filter(F.col("request_id").isNotNull())
    )


def run_telemetry_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = DEFAULT_WATERMARK,
    available_now: bool = True,
):
    """Telemetry ingest stream: usage logs -> canonical telemetry
    events (operators/telemetry.py, same deterministic replay keys) ->
    bounded-state dedup -> date-partitioned parquet with exactly-once
    checkpointing. Telemetry lands in the SAME canonical-log layout as
    chain events (one fact table, many subtypes), so every downstream
    analytics/dedup plan applies unchanged."""
    from solana_data_etl_pipeline_spark.operators.telemetry import telemetry_events

    events = telemetry_events(stream_telemetry(spark, input_dir))
    events = events.withWatermark("block_time", watermark).dropDuplicatesWithinWatermark(["event_id"])
    events = events.withColumn("event_date", F.to_date("block_time"))
    writer = (
        events.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("event_date")
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def telemetry_error_rate_stream(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Live per-endpoint error rate over tumbling 5-minute windows
    (the A9 failure-rate analytic re-expressed for the telemetry
    subtype as a stream): requests, errors, and error percentage per
    (window, api_endpoint); late rows fold in until the watermark
    passes. State is one row per open (window, endpoint) -- bounded by
    endpoint cardinality, not traffic."""
    return (
        events.filter(F.col("event_type") == "telemetry")
        .withWatermark("block_time", watermark)
        .groupBy(F.window("block_time", "5 minutes").alias("w"), F.col("api_endpoint"))
        .agg(
            F.count(F.lit(1)).alias("requests"),
            F.sum(F.when(~F.col("success"), 1).otherwise(0)).cast("long").alias("errors"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "api_endpoint",
            "requests",
            "errors",
            F.round(F.col("errors") * 100.0 / F.col("requests"), 4).alias("error_rate_pct"),
        )
    )


def run_stream_to_warehouse(
    spark: SparkSession,
    input_dir: str,
    warehouse,
    checkpoint_dir: str,
    watermark: str = DEFAULT_WATERMARK,
    available_now: bool = True,
):
    """Ingest stream into ANY `Warehouse` sink (parquet or JDBC) via
    foreachBatch + the sink's idempotent insert_events.

    Two idempotency layers compose: Structured Streaming's checkpoint
    replays a failed micro-batch AT LEAST once, and the sink's
    anti-join on deterministic event ids turns that replay into a
    no-op -- exactly-once EFFECT into sinks with no transactional
    stream support (the JDBC warehouse especially; the reference's
    incremental loop gets the same guarantee from ON CONFLICT,
    src/incremental.rs + src/warehouse.rs:227-229).

    Watermarked streaming dedup is deliberately NOT used here: the
    sink's anti-join already covers arbitrary-lag replays, and keeping
    the stream stateless means the checkpoint holds only source
    offsets.
    """
    blocks = stream_blocks(spark, input_dir)
    events = parse_blocks(blocks)

    def _sink(batch_df, batch_id):
        warehouse.insert_events(batch_df)

    writer = (
        events.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
