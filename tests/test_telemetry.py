"""Telemetry event subtype (reference src/events.rs:62-72): the
canonical projection, deterministic replay keys, and co-residence with
chain events in the same warehouse table."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from solana_data_etl_pipeline_spark.operators.parse import parse_blocks
from solana_data_etl_pipeline_spark.operators.telemetry import telemetry_events
from solana_data_etl_pipeline_spark.schemas import CANONICAL_EVENT_SCHEMA
from solana_data_etl_pipeline_spark.sinks.warehouse import ParquetWarehouse
from solana_data_etl_pipeline_spark.sources.blocks import blocks_to_df
from solana_data_etl_pipeline_spark.sources.fixtures import make_block

T0 = dt.datetime(2024, 3, 1, 9, 0, 0)


@pytest.fixture()
def usage_log(spark):
    rows = [
        (T0, "u1", "/api/blocks", "backfill", "req-1", 200, 12),
        (T0 + dt.timedelta(seconds=5), "u1", "/api/blocks", "backfill", "req-2", 200, 9),
        (T0 + dt.timedelta(seconds=9), "u2", "/api/tx", "lookup", "req-3", 404, 3),
    ]
    return spark.createDataFrame(
        rows,
        "ts timestamp, user_id string, api_endpoint string, feature_name string, "
        "request_id string, response_code int, latency_ms long",
    )


def test_telemetry_canonical_projection(usage_log):
    ev = telemetry_events(usage_log)
    assert ev.columns == [f.name for f in CANONICAL_EVENT_SCHEMA.fields]
    rows = {r.request_id: r for r in ev.collect()}
    assert rows["req-1"].event_type == "telemetry"
    assert rows["req-1"].success is True
    assert rows["req-1"].latency_ms == 12
    assert rows["req-3"].success is False
    assert rows["req-3"].error_message == "HTTP_404"
    # chain-only columns are null-filled
    assert rows["req-1"].program_id is None


def test_telemetry_event_ids_deterministic_and_unique(usage_log):
    a = sorted(r.event_id for r in telemetry_events(usage_log).collect())
    b = sorted(r.event_id for r in telemetry_events(usage_log).collect())
    assert a == b
    assert len(set(a)) == 3


def test_telemetry_coresides_with_chain_events(spark, tmp_path, usage_log):
    """One fact table, many subtypes (docs/SCHEMA.md design): chain and
    telemetry events share the warehouse and replay idempotently."""
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.connect()
    chain = parse_blocks(blocks_to_df(spark, [make_block(5)]))
    n_chain = wh.insert_events(chain)
    n_tel = wh.insert_events(telemetry_events(usage_log))
    assert n_tel == 3
    assert wh.insert_events(telemetry_events(usage_log)) == 0  # replay no-op
    stored = wh.read_events()
    assert stored.count() == n_chain + 3
    by_type = {r.event_type: r.cnt for r in stored.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()}
    assert by_type.get("telemetry") == 3


def test_telemetry_stream_end_to_end(spark, tmp_path):
    """Streaming ingest: JSONL usage logs -> canonical telemetry events
    -> exactly-once parquet; a second drain of the same files writes
    nothing new (source offsets + deterministic ids)."""
    import json as _json

    from solana_data_etl_pipeline_spark.streaming.structured import run_telemetry_stream

    src = tmp_path / "landing"
    src.mkdir()
    rows = [
        {"ts": "2024-03-01T09:00:00", "user_id": "u1", "api_endpoint": "/api/blocks",
         "feature_name": "backfill", "request_id": f"req-{i}", "response_code": 200,
         "latency_ms": 10 + i}
        for i in range(5)
    ]
    (src / "batch1.jsonl").write_text("\n".join(_json.dumps(r) for r in rows))
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_telemetry_stream(spark, str(src), out, ckpt)
    stored = spark.read.parquet(out)
    assert stored.count() == 5
    assert {r.event_type for r in stored.select("event_type").distinct().collect()} == {"telemetry"}
    # drain again with no new files: no duplicates
    run_telemetry_stream(spark, str(src), out, ckpt)
    assert spark.read.parquet(out).count() == 5
    # late-arriving new file is picked up incrementally
    (src / "batch2.jsonl").write_text(_json.dumps(
        {"ts": "2024-03-01T09:01:00", "user_id": "u2", "api_endpoint": "/api/tx",
         "feature_name": "lookup", "request_id": "req-99", "response_code": 500,
         "latency_ms": 3}
    ))
    run_telemetry_stream(spark, str(src), out, ckpt)
    final = spark.read.parquet(out)
    assert final.count() == 6
    assert final.filter(~final.success).count() == 1


def test_telemetry_error_rate_stream_matches_batch(spark, tmp_path):
    """The windowed streaming error-rate must agree with the same
    aggregation computed in batch over the drained landing zone."""
    import json as _json

    from solana_data_etl_pipeline_spark.operators.telemetry import telemetry_events
    from solana_data_etl_pipeline_spark.streaming.structured import (
        stream_telemetry,
        telemetry_error_rate_stream,
    )

    src = tmp_path / "landing"
    src.mkdir()
    rows = []
    for i in range(20):
        rows.append({"ts": f"2024-03-01T09:{i // 4:02d}:{(i % 4) * 10:02d}",
                     "user_id": f"u{i % 3}", "api_endpoint": "/api/blocks" if i % 2 else "/api/tx",
                     "feature_name": "f", "request_id": f"r{i}",
                     "response_code": 500 if i % 5 == 0 else 200, "latency_ms": i})
    (src / "a.jsonl").write_text("\n".join(_json.dumps(r) for r in rows))

    stream = telemetry_error_rate_stream(telemetry_events(stream_telemetry(spark, str(src))))
    q = (
        stream.writeStream.format("memory")
        .queryName("tel_err")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (str(r.window_start), r.api_endpoint): (r.requests, r.errors, r.error_rate_pct)
        for r in spark.sql("SELECT * FROM tel_err").collect()
    }
    batch = telemetry_error_rate_stream(
        telemetry_events(spark.read.schema(
            "ts timestamp, user_id string, api_endpoint string, feature_name string, "
            "request_id string, response_code int, latency_ms long").json(str(src))
        ).withColumn("block_time", F.col("block_time"))
    )
    want = {
        (str(r.window_start), r.api_endpoint): (r.requests, r.errors, r.error_rate_pct)
        for r in batch.collect()
    }
    assert got == want and len(got) > 0
