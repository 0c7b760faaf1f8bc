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
