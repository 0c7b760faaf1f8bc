"""Dead-letter quarantine: malformed ingest records land as
reference-etl_errors-shaped rows (docs/SCHEMA.md:307-319) while good
rows flow, in both the batch reader and the streaming ingest."""

import json
import os

from solana_data_etl_pipeline_spark.operators.parse import parse_blocks
from solana_data_etl_pipeline_spark.sinks.quarantine import ETL_ERROR_SCHEMA
from solana_data_etl_pipeline_spark.sources.blocks import (
    blocks_to_df,
    read_block_json_quarantined,
)
from solana_data_etl_pipeline_spark.sources.fixtures import make_block
from solana_data_etl_pipeline_spark.streaming.structured import run_block_stream_quarantined


def _land_mixed(path, name, good_slots, n_malformed=2, n_missing_slot=1):
    os.makedirs(path, exist_ok=True)
    lines = []
    for s in good_slots:
        b = make_block(s)
        if b is not None:
            lines.append(json.dumps(b))
    for i in range(n_malformed):
        lines.append(f'{{"slot": 99{i}, "broken json line #{i}')
    for i in range(n_missing_slot):
        lines.append(json.dumps({"blockhash": f"nohash{i}", "parentSlot": 1}))
    with open(os.path.join(path, name), "w") as f:
        f.write("\n".join(lines) + "\n")
    return len(lines)


def test_batch_reader_splits_good_and_quarantine(spark, tmp_path):
    inp = str(tmp_path / "in")
    _land_mixed(inp, "a.jsonl", range(1, 8), n_malformed=2, n_missing_slot=1)
    good, quarantine = read_block_json_quarantined(spark, inp)
    expected_good = blocks_to_df(spark, [make_block(s) for s in range(1, 8)])
    assert good.count() == expected_good.count()
    assert "_corrupt_record" not in good.columns
    q = quarantine.collect()
    assert len(q) == 3
    by_type = {}
    for r in q:
        by_type.setdefault(r.error_type, []).append(r)
    assert len(by_type["malformed_record"]) == 2
    assert len(by_type["missing_slot"]) == 1
    # raw payload preserved as evidence; deterministic replay-safe id
    assert all("broken json" in r.error_context for r in by_type["malformed_record"])
    assert all(r.error_id and len(r.error_id) == 64 for r in q)
    assert all(r.created_at is not None for r in q)
    # quarantine schema matches the reference etl_errors shape
    assert [f.name for f in quarantine.schema.fields] == [f.name for f in ETL_ERROR_SCHEMA.fields]
    # good side parses downstream unchanged
    assert parse_blocks(good).count() > 0


def test_batch_reader_clean_input_has_empty_quarantine(spark, tmp_path):
    inp = str(tmp_path / "in")
    _land_mixed(inp, "a.jsonl", range(1, 5), n_malformed=0, n_missing_slot=0)
    good, quarantine = read_block_json_quarantined(spark, inp)
    assert quarantine.count() == 0
    assert good.count() == blocks_to_df(spark, [make_block(s) for s in range(1, 5)]).count()


def test_stream_quarantines_and_flows_good_rows(spark, tmp_path):
    inp, out, qdir, ckpt = (str(tmp_path / d) for d in ("in", "out", "q", "ckpt"))
    _land_mixed(inp, "a.jsonl", range(1, 10), n_malformed=2, n_missing_slot=1)
    run_block_stream_quarantined(spark, inp, out, qdir, ckpt)
    events = spark.read.parquet(out)
    expected = parse_blocks(blocks_to_df(spark, [make_block(s) for s in range(1, 10)]))
    assert events.count() == expected.count()
    q = spark.read.parquet(qdir)
    assert q.count() == 3
    assert set(r.error_type for r in q.collect()) == {"malformed_record", "missing_slot"}
    # a second landing with only clean data adds no quarantine rows
    _land_mixed(inp, "b.jsonl", range(20, 23), n_malformed=0, n_missing_slot=0)
    run_block_stream_quarantined(spark, inp, out, qdir, ckpt)
    assert spark.read.parquet(qdir).count() == 3
    assert spark.read.parquet(out).count() == events.count() + parse_blocks(
        blocks_to_df(spark, [make_block(s) for s in range(20, 23)])
    ).count()
