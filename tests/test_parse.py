"""T-layer tests: block JSON -> canonical events.

Expectations are computed independently from the fixture dicts, so the
Spark plan is checked against a second implementation of the same
semantics (reference src/parsers.rs behavior)."""

import pytest

from solana_data_etl_pipeline_spark.operators.parse import extract_wallets, parse_blocks
from solana_data_etl_pipeline_spark.schemas import TOKEN_PROGRAM_ID, TOKEN_PROGRAM_IDS
from solana_data_etl_pipeline_spark.sources.blocks import blocks_to_df
from solana_data_etl_pipeline_spark.sources.fixtures import make_block

SLOTS = [1, 2, 3, 5, 18]


@pytest.fixture(scope="module")
def events(spark):
    blocks = [make_block(s) for s in SLOTS]
    df = parse_blocks(blocks_to_df(spark, blocks))
    rows = df.collect()
    return blocks, rows


def _expected_counts(blocks):
    tx = ins = xfer = 0
    for b in blocks:
        if b is None:
            continue
        for t in b["transactions"]:
            tx += 1
            ins += len(t["transaction"]["message"]["instructions"])
            xfer += sum(1 for p in t["meta"]["postTokenBalances"] if p.get("mint"))
    return tx, ins, xfer


def test_event_counts_match_flatmap_semantics(events):
    blocks, rows = events
    tx, ins, xfer = _expected_counts(blocks)
    by_type = {}
    for r in rows:
        by_type[r.event_type] = by_type.get(r.event_type, 0) + 1
    assert by_type.get("transaction", 0) == tx
    assert by_type.get("program_instruction", 0) + by_type.get("token_instruction", 0) == ins
    assert by_type.get("token_transfer", 0) == xfer


def test_transaction_events_have_index_minus_one(events):
    _, rows = events
    for r in rows:
        if r.event_type == "transaction":
            assert r.instruction_index == -1
            assert r.wallet is not None  # accountKeys[0]
            assert r.fee_payer == r.wallet


def test_instruction_classification(events):
    blocks, rows = events
    for r in rows:
        if r.event_type == "token_instruction":
            assert r.program_id in TOKEN_PROGRAM_IDS
        if r.event_type == "program_instruction":
            assert r.program_id not in TOKEN_PROGRAM_IDS
        if r.event_type == "token_transfer":
            assert r.program_id == TOKEN_PROGRAM_ID  # forced, src/parsers.rs:193
            assert r.token_mint is not None


def test_event_id_is_deterministic_sha256(events):
    import hashlib

    _, rows = events
    for r in rows[:50]:
        expected = hashlib.sha256(
            f"{r.slot}:{r.tx_signature}:{r.instruction_index}:{r.event_type}".encode()
        ).hexdigest()
        assert r.event_id == expected


def test_event_ids_unique(events):
    _, rows = events
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids))


def test_reparse_is_identical(spark, events):
    blocks, rows = events
    again = parse_blocks(blocks_to_df(spark, blocks)).collect()
    assert sorted(r.event_id for r in again) == sorted(r.event_id for r in rows)


def test_success_flag_follows_meta_err(events):
    blocks, rows = events
    failed_sigs = {
        t["transaction"]["signatures"][0]
        for b in blocks
        if b
        for t in b["transactions"]
        if t["meta"]["err"] is not None
    }
    for r in rows:
        if r.event_type == "transaction":
            assert r.success == (r.tx_signature not in failed_sigs)


def test_skipped_slots_dropped(spark):
    df = parse_blocks(blocks_to_df(spark, [make_block(17), make_block(19)]))  # 17 is skipped
    slots = {r.slot for r in df.select("slot").distinct().collect()}
    assert slots == {19}


def test_extract_wallets_struct_form(spark):
    blocks = [make_block(1)]
    wallets = extract_wallets(blocks_to_df(spark, blocks)).collect()
    expected = {
        k["pubkey"]
        for t in blocks[0]["transactions"]
        for k in t["transaction"]["message"]["accountKeys"]
    }
    assert {w.wallet for w in wallets} == expected
