"""Dimension-table builders (reference docs/SCHEMA.md:196-262):
semantics on a hand-built canonical log, and the star-join shape of
the documented fact->dim consumption query."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from solana_data_etl_pipeline_spark.plans import dimensions as DIM

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


@pytest.fixture()
def log(spark):
    rows = [
        # (block_time, event_type, program_id, wallet, token_mint, from_wallet, to_wallet)
        (T0, "transaction", "p1", "w1", None, None, None),
        (T0 + dt.timedelta(hours=1), "transaction", "p1", "w1", None, None, None),
        (T0 + dt.timedelta(hours=2), "token_transfer", "p1", "w1", "mint_a", "w1", "w2"),
        (T0, "transaction", "p2", "w2", None, None, None),
        (T0 + dt.timedelta(days=1), "token_transfer", "p2", "w2", "mint_a", "w2", "w1"),
        (T0, "program_instruction", "p3", "w3", None, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "block_time timestamp, event_type string, program_id string, "
        "wallet string, token_mint string, from_wallet string, to_wallet string",
    )


def test_dim_wallets_aggregates(log):
    got = {r.wallet: r for r in DIM.dim_wallets(log).collect()}
    assert set(got) == {"w1", "w2", "w3"}
    w1 = got["w1"]
    assert w1.total_transactions == 2
    assert w1.total_tokens_sent == 1
    assert w1.total_tokens_received == 1  # from w2's transfer
    assert w1.first_seen_time == T0
    assert w1.last_seen_time == T0 + dt.timedelta(hours=2)
    assert got["w3"].total_transactions == 0
    assert got["w3"].total_tokens_received == 0


def test_dim_programs_mean_relative_naming(log):
    got = {r.program_id: r for r in DIM.dim_programs(log).collect()}
    # p1 has 3 events, p2 has 2, p3 has 1 -> mean 2: p1 and p2 named
    assert got["p1"].program_name == "prog_p1"
    assert got["p1"].program_type == "wellknown"
    assert got["p2"].program_type == "wellknown"
    assert got["p3"].program_name is None
    assert got["p3"].program_type == "longtail"


def test_dim_tokens(log):
    got = {r.token_mint: r for r in DIM.dim_tokens(log).collect()}
    assert set(got) == {"mint_a"}
    t = got["mint_a"]
    assert t.token_symbol == "A"
    assert t.decimals == 9
    assert t.transfer_count == 2
    assert t.holder_estimate == 2


def test_program_dim_rollup_coalesce_and_broadcast(log):
    out = DIM.program_dim_rollup(log)
    got = {r.program_id: r for r in out.collect()}
    assert got["p1"].display_name == "prog_p1"
    assert got["p3"].display_name == "p3"  # unnamed long tail falls back to id
    assert got["p1"].event_count == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # star join must broadcast the dim
    assert "CartesianProduct" not in plan


def test_dim_wallets_conservation(log):
    """Per-wallet aggregates must conserve the log's totals: summed
    transactions equal the transaction event count, summed sent equal
    summed received equal the transfer count (every transfer has one
    sender and one receiver)."""
    dim = DIM.dim_wallets(log).collect()
    n_tx = log.filter(log.event_type == "transaction").count()
    n_tt = log.filter(log.event_type == "token_transfer").count()
    assert sum(r.total_transactions for r in dim) == n_tx
    assert sum(r.total_tokens_sent for r in dim) == n_tt
    # receivers in the fixture are themselves acting wallets
    assert sum(r.total_tokens_received for r in dim) == n_tt


def test_merge_dim_wallets_equals_full_recompute(spark, log):
    """Algebraic exactness of incremental maintenance:
    merge(dim(A), B) == dim(A union B). Splits the fixture log by
    time so the delta contains both known and brand-new wallets."""
    cutoff = T0 + dt.timedelta(minutes=90)
    a = log.filter(F.col("block_time") <= cutoff)
    b = log.filter(F.col("block_time") > cutoff)
    assert a.count() > 0 and b.count() > 0
    merged = {r.wallet: r for r in DIM.merge_dim_wallets(DIM.dim_wallets(a), b).collect()}
    full = {r.wallet: r for r in DIM.dim_wallets(log).collect()}
    assert set(merged) == set(full)
    for w in full:
        for col in ("first_seen_time", "last_seen_time", "total_transactions",
                    "total_tokens_sent", "total_tokens_received"):
            assert getattr(merged[w], col) == getattr(full[w], col), (w, col)
    # merging an EMPTY delta is the identity
    empty = log.limit(0)
    ident = {r.wallet: r.total_transactions for r in DIM.merge_dim_wallets(DIM.dim_wallets(log), empty).collect()}
    assert ident == {w: full[w].total_transactions for w in full}
