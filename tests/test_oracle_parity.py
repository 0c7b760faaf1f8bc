"""Full-registry oracle parity at sf0.001: every query in
plans.suite.all_queries() -- INCLUDING entries not exposed through the
curated 50-slot driver registry (__spark_entry__.queries()) -- is
checked against its DuckDB oracle twin on row count, column names, and
order-insensitive value multiset. This is what keeps the trimmed
relational/text/temporal queries and the deliberately-unregistered
quadratic baselines (dedup_ngram_jaccard, knn_bruteforce) verified
after the driver surface was capped at 50 entries."""

import importlib.util
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
SF = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location("selfcheck", ROOT / "tools" / "selfcheck.py")
selfcheck = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(selfcheck)


def test_driver_registry_is_within_budget_and_consistent():
    from solana_data_etl_pipeline_spark.plans.suite import (
        DRIVER_ORDER,
        all_oracle_sql,
        all_queries,
        driver_queries,
    )

    assert len(DRIVER_ORDER) == len(set(DRIVER_ORDER)) == 50  # driver budget
    assert set(driver_queries()) <= set(all_queries())
    # every registered query has an oracle except the documented
    # rows-only sketch rollup
    assert set(all_queries()) - set(all_oracle_sql()) == {"sketch_rollup"}


def test_full_registry_matches_oracle(spark):
    from __spark_entry__ import _configure
    from solana_data_etl_pipeline_spark.plans.suite import all_oracle_sql, all_queries

    _configure(spark)
    con = selfcheck.oracle_connection(SF)
    lines = []
    failures = selfcheck.check_queries(
        spark, con, all_queries(), all_oracle_sql(), SF, log=lines.append
    )
    assert failures == [], "\n".join(lines)
