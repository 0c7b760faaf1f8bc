"""Bucketed co-located joins: the fact-fact join must run with NO
Exchange when both sides are bucketed on the join key, and results
must match the plain shuffled join."""

import pytest

from pyspark.sql import functions as F

from solana_data_etl_pipeline_spark.sinks.bucketing import read_bucketed, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders, "b_orders", "o_orderkey", 8, path=str(base / "orders"))
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8, path=str(base / "li")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _joined(spark):
    o = read_bucketed(spark, "b_orders")
    l = read_bucketed(spark, "b_lineitem")
    return (
        o.join(l, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


def test_bucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _joined(spark)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the join itself runs on co-located buckets: no Exchange feeds it.
    # (the final small aggregate may still exchange on its group key)
    join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan


def test_bucketed_join_matches_plain_join(bucketed):
    spark = bucketed
    got = {r.o_orderpriority: (r.n, r.qty) for r in _joined(spark).collect()}
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plain = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )
    expected = {r.o_orderpriority: (r.n, r.qty) for r in plain.collect()}
    assert got == expected
