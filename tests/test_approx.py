"""The approximate-aggregate opt-in path (SCALE.md): exact distinct is
kept for oracle parity; approx_count_distinct is the documented escape
hatch when the exact-distinct expand+shuffle dominates at scale. This
pins its accuracy envelope on the testdata so the trade is a measured
one."""

from pyspark.sql import functions as F

from solana_data_etl_pipeline_spark.plans.testdata_model import load_table, normalized_events

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_5pct_of_exact(spark):
    ev = normalized_events(spark, SF).filter(F.col("event_type") == "transaction")
    row = ev.agg(
        F.countDistinct("wallet").alias("exact"),
        F.approx_count_distinct("wallet", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_approx_percentile_brackets_exact(spark):
    orders = load_table(spark, SF, "orders")
    row = orders.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.02
