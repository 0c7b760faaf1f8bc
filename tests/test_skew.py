"""Salted aggregation must be result-identical to the direct
aggregation, including under heavy key skew."""

import pytest

from pyspark.sql import functions as F

from solana_data_etl_pipeline_spark.operators.skew import (
    salted_agg,
    salted_count,
    salted_count_distinct,
    with_salt,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a uniform tail
    hot = spark.range(0, 900).select(
        F.lit("hot").alias("k"), (F.col("id") % 37).alias("v")
    )
    tail = spark.range(0, 100).select(
        F.concat(F.lit("k"), (F.col("id") % 10).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionByName(tail)


def test_with_salt_is_deterministic_and_bounded(skewed):
    a = with_salt(skewed, 8).select("_salt").collect()
    b = with_salt(skewed, 8).select("_salt").collect()
    assert [r._salt for r in a] == [r._salt for r in b]
    assert all(0 <= r._salt < 8 for r in a)
    # the hot key actually spreads across salts
    n = with_salt(skewed.filter(F.col("k") == "hot"), 8).select("_salt").distinct().count()
    assert n > 1


def test_salted_count_matches_direct(skewed):
    direct = {r.k: r["count"] for r in skewed.groupBy("k").count().collect()}
    salted = {r.k: r.cnt for r in salted_count(skewed, ["k"], salt=8).collect()}
    assert salted == direct


def test_salted_agg_matches_direct(skewed):
    direct = {
        r.k: (r.total, r.mx)
        for r in skewed.groupBy("k").agg(F.sum("v").alias("total"), F.max("v").alias("mx")).collect()
    }
    salted = {
        r.k: (r.total, r.mx)
        for r in salted_agg(
            skewed,
            ["k"],
            {"total": (F.sum("v"), F.sum("_p_total")), "mx": (F.max("v"), F.max("_p_mx"))},
            salt=8,
        ).collect()
    }
    assert salted == direct


def test_salted_count_distinct_matches_direct(skewed):
    direct = {
        r.k: r.nd for r in skewed.groupBy("k").agg(F.countDistinct("v").alias("nd")).collect()
    }
    salted = {r.k: r.n_distinct for r in salted_count_distinct(skewed, ["k"], "v", salt=8).collect()}
    assert salted == direct
