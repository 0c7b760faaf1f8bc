"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the input has fewer partitions than
    the session's default parallelism.

    Compute-heavy per-row operators (shingling, hashing, scoring) must
    not inherit a single-split input: local test fixtures are one
    parquet row group, which would serialize the whole stage on one
    core. On a real cluster with many input splits this is a no-op --
    the guard avoids paying an unconditional shuffle at scale.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df.repartition(target)
    return df if current >= target else df.repartition(target)
