"""Compaction must reduce file count to the size-derived target,
preserve every row, cluster within files when asked, and never lose
the original on a replayed run."""

import os

from pyspark.sql import functions as F

from solana_data_etl_pipeline_spark.sinks.compaction import (
    compact_parquet,
    plan_target_files,
)


def _parquet_files(path):
    return [
        os.path.join(root, f)
        for root, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]


def _fragmented(spark, path, parts=40, rows=4000):
    df = spark.range(0, rows).select(
        F.col("id"), (F.col("id") % 17).alias("k"), F.md5(F.col("id").cast("string")).alias("v")
    )
    df.repartition(parts).write.mode("overwrite").parquet(path)
    return df


def test_plan_target_files():
    assert plan_target_files(0, 128) == 1
    assert plan_target_files(129, 128) == 2
    assert plan_target_files(1000, 100) == 10


def test_compaction_preserves_rows_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = _fragmented(spark, path)
    expected = sorted(r.id for r in df.collect())
    assert len(_parquet_files(path)) == 40

    total = sum(os.path.getsize(f) for f in _parquet_files(path))
    stats = compact_parquet(spark, path, target_file_bytes=total // 3 + 1)
    assert stats["after_files"] <= 4
    assert stats["after_files"] == stats["target_files"]
    got = sorted(r.id for r in spark.read.parquet(path).collect())
    assert got == expected


def test_compaction_clusters_by_sort_key(spark, tmp_path):
    path = str(tmp_path / "frag2")
    _fragmented(spark, path)
    compact_parquet(spark, path, target_file_bytes=1 << 40, sort_by=["k"])
    files = _parquet_files(path)
    assert len(files) == 1
    ks = [r.k for r in spark.read.parquet(files[0]).collect()]
    assert ks == sorted(ks)  # clustered within the file


def test_compaction_idempotent_rerun(spark, tmp_path):
    path = str(tmp_path / "frag3")
    df = _fragmented(spark, path)
    expected = df.count()
    compact_parquet(spark, path, target_file_bytes=1 << 40)
    stats = compact_parquet(spark, path, target_file_bytes=1 << 40)
    assert stats["after_files"] == 1
    assert spark.read.parquet(path).count() == expected
