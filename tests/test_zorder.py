"""Z-order clustering: Morton-key correctness vs a Python model and
the locality property the layout exists for -- per-file min/max spans
on EVERY clustered column shrink vs the unclustered write, which is
exactly what parquet stats pruning consumes."""

import glob

from pyspark.sql import functions as F

from solana_data_etl_pipeline_spark.sinks.zorder import write_zordered, zvalue


def _py_morton(vals, bits):
    out = 0
    nd = len(vals)
    for d, v in enumerate(vals):
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * nd + d)
    return out


def test_zvalue_matches_python_morton(spark):
    rows = [(a, b) for a in range(8) for b in range(8)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn("z", zvalue([F.col("a"), F.col("b")], bits=3)).collect()
    }
    for (a, b), z in got.items():
        assert z == _py_morton([a, b], 3), (a, b)


def test_zvalue_rejects_sign_bit_overflow(spark):
    # 4 dims x 16 bits = 64 interleaved bits: the top bit would land in
    # the sign bit, making high Morton keys negative (they'd sort
    # first) -- must refuse instead of silently degrading the layout
    import pytest

    cols = [F.col(c) for c in "abcd"]
    with pytest.raises(ValueError, match="overflows"):
        zvalue(cols, bits=16)
    # 3 dims x 16 = 48 bits and 2 x 21 = 42 bits are fine
    zvalue(cols[:3], bits=16)
    zvalue(cols[:2], bits=21)


def test_zordered_write_improves_minmax_locality(spark, tmp_path):
    # a 64x64 grid: columns are independent, so a single-column sort
    # cannot localize both; z-order must shrink per-file spans on BOTH
    rows = [(x, y, x * 64 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long, payload long")

    plain = str(tmp_path / "plain")
    df.repartition(8).write.mode("overwrite").parquet(plain)
    zpath = str(tmp_path / "zordered")
    write_zordered(df, zpath, ["x", "y"], bits=6, n_files=8)

    def mean_span(path, col):
        spans = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            mm = spark.read.parquet(f).agg(F.min(col), F.max(col)).collect()[0]
            spans.append(mm[1] - mm[0])
        return sum(spans) / len(spans)

    for col in ("x", "y"):
        assert mean_span(zpath, col) < mean_span(plain, col) * 0.7, col

    # clustering is a layout rewrite, never a data change
    got = spark.read.parquet(zpath)
    assert got.count() == 64 * 64
    assert got.agg(F.sum("payload")).collect()[0][0] == sum(r[2] for r in rows)
