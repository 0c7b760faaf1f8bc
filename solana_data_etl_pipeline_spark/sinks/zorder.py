"""Z-order (Morton-curve) clustering for multi-column data skipping.

Parquet scans prune row groups and files with min/max statistics, but
stats only help when the file layout correlates with the filter
columns. Sorting by one column gives perfect skipping on that column
and none on any other; interleaving the BITS of several columns into
one Morton key and range-partitioning + sorting on it gives useful
min/max locality on ALL of them at once -- the standard lakehouse
OPTIMIZE ZORDER BY layout, built here from plain DataFrame operations.

Scale shape: one bounded stats pass (global min/max per clustered
column -- a two-row driver collect), one pure projection computing the
key (bit arithmetic in codegen'd expressions), one range shuffle, and
a within-partition sort that feeds the writer. Rewriting N TB costs
one shuffle of N TB -- the same cost profile as any clustering rewrite;
run it at the compaction cadence (sinks/compaction.py), not per batch.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension in the interleaved key; at 16 bits per dimension
#: up to 3 dimensions (48 interleaved bits) fit a 63-bit signed long
DEFAULT_BITS = 16


def _bucketize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Scale a numeric column to an integer bucket in [0, 2^bits)."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    frac = (col.cast("double") - lo) / span
    scaled = F.floor(frac * F.lit((1 << bits) - 1))
    return F.greatest(F.lit(0), F.least(scaled, F.lit((1 << bits) - 1))).cast("long")


def _bucketize_str(col: Column, bits: int) -> Column:
    """Hash a string column to a bucket in [0, 2^bits). Hashing has no
    ordering, but min/max file stats on the ORIGINAL string column
    still become selective: equal values share a bucket, so each
    output file holds few distinct strings -- which is exactly what
    equality-filter data skipping needs on a categorical column."""
    return F.pmod(F.hash(col), F.lit(1 << bits)).cast("long")


def zvalue(buckets: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton key: interleave the low `bits` bits of each bucket column
    (dimension d contributes bit i at output position i*ndims + d).
    Pure integer arithmetic -- whole-stage codegen, no UDFs.

    The interleaved key must stay inside the 63 value bits of a signed
    long: a bit placed at position >= 63 lands in the sign bit, turning
    high keys negative so they'd sort BEFORE low keys and silently
    ruin the clustering. Refuse rather than degrade."""
    ndims = len(buckets)
    if ndims * bits > 63:
        raise ValueError(
            f"zvalue: {ndims} dims x {bits} bits = {ndims * bits} interleaved "
            "bits overflows a 63-bit signed long; lower `bits` or cluster on "
            "fewer columns"
        )
    terms = [
        F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * ndims + d)
        for d, b in enumerate(buckets)
        for i in range(bits)
    ]
    return reduce(lambda a, c: a.bitwiseOR(c), terms).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    n_files: int = 8,
) -> None:
    """Cluster `df` on the Morton key of `cols` and write parquet:
    global min/max per column (ONE bounded stats aggregation), bucket +
    interleave, range-partition into `n_files` z-runs, sort within each
    so parquet row-group stats are tight, drop the key, write.

    String columns are hash-bucketed (no range semantics, but equal
    values cluster into the same files, which is what equality-filter
    stats pruning consumes); numeric columns are min/max range-scaled."""
    str_cols = {f.name for f in df.schema.fields if f.dataType.typeName() == "string"}
    num_cols = [c for c in cols if c not in str_cols]
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_lo_{c}") for c in num_cols],
        *[F.max(c).cast("double").alias(f"_hi_{c}") for c in num_cols],
        F.count(F.lit(1)).alias("_n"),
    ).collect()[0]
    if stats["_n"] == 0 or any(stats[f"_lo_{c}"] is None for c in num_cols):
        # empty input (or an all-null cluster column): nothing to
        # cluster, write as-is rather than crash on float(None)
        df.write.mode("overwrite").parquet(path)
        return
    buckets = [
        _bucketize_str(F.col(c), bits)
        if c in str_cols
        else _bucketize(
            F.col(c), F.lit(float(stats[f"_lo_{c}"])), F.lit(float(stats[f"_hi_{c}"])), bits
        )
        for c in cols
    ]
    keyed = df.withColumn("_z", zvalue(buckets, bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_rewrite(
    spark,
    path: str,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite an existing parquet directory Z-ordered on `cols`, with
    the output file count sized from the directory's current bytes
    (folding compaction into the clustering rewrite -- one shuffle
    does both jobs; a round-robin compaction AFTER z-ordering would
    destroy the clustering it just paid for). Same swap protocol as
    sinks/compaction.py: write to a sibling temp dir, then swap_dir --
    NOT atomic (two renames; see compaction.recover_swap, run on
    entry, for the crash-window repair) but never loses committed
    data. Returns a summary dict."""
    import os
    import uuid

    from solana_data_etl_pipeline_spark.sinks.compaction import (
        _dir_bytes,
        plan_target_files,
        recover_swap,
        swap_dir,
    )

    recover_swap(path)
    before_bytes = _dir_bytes(path)
    before_files = sum(
        1 for _r, _d, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    n = plan_target_files(before_bytes, target_file_bytes)
    tmp = f"{path.rstrip('/')}._zorder_{uuid.uuid4().hex[:8]}"
    write_zordered(spark.read.parquet(path), tmp, cols, bits=bits, n_files=n)
    swap_dir(path, tmp)
    after_files = sum(
        1 for _r, _d, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    return {
        "before_files": before_files,
        "after_files": after_files,
        "before_bytes": before_bytes,
        "after_bytes": _dir_bytes(path),
        "target_files": n,
        "zorder_cols": list(cols),
    }
