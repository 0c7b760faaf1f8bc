"""Bucketed table layout: co-located fact-fact joins without a
shuffle.

At 100 TB the orders<->lineitem-shaped joins are the dominant
exchanges. Writing both facts bucketed (and sorted) by the join key
pre-partitions them identically on disk, so the join needs NO
Exchange on either side -- the sort-merge join reads co-located
buckets directly. This is the persistent analog of repartitioning
both sides once and reusing the partitioning forever.

Bucket pruning also applies: an equality predicate on the bucket
column scans 1/num_buckets of the files.

Caveats (honest limits): bucketed tables go through the session
catalog (`saveAsTable`); bucket counts must match (or divide evenly
with spark.sql.bucketing.coalesceBucketsInJoin.enabled) for the
shuffle elision; and writes must keep one file per bucket per task
(sortBy + a single writer stage) to avoid small-file blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` bucketed+sorted by `bucket_col` as a catalog table
    (parquet). Joins/aggregations keyed on `bucket_col` between tables
    with matching bucket counts run with no Exchange."""
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, bucket_col).sortBy(bucket_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table with its bucketing metadata attached (the
    plain parquet path reader would lose it)."""
    return spark.table(table)
