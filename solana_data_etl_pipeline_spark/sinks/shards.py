"""Training-shard export: the final materialization step of the
corpus pipeline -- the curated corpus leaves Spark as deterministic,
shuffled shard files a training job streams directly.

Built on operators/text.py training_shuffle (seeded md5 permutation ->
(shard, pos)): the writer partitions by shard and sorts within each
partition by pos, so every shard FILE carries its documents in the
permuted order and a retried/re-run export is byte-order identical --
the property rand()-based shuffles cannot give and the reason the
permutation is hash-derived.

Scale shape: one hash exchange on shard (the same exchange the
position ranks already need) + a per-shard sort; `partitionBy` then
writes each shard directory from its own partition. With n_shards
sized so a shard fits a task (100k shards at 100 TB), sorts stay
small and export parallelism equals the shard count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solana_data_etl_pipeline_spark.operators.text import training_shuffle


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """Write `df` as `n_shards` shuffled shard directories under
    `path` (parquet, `shard=N/` layout), each file ordered by the
    seeded permutation position. Columns: every input column plus
    (shard, pos)."""
    assigned = training_shuffle(df, n_shards=n_shards, seed=seed, id_col=id_col)
    out = (
        df.join(assigned, id_col)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
    )
    out.write.mode(mode).partitionBy("shard").parquet(path)
