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

from pyspark.sql import Window

from solana_data_etl_pipeline_spark.operators.text import tokenize_corpus, training_shuffle


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


def export_token_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    vocab_size: int = 1000,
    budget: int = 2048,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
) -> None:
    """MODEL-READY token-id shards, end to end: numericalize
    (operators/text.py tokenize_corpus), assign every doc its seeded
    (shard, pos) under training_shuffle's permutation, pack the
    SHUFFLED per-shard id streams into fixed-`budget` sequences
    (cumulative offsets in pos order -- packing order equals the
    order a training job reads the shard, which is the property that
    makes the first_seq/last_seq boundaries real), and write
    `shard=N/` parquet with token_ids as array<int>. Same seed
    replays byte-order identical; a new seed is a fresh epoch
    permutation over the SAME vocabulary ids. Docs with zero tokens
    carry nothing to pack and are dropped; the resulting pos holes
    keep the shuffled order intact.

    Scale shape: one vocab agg + broadcast rank join (tokenize), one
    doc_id-keyed join of ids onto the permutation, then ONE hash
    exchange on shard that serves the position rank, the packing
    window, AND the partitioned write -- no other shuffle. Shard
    count is the parallelism knob (100k shards at 100 TB keeps each
    sort/file task-sized)."""
    t = tokenize_corpus(df, vocab_size=vocab_size, text_col=text_col)
    assigned = training_shuffle(df, n_shards=n_shards, seed=seed, id_col=id_col)
    j = t.join(assigned, id_col)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("pos").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tokens").over(w)
    out = (
        j.withColumn("start_offset", (cum - F.col("n_tokens")).cast("long"))
        .withColumn("first_seq", F.floor(F.col("start_offset") / budget).cast("long"))
        .withColumn(
            "last_seq",
            F.floor(
                (F.col("start_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
                / budget
            ).cast("long"),
        )
        .withColumn(
            "token_ids",
            F.transform(F.split("token_ids", " "), lambda x: x.cast("int")),
        )
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
    )
    out.write.mode(mode).partitionBy("shard").parquet(path)


def shard_manifest(spark, path: str, id_col: str = "doc_id") -> DataFrame:
    """Reproducibility manifest over an exported shard directory --
    the artifact a training job (or a re-export) checks instead of
    re-reading every byte: per shard, document count and an
    order-insensitive multiset digest of the (id, pos) assignment
    (sum of 32-bit md5(id|pos) values). Byte-identity of shard FILES
    follows from the digest plus the writer's pos-sort contract: the
    digest pins WHICH docs sit at WHICH positions, the writer pins
    the on-disk order. Same seed re-export => identical manifest;
    any drift names the exact shard.

    32-bit per-row terms keep the BIGINT sum exact and engine-exact
    (Spark sums longs modulo 2^64 silently, DuckDB promotes to
    HUGEINT -- both see the true sum only while it fits a long, which
    32-bit terms guarantee up to ~2^31 docs per shard; shards are
    task-sized by design, orders of magnitude below that).

    Scale shape: one scan of the shard tree, one map-side-combined
    groupBy on the partition column -- the scan prunes to nothing if
    a caller filters on shard."""
    rows = spark.read.parquet(path)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.col(id_col).cast("string"), F.col("pos").cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return rows.groupBy(F.col("shard").cast("long").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(h).cast("long").alias("id_digest"),
    )
