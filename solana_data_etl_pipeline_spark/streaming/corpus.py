"""Streaming training-corpus assembly: the documents landing zone
ingested as a Structured Streaming job with the same gates the batch
corpus pipeline applies -- corrupt-line quarantine, fused per-doc
feature scoring, quality gates, PII flagging, and EXACT content dedup
with exactly-once effect across micro-batches and restarts.

This is the streaming twin of plans/corpus.py: a crawler drops JSONL
shards into the landing zone continuously; the corpus table only ever
receives gated, deduplicated, feature-annotated documents.

Scale shape per micro-batch: one cached scan feeds the good/quarantine
split and the three per-doc feature branches (doc_features is the
fused single-pass scorer); batch-internal dedup is a window over
fingerprint; CROSS-batch dedup is an anti-join against the fingerprint
column of the already-written corpus -- at 100 TB that read is served
by a fingerprint-bucketed index table maintained beside the corpus
(same pattern as the warehouse sink's partition-pruned anti-join,
sinks/warehouse.py), never a full corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from solana_data_etl_pipeline_spark.operators import text as X
from solana_data_etl_pipeline_spark.plans.corpus import MIN_ALPHA_RATIO, MIN_TOKENS

#: JSONL landing-zone shape for documents (ingest_time is the event
#: time stamped by the crawler/uploader). Explicitly TIMESTAMP_NTZ so
#: the parse behaves identically under any session timestampType --
#: under NTZ a zoned literal fails to parse, which in PERMISSIVE mode
#: silently corrupts the WHOLE row into quarantine.
DOC_LANDING_SCHEMA = (
    "doc_id long, text string, lang string, source string, ingest_time timestamp_ntz"
)


def document_features_batch(good: DataFrame) -> DataFrame:
    """Gated, deduplicated (batch-internal), feature-annotated corpus
    rows from one micro-batch of parsed landing-zone documents. Pure
    batch logic so tests and backfills reuse it identically."""
    feats = X.doc_features(good).select(
        "doc_id", "n_tokens", "alpha_ratio", "predicted_lang", "fingerprint"
    )
    pii = X.pii_scan(good).select("doc_id", "has_pii")
    annotated = (
        good.select("doc_id", "text", "lang", "source", "ingest_time")
        .join(feats, "doc_id")
        .join(pii, "doc_id")
        .filter((F.col("n_tokens") >= MIN_TOKENS) & (F.col("alpha_ratio") >= MIN_ALPHA_RATIO))
    )
    # batch-internal exact dedup: first doc_id wins per content hash
    w = Window.partitionBy("fingerprint").orderBy(F.col("doc_id").asc())
    return (
        annotated.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def run_document_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Landing zone -> quarantine split -> gates + features -> exact
    dedup -> language-partitioned corpus parquet.

    Exactly-once effect: the stream checkpoint prevents re-reading
    drained files, and the cross-batch fingerprint anti-join makes
    replayed or re-crawled content a no-op -- the same two-layer
    contract as run_stream_to_warehouse. Malformed lines and rows
    missing doc_id land as etl_errors-shaped quarantine rows instead
    of vanishing; the quarantine append is guarded by the same
    anti-join pattern on the deterministic sha256 error_id, so a batch
    replayed after a mid-batch crash does not duplicate error rows
    either.
    """
    from solana_data_etl_pipeline_spark.sinks.quarantine import (
        CORRUPT_COL,
        split_corrupt,
        with_corrupt_column,
    )
    from pyspark.sql.types import StructType

    schema = with_corrupt_column(StructType.fromDDL(DOC_LANDING_SCHEMA))
    raw = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(input_dir)
    )

    def _sink(batch_df, batch_id):
        batch_df.persist()
        try:
            good, quarantine = split_corrupt(batch_df, required_col="doc_id")
            kept = document_features_batch(good)
            # cross-batch dedup: drop content already in the corpus
            try:
                seen = spark.read.parquet(output_dir).select("fingerprint").distinct()
                kept = kept.join(seen, "fingerprint", "left_anti")
            except AnalysisException:
                pass  # first batch: corpus does not exist yet
            kept.select(
                "doc_id",
                "text",
                "lang",
                "source",
                "ingest_time",
                "n_tokens",
                "alpha_ratio",
                "predicted_lang",
                "fingerprint",
                "has_pii",
            ).write.mode("append").partitionBy("predicted_lang").parquet(output_dir)
            # replay guard: the corpus side is protected by the
            # fingerprint anti-join above; give quarantine the same
            # treatment on its deterministic error_id so a batch that
            # failed between this append and the checkpoint commit
            # doesn't re-append the same error rows on retry
            try:
                seen_err = spark.read.parquet(quarantine_dir).select("error_id").distinct()
                quarantine = quarantine.join(seen_err, "error_id", "left_anti")
            except AnalysisException:
                pass  # first batch: quarantine does not exist yet
            if quarantine.limit(1).count():
                quarantine.write.mode("append").parquet(quarantine_dir)
        finally:
            batch_df.unpersist()

    writer = (
        raw.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
