"""Composed training-corpus selection: the end-to-end document
filtering pipeline an LLM-data run actually executes, as ONE
declarative plan -- quality gates, language ID, exact-dedup keepers,
and consistent hash sampling composed so Catalyst fuses the per-doc
scoring into a single scan pass.

Scale shape: three narrow per-doc scoring branches share the scan; the
only shuffle is the dedup-keeper aggregation (uniform md5 keys); the
sample is a pure filter. Selection criteria are deliberately simple
constants so the oracle mirrors them verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_data_etl_pipeline_spark.operators import dedup as D
from solana_data_etl_pipeline_spark.operators import text as X
from solana_data_etl_pipeline_spark.plans.testdata_model import load_table

MIN_TOKENS = 10
MIN_ALPHA_RATIO = 0.5
SAMPLE_PCT = 50


def corpus_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selected training documents: quality-gated, language-labeled,
    exact-dedup-kept, consistently sampled."""
    docs = load_table(spark, sf_dir, "documents")
    quality = X.quality_scores(docs).select("doc_id", "n_tokens", "alpha_ratio")
    lang = X.language_id(docs).select("doc_id", "predicted_lang")
    keepers = D.exact_duplicates(docs).select(F.col("keep_doc_id").alias("doc_id"))
    selected = (
        docs.select("doc_id", "source")
        .join(quality, "doc_id")
        .join(lang, "doc_id")
        .join(keepers, "doc_id")  # semi-join shape: keepers has unique doc_id
        .filter((F.col("n_tokens") >= MIN_TOKENS) & (F.col("alpha_ratio") >= MIN_ALPHA_RATIO))
    )
    return X.consistent_sample(selected, pct=SAMPLE_PCT).select(
        "doc_id", "source", "predicted_lang", "n_tokens"
    )
