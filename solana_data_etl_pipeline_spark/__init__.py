"""PySpark-native analytics/ETL engine with the capabilities of
owizdom/Solana-Data-ETL-Pipeline, re-expressed Spark-first.

The reference (see /root/reference, surveyed in SURVEY.md) is a Rust
orchestrator around Postgres: JSON-RPC ingest -> canonical event log ->
13 SQL analytics queries. Here every operator is a declarative DataFrame
plan so Catalyst/Tungsten handle pushdown, pruning, codegen and AQE;
nothing is hand-scheduled and (for reference parity) nothing needs a
Python UDF.

Layout:
    session      SparkSession factory tuned for large-scale batch
    config       env-var configuration (reference src/config.rs parity)
    errors       error taxonomy (reference src/error.rs parity)
    schemas      typed schemas: block JSON, canonical events, analytics
    sources/     JSON-RPC client + block -> DataFrame readers
    operators/   parse/flatten (T-layer), dedup, similarity, text, multimodal
    plans/       analytics query plans (A-layer) + relational query suite
    sinks/       warehouse: dedup'd idempotent parquet sink + checkpoints
    streaming/   incremental micro-batch + structured streaming twins
"""

from solana_data_etl_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
