"""Dead-letter quarantine for corrupt ingest records.

The reference documents an ``etl_errors`` table (docs/SCHEMA.md:307-319)
but its parser only warns and continues (src/parsers.rs:22-26) -- the
malformed payload is gone. At 100 TB that is the wrong trade: a corrupt
record you dropped is a record you cannot re-process after the parser
fix ships. Here the PERMISSIVE reads carry Spark's
``columnNameOfCorruptRecord`` column, and every batch splits into

- **good** rows (parsed, required key present) that flow unchanged, and
- **quarantine** rows shaped like the reference's ``etl_errors``
  schema: deterministic ``error_id`` (sha256 of the raw payload -- the
  same replay-dedup contract as event_id), an ``error_type``
  discriminating malformed JSON from structurally-valid records missing
  the required key, and the raw line preserved in ``error_context``.

Scale notes: the split is two filters over ONE scan (cache the batch
when both sides are consumed, as the streaming path does); the
quarantine write is tiny in the happy path and bounded by input size in
the worst case. Deterministic error ids make at-least-once quarantine
appends dedupable downstream, exactly like fact events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Spark's corrupt-record column name (columnNameOfCorruptRecord).
CORRUPT_COL = "_corrupt_record"

#: Quarantine row shape -- reference etl_errors, docs/SCHEMA.md:307-319.
ETL_ERROR_SCHEMA = T.StructType(
    [
        T.StructField("error_id", T.StringType(), False),
        T.StructField("slot", T.LongType(), True),
        T.StructField("tx_signature", T.StringType(), True),
        T.StructField("error_type", T.StringType(), False),
        T.StructField("error_message", T.StringType(), False),
        T.StructField("error_context", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)


def with_corrupt_column(schema: T.StructType) -> T.StructType:
    """Read schema + the corrupt-record capture column."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)])


def split_corrupt(raw: DataFrame, required_col: str = "slot") -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) from a PERMISSIVE read carrying CORRUPT_COL.

    good: parsed rows with the required key, corrupt column dropped.
    quarantine: malformed lines (raw text in CORRUPT_COL) plus
    structurally-valid rows missing the required key, as ETL_ERROR rows.
    """
    data_cols = [c for c in raw.columns if c != CORRUPT_COL]
    good = raw.filter(
        F.col(CORRUPT_COL).isNull() & F.col(required_col).isNotNull()
    ).drop(CORRUPT_COL)
    bad = raw.filter(F.col(CORRUPT_COL).isNotNull() | F.col(required_col).isNull())
    malformed = F.col(CORRUPT_COL).isNotNull()
    # the raw line for malformed records; the re-serialized row for
    # structurally-valid-but-incomplete ones -- either way the payload
    # survives for re-processing
    context = F.coalesce(F.col(CORRUPT_COL), F.to_json(F.struct(*data_cols)))
    slot = (
        F.col(required_col).cast("long")
        if required_col == "slot" and "slot" in raw.columns
        else (F.col("slot").cast("long") if "slot" in raw.columns else F.lit(None).cast("long"))
    )
    quarantine = bad.select(
        F.sha2(context, 256).alias("error_id"),
        slot.alias("slot"),
        (
            F.col("tx_signature").cast("string")
            if "tx_signature" in raw.columns
            else F.lit(None).cast("string")
        ).alias("tx_signature"),
        F.when(malformed, F.lit("malformed_record"))
        .otherwise(F.lit(f"missing_{required_col}"))
        .alias("error_type"),
        F.when(malformed, F.lit("record failed schema parse"))
        .otherwise(F.lit(f"record missing required field '{required_col}'"))
        .alias("error_message"),
        context.alias("error_context"),
        F.current_timestamp().alias("created_at"),
    )
    return good, quarantine
