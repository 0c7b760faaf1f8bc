"""Typed schemas for the engine.

The reference stores raw JSON opaquely (JSONB column, reference
src/warehouse.rs:172) and re-parses it with path operators at query
time. Spark-first design instead types the block JSON up front
(`BLOCK_SCHEMA`), which buys columnar pruning and predicate pushdown on
payload fields -- while the canonical event table still carries a
`raw_payload` JSON string column for schema-on-read parity
(`get_json_object` works on it exactly like Postgres `->`/`->>`).

Canonical event row shape: reference src/events.rs:8-17 and warehouse
DDL src/warehouse.rs:162-180; extension fields from the
TransactionEvent / ProgramEvent / TokenTransferEvent structs
(src/events.rs:20-59), stored flattened (serde(flatten) parity).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Token program ids used to classify instructions
# (reference src/parsers.rs:6-7).
TOKEN_PROGRAM_ID = "TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA"
TOKEN_2022_PROGRAM_ID = "TokenzQdBNbLqP5VEhdkAS6EPFLC1PHnBqCXEpPxuEb"
TOKEN_PROGRAM_IDS = [TOKEN_PROGRAM_ID, TOKEN_2022_PROGRAM_ID]


def _s(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


# --- getBlock (jsonParsed) shape consumed by the parse layer ----------------
# Mirrors the fields the reference parser actually touches
# (src/parsers.rs:10-203); everything else in the RPC response is dropped
# at scan time => column pruning instead of JSONB storage.

ACCOUNT_KEY_SCHEMA = T.StructType(
    [
        _s("pubkey", T.StringType()),
        _s("signer", T.BooleanType()),
        _s("writable", T.BooleanType()),
    ]
)

INSTRUCTION_SCHEMA = T.StructType(
    [
        _s("programId", T.StringType()),
        _s("data", T.StringType()),
        _s("accounts", T.ArrayType(T.StringType())),
        # jsonParsed encoding may replace data/accounts with a parsed
        # object; keep it as a JSON string for schema-on-read access.
        _s("parsed", T.StringType()),
    ]
)

UI_TOKEN_AMOUNT_SCHEMA = T.StructType(
    [
        _s("amount", T.StringType()),
        _s("decimals", T.IntegerType()),
        _s("uiAmountString", T.StringType()),
    ]
)

TOKEN_BALANCE_SCHEMA = T.StructType(
    [
        _s("accountIndex", T.IntegerType()),
        _s("mint", T.StringType()),
        _s("owner", T.StringType()),
        _s("uiTokenAmount", UI_TOKEN_AMOUNT_SCHEMA),
    ]
)

TX_META_SCHEMA = T.StructType(
    [
        # err is arbitrary JSON in the RPC response; JSON-string typed so
        # `err IS NULL` and `err.type` drill-downs both work
        # (reference src/parsers.rs:59-62, src/analytics.rs:502,538).
        _s("err", T.StringType()),
        _s("fee", T.LongType()),
        _s("preTokenBalances", T.ArrayType(TOKEN_BALANCE_SCHEMA)),
        _s("postTokenBalances", T.ArrayType(TOKEN_BALANCE_SCHEMA)),
        _s("logMessages", T.ArrayType(T.StringType())),
    ]
)

TX_MESSAGE_SCHEMA = T.StructType(
    [
        _s("accountKeys", T.ArrayType(ACCOUNT_KEY_SCHEMA)),
        _s("instructions", T.ArrayType(INSTRUCTION_SCHEMA)),
    ]
)

TRANSACTION_SCHEMA = T.StructType(
    [
        _s("signatures", T.ArrayType(T.StringType())),
        _s("message", TX_MESSAGE_SCHEMA),
    ]
)

TX_ENVELOPE_SCHEMA = T.StructType(
    [
        _s("transaction", TRANSACTION_SCHEMA),
        _s("meta", TX_META_SCHEMA),
    ]
)

BLOCK_SCHEMA = T.StructType(
    [
        _s("slot", T.LongType(), nullable=False),
        _s("blockTime", T.LongType()),
        _s("blockhash", T.StringType()),
        _s("parentSlot", T.LongType()),
        _s("transactions", T.ArrayType(TX_ENVELOPE_SCHEMA)),
    ]
)


# --- canonical event log ----------------------------------------------------
# Base columns: reference src/events.rs:8-17 / src/warehouse.rs:162-180.
# Extension columns: flattened subtype structs src/events.rs:20-59.

CANONICAL_EVENT_SCHEMA = T.StructType(
    [
        _s("event_id", T.StringType(), nullable=False),  # sha256 hex, src/events.rs:76-86
        _s("slot", T.LongType(), nullable=False),
        _s("block_time", T.TimestampType()),
        _s("tx_signature", T.StringType()),
        _s("program_id", T.StringType()),
        _s("instruction_index", T.IntegerType()),  # -1 = tx-level, src/parsers.rs:73
        _s("event_type", T.StringType()),
        # TransactionEvent extension (src/events.rs:20-33)
        _s("wallet", T.StringType()),
        _s("fee_payer", T.StringType()),
        _s("transaction_fee", T.LongType()),
        _s("success", T.BooleanType()),
        _s("error_message", T.StringType()),
        # ProgramEvent extension (src/events.rs:36-45)
        _s("instruction_type", T.StringType()),
        _s("accounts", T.ArrayType(T.StringType())),
        _s("data_hex", T.StringType()),
        _s("log_messages", T.ArrayType(T.StringType())),
        # TokenTransferEvent extension (src/events.rs:48-59)
        _s("token_mint", T.StringType()),
        _s("from_wallet", T.StringType()),
        _s("to_wallet", T.StringType()),
        _s("token_amount", T.StringType()),  # string for precision, src/events.rs:28
        _s("decimals", T.IntegerType()),
        # TelemetryEvent extension (src/events.rs:62-72; the reference
        # defines the subtype but its parser never emits it -- the
        # producer here is operators/telemetry.py)
        _s("user_id", T.StringType()),
        _s("api_endpoint", T.StringType()),
        _s("feature_name", T.StringType()),
        _s("request_id", T.StringType()),
        _s("response_code", T.IntegerType()),
        _s("latency_ms", T.LongType()),
        # schema-on-read payload (JSONB parity, src/warehouse.rs:172)
        _s("raw_payload", T.StringType()),
    ]
)

# Partition column added by the sink: event_date = to_date(block_time)
# (replaces the reference's slot index + documented BigQuery
# PARTITION BY DATE(block_time), docs/SCHEMA.md:76-77).
EVENT_DATE_COL = "event_date"
