"""Custom stateful streaming operator via applyInPandasWithState.

Built-in stateful ops cover dedup (dropDuplicatesWithinWatermark) and
gap sessions (session_window); this module is the escape hatch pattern
for semantics they cannot express -- arbitrary per-key state updated
per micro-batch with Arrow-batched Python, the Structured Streaming
analog of the reference's incrementally-maintained per-entity
aggregates (dim_wallets' running totals, reference
docs/SCHEMA.md:196-218, which the reference documents but never
implements).

Scale shape: state is partitioned by key across the shuffle
(`groupBy(key)`), held in the state store keyed by the checkpoint;
each micro-batch touches only the keys present in the batch. The
Python hop is Arrow-batched -- one GroupState roundtrip per key per
batch, not per row.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = "n LONG, total DOUBLE"


def _update_running_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into (count, sum)
    state; emit the updated running totals once per batch."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (event count, value sum) maintained across
    micro-batches. Output mode: update (one row per touched user per
    batch)."""
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
