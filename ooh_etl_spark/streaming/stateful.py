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


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas: the successor API — typed state
# handles (ValueState/ListState/MapState), per-key timers, TTL.
# ---------------------------------------------------------------------------
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle  # noqa: E402

TWS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("max_value", DoubleType()),
    ]
)


class RunningMaxProcessor(StatefulProcessor):
    """Per-user running (count, max value) via a typed ValueState handle.

    The transformWithState model splits state DECLARATION (handle
    creation in init, with optional TTL) from per-batch mutation —
    unlike applyInPandasWithState's single opaque tuple — so the state
    store can evict/checkpoint each named state independently."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "agg", StructType([StructField("n", LongType()), StructField("mx", DoubleType())])
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, mx = self._state.get() if self._state.exists() else (0, float("-inf"))
        for pdf in rows:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        self._state.update((n, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [round(mx, 2)]}
        )

    def close(self) -> None:
        pass


def running_user_max(events_stream: DataFrame) -> DataFrame:
    """events stream → per-user running (count, max) via the Spark 4
    transformWithStateInPandas API (update mode)."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        RunningMaxProcessor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
