"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the engine's escape hatch for semantics the built-in
windowed aggregations can't express: arbitrary per-key state evolved
across micro-batches in Arrow-batched Python. The example operator is
a running per-user activity profile (event count, value sum, last
seen) -- the canonical "user state" shape for feature stores.

State is per-key and lives in the state store under the query's
checkpoint; at 100 TB the keys must therefore be bounded (users, not
events) and the timeout (``GroupStateTimeout``) is what keeps
abandoned keys from accumulating forever.
"""

from __future__ import annotations

import sys
from typing import Any, Iterator, Tuple

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

# Ship function bodies by value (workers may not have this package on
# PYTHONPATH when the driver embeds us from an arbitrary cwd).
from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])


STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts_micros", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_event_type", StringType()),
    ]
)


def _update_profile(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into running state
    and emit the updated profile row."""
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    last_type = None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        if len(pdf):
            ordered = pdf.sort_values("ts")
            last_type = str(ordered["event_type"].iloc[-1])
            last_us = max(
                last_us, int(ordered["ts"].iloc[-1].value // 1_000)
            )
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_event_type": [last_type],
        }
    )


def user_activity_profile(events: DataFrame) -> DataFrame:
    """Streaming per-user running profile. ``events`` must be a
    streaming frame with (user_id, ts, event_type, value)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
