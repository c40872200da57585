"""Streaming complex-event-processing: the stateful half of the
catalog's ``event_pattern_match`` entry.

The batch entry compiles its bounded-lookahead pattern (signup
followed by error within the next 3 events, no purchase between) to
lead() columns -- possible only because the whole log is present. On
an unbounded stream the lookahead spans micro-batch boundaries, so the
pattern runs as per-user state under ``applyInPandasWithState``:
each user's state is the list of pending signups (at most 3 can be
alive at once, because a pending signup expires after 3 subsequent
events -- state is O(1) per user by construction, not by hope).

Batch parity is exact and pinned by tests/test_streaming_cep.py: the
matcher replayed over time-split micro-batches emits precisely the
rows of the batch entry. At 100 TB the keys are users (bounded) and
production deployments add a ``GroupStateTimeout`` so abandoned users
eventually drop from the state store.
"""

from __future__ import annotations

import sys
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

# Pattern parameters -- MUST stay in lockstep with the batch entry
# (plans/ext.py event_pattern_match).
START = "signup"
TARGET = "error"
VETO = "purchase"
LOOKAHEAD = 3

STATE_SCHEMA = StructType(
    [
        StructField("sig_ids", ArrayType(LongType())),
        StructField("steps", ArrayType(LongType())),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("signup_event_id", LongType()),
        StructField("error_event_id", LongType()),
        StructField("steps_to_error", LongType()),
    ]
)


def _match_pattern(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Advance one user's pending-signup state through this
    micro-batch's events (sorted by ts, event_id) and emit matches."""
    if state.exists:
        sig_ids, steps = [list(x) for x in state.get]
    else:
        sig_ids, steps = [], []
    out: list[tuple[int, int, int, int]] = []
    # applyInPandasWithState may deliver one group's micro-batch as
    # SEVERAL pandas chunks with no cross-chunk ordering guarantee, so
    # the state machine must not advance per-chunk: concatenate the
    # whole micro-batch first, then sort ONCE by (ts, event_id).
    # Per-chunk sorting would replay events out of order for any group
    # large enough to split, silently breaking batch parity.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    pdf = (
        pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
    )
    if len(pdf):
        for row in pdf.sort_values(["ts", "event_id"]).itertuples():
            etype, eid = row.event_type, int(row.event_id)
            survivors_ids: list[int] = []
            survivors_steps: list[int] = []
            for sid, c in zip(sig_ids, steps):
                c += 1
                if etype == TARGET:
                    out.append((int(key[0]), sid, eid, c))
                elif etype == VETO:
                    pass  # vetoed: drop the pending signup
                elif c < LOOKAHEAD:
                    survivors_ids.append(sid)
                    survivors_steps.append(c)
            sig_ids, steps = survivors_ids, survivors_steps
            if etype == START:
                sig_ids.append(eid)
                steps.append(0)
    state.update((sig_ids, steps))
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "user_id", "signup_event_id", "error_event_id",
                "steps_to_error",
            ],
        )


def pattern_matches(events: DataFrame) -> DataFrame:
    """Streaming signup->error CEP matches. ``events`` must be a
    streaming frame with (user_id, ts, event_id, event_type)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _match_pattern,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
