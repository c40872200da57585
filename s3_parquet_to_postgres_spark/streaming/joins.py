"""Stream-stream joins and streaming deduplication.

Both are state-store operators: the watermark is what bounds state.
A stream-stream join buffers rows of each side until the watermark
says no matching row can still arrive; streaming dedup keeps one key
per watermark window. Without the time bound either would grow state
forever -- the watermark IS the 100 TB design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "1 hour",
    max_lag: str = "30 minutes",
) -> DataFrame:
    """Join two event streams on a key where the right event happened
    within [left_ts - max_lag, left_ts].

    Classic enrichment shape (click -> purchase attribution). Both
    sides carry watermarks and the join condition bounds the time gap
    in BOTH directions, so Spark can evict buffered rows; an unbounded
    condition would be rejected for append-mode streams.
    """
    lw = left.withColumn("__lts", F.col(left_ts).cast("timestamp")) \
             .withWatermark("__lts", watermark)
    rw = right.withColumn("__rts", F.col(right_ts).cast("timestamp")) \
              .withWatermark("__rts", watermark)
    cond = (
        (lw[on] == rw[on])
        & (rw["__rts"] <= lw["__lts"])
        & (rw["__rts"] >= lw["__lts"] - F.expr(f"INTERVAL {max_lag}"))
    )
    return lw.join(rw, cond).drop(rw[on]).drop("__lts", "__rts")


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static join: enrich an event stream with a (slowly
    changing) dimension table -- the third leg of the join ladder
    next to stream-stream (state-store) and batch-batch.

    Stateless by construction: Spark re-plans the static side every
    micro-batch, so no watermark and no state store are involved, and
    dimension updates written between triggers are picked up at the
    next one. ``broadcast=True`` pins the dim to a broadcast hash
    join (the right call for every dimension that fits an executor);
    a static side too big to broadcast turns every micro-batch into a
    shuffle join -- pre-bucket both sides instead at that scale.
    """
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, on, how)


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival per key among rows whose event times fall
    within the watermark of each other (dropDuplicatesWithinWatermark).

    The streaming half of the dedup ladder (operators/dedup.py handles
    batch): state per key is dropped once the watermark passes, so
    memory is bounded by keys-per-watermark-window, not total keys.
    """
    w = events.withColumn("__ts", F.col(ts_col).cast("timestamp")) \
              .withWatermark("__ts", watermark)
    return w.dropDuplicatesWithinWatermark(key_cols).drop("__ts")
