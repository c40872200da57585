"""Incrementally-maintained equi-JOIN view (the join counterpart of
incremental_agg.py's materialized aggregate).

Classic delta-rule view maintenance for V = A join B over two
append-only sources:

    dV = dA join B_before  UNION ALL  A_after join dB

Each refresh drains the new files of A first (joining B's state as it
stood BEFORE this refresh's B deltas), then the new files of B
(joining A's state INCLUDING this refresh's A deltas) — together that
is exactly the new pairs, each produced once. Refresh cost tracks the
DELTA times the (keyed, pruned) other side, never |A| x |B|: at 100 TB
the accumulated sides live as key-partitioned tables and each delta
join is a hash equi-join against only the matching partitions, while a
full recompute would re-shuffle both corpora.

State layout under ``state_dir``: ``a_acc/``, ``b_acc`` (accumulated
projected sides), ``view/`` (the materialized join), each an
append-only parquet directory; per-source Structured Streaming commit
logs under ``checkpoints/`` guarantee every input file is drained
exactly once. Crash window: a failure between the view append and the
state append replays the batch (at-least-once within one refresh);
the same temp+swap upgrade documented in incremental_agg.py applies
when that window matters.

Parity contract (pinned by tests/test_ivm_join.py): after any number
of refreshes interleaved with appends on either side, ``view`` equals
the from-scratch ``A join B`` bit-exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _drain(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    handle,
) -> None:
    schema = spark.read.parquet(source_dir).schema
    query = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def maintain_join_view(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    state_dir: str,
    on: str,
    left_cols: list[str],
    right_cols: list[str],
) -> None:
    """Fold any not-yet-seen files of ``left_dir``/``right_dir`` into
    the materialized equi-join view at ``state_dir``. Call repeatedly
    as data lands. ``left_cols``/``right_cols`` are the projected
    payload columns (key ``on`` is carried automatically) — project
    narrow: accumulated state pays for every column forever."""
    a_acc = os.path.join(state_dir, "a_acc")
    b_acc = os.path.join(state_dir, "b_acc")
    view = os.path.join(state_dir, "view")

    def _append(df: DataFrame, path: str) -> None:
        df.write.mode("append").parquet(path)

    def _read(path: str) -> DataFrame | None:
        return spark.read.parquet(path) if os.path.exists(path) else None

    def on_left(batch: DataFrame, batch_id: int) -> None:
        delta = batch.select(on, *left_cols)
        b = _read(b_acc)
        if b is not None:
            _append(delta.join(b, on), view)
        _append(delta, a_acc)

    def on_right(batch: DataFrame, batch_id: int) -> None:
        delta = batch.select(on, *right_cols)
        a = _read(a_acc)
        if a is not None:
            _append(a.join(delta, on), view)
        _append(delta, b_acc)

    # Order matters for the delta rule: left deltas see B_before
    # (b_acc untouched so far this refresh), right deltas see A_after
    # (a_acc already extended above) — no pair is missed or doubled.
    _drain(spark, left_dir, os.path.join(state_dir, "checkpoints", "a"),
           on_left)
    _drain(spark, right_dir, os.path.join(state_dir, "checkpoints", "b"),
           on_right)


def read_join_view(spark: SparkSession, state_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(state_dir, "view"))
