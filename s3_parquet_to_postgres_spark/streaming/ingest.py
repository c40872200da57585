"""Incremental, resumable parquet ingestion on Structured Streaming.

This is the Spark-native replacement for the reference's todo/wip/
completed work-list drain (reference: src/work_lists.rs, src/runner.rs:83-109):

* batching (``download_batch_size``)  -> ``maxFilesPerTrigger``
* todo/wip/completed checkpoint files -> the file-source commit log
  under ``checkpointLocation`` (exactly-once per *file*, which is
  strictly stronger than the reference's at-least-once + dedup)
* the drain loop                      -> ``Trigger.AvailableNow``:
  process everything present, in bounded increments, then stop
* crash resume                        -> restart with the same
  checkpoint dir; already-committed files are never re-read

At 100 TB the file listing itself is the scale risk; production runs
point ``source_dir`` at a day/hour partition and rely on
``maxFilesPerTrigger`` to bound per-micro-batch work, keeping state
(the commit log) O(files), not O(rows).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


@dataclass(frozen=True)
class IngestResult:
    batches: int
    rows: int


def incremental_parquet_load(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    max_files_per_trigger: int | None = 4,
    schema: StructType | None = None,
) -> IngestResult:
    """Drain all parquet files currently in ``source_dir`` into
    ``output_dir`` (parquet), ``max_files_per_trigger`` files per
    micro-batch, resuming from ``checkpoint_dir``.

    Returns (micro-batches run, rows written this run). Calling again
    after new files land processes ONLY the new files -- the commit
    log under the checkpoint remembers the rest.
    """
    if schema is None:
        # Streaming file sources need an explicit schema; infer once
        # from the current contents (footer-only read, cheap).
        schema = spark.read.parquet(source_dir).schema

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(source_dir)
    if transform is not None:
        df = transform(df)

    query = (
        df.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    batches = 0
    rows = 0
    for progress in query.recentProgress:
        n = progress["numInputRows"]
        if n:
            batches += 1
            rows += n
    return IngestResult(batches=batches, rows=rows)


def foreach_batch_load(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    sink_fn: Callable[[DataFrame, int], None],
    max_files_per_trigger: int | None = 4,
    schema: StructType | None = None,
) -> None:
    """Same drain, but each micro-batch is handed to ``sink_fn(df,
    batch_id)`` -- the hook where a JDBC/COPY destination plugs in
    (sinks/). ``batch_id`` is stable across retries, so a sink that
    records it gets idempotent writes (the Spark analogue of the
    reference's completed-log dedup, reference: src/work_lists.rs:83-108).
    """
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    query = (
        reader.parquet(source_dir)
        .writeStream.foreachBatch(sink_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
