"""Incrementally-maintained aggregate (a materialized view over an
append-only dataset).

The reference loads files incrementally but every analytical question
re-reads everything; this maintains a running aggregate instead: each
micro-batch's partial aggregate is merged into a persisted state
table, so refresh cost tracks NEW data, not total data. Works for any
algebraic aggregate (sum/count/min/max decompose into mergeable
partials; avg = sum/count at read time) -- and for DISTINCT counts,
which are not algebraic, via mergeable HLL sketches
(``distinct_cols``): the state row stores the sketch binary,
``hll_union_agg`` folds new partials in (register-wise max, so
merge-then-estimate equals estimate-over-everything exactly), and the
estimate is materialized at read time. Sketch state is O(groups), not
O(distinct values) -- the only way a 100 TB running distinct stays
cheap.

State is a small parquet table rewritten per batch via temp + atomic
swap -- at state sizes where that rewrite dominates, swap the state
store for a keyed sink (the foreachBatch hook stays identical).
Exactly-once: the file-source commit log guarantees each input file
contributes once; the swap makes each merge all-or-nothing.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def maintain_running_agg(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    checkpoint_dir: str,
    group_cols: list[str],
    sum_cols: list[str],
    max_files_per_trigger: int | None = 4,
    distinct_cols: list[str] | None = None,
) -> None:
    """Drain new files from ``source_dir`` and fold them into the
    running (group_cols, count, sum(sum_cols), hll(distinct_cols))
    aggregate at ``state_path``. Call repeatedly as data lands; each
    call only reads files not yet committed. Read estimates back with
    ``read_running_agg``."""
    distinct_cols = distinct_cols or []
    aggs = (
        [F.count(F.lit(1)).cast("long").alias("rows")]
        + [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
        + [F.hll_sketch_agg(c).alias(f"hll_{c}") for c in distinct_cols]
    )
    merge_aggs = (
        [F.sum("rows").cast("long").alias("rows")]
        + [F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols]
        + [F.hll_union_agg(f"hll_{c}").alias(f"hll_{c}")
           for c in distinct_cols]
    )

    def merge(batch: DataFrame, batch_id: int) -> None:
        partial = batch.groupBy(*group_cols).agg(*aggs)
        if os.path.exists(state_path):
            old = spark.read.parquet(state_path)
            merged = (
                old.unionByName(partial)
                .groupBy(*group_cols)
                .agg(*merge_aggs)
            )
        else:
            merged = partial
        tmp = state_path + ".__tmp__"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        if os.path.exists(state_path):
            old_dir = state_path + ".__old__"
            os.rename(state_path, old_dir)
            os.rename(tmp, state_path)
            shutil.rmtree(old_dir)
        else:
            os.rename(tmp, state_path)

    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    query = (
        reader.parquet(source_dir)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def read_running_agg(
    spark: SparkSession,
    state_path: str,
    distinct_cols: list[str] | None = None,
) -> DataFrame:
    """The running aggregate with sketch columns materialized as
    ``distinct_<c>`` estimates (sketch binaries dropped)."""
    df = spark.read.parquet(state_path)
    for c in distinct_cols or []:
        df = df.withColumn(
            f"distinct_{c}", F.hll_sketch_estimate(f"hll_{c}")
        ).drop(f"hll_{c}")
    return df
