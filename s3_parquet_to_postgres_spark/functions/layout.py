"""Partition-layout helper for CPU-heavy narrow transforms.

A parquet file is splittable only at row-group boundaries, so a
single-file single-row-group input becomes ONE task -- and a narrow
but expensive expression chain (shingling, regex scoring) then runs
on one core regardless of cluster size. ``spread`` repartitions up to
the session's default parallelism before such work when the input has
fewer partitions; the shuffle moves only the raw input rows (cheap)
and buys full-width execution of everything downstream. On real
multi-file 100 TB inputs the partition count is already high and this
is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition df up to ``min_partitions`` (default: the session's
    defaultParallelism) iff the input is narrow.

    Narrowness is judged from the scan's file list (``inputFiles``, a
    pure file-index lookup) rather than ``df.rdd.getNumPartitions()``,
    which would force a full RDD conversion of the plan at build time.
    Fewer files than target cores -> repartition (a single file may
    still split by maxPartitionBytes, in which case this repartition
    is a cheap over-caution on a small input); at 100 TB the file
    count dwarfs the core count and this is a provable no-op with no
    plan materialization. Non-file plans (in-memory test frames)
    report no input files and are repartitioned -- they are tiny by
    construction."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= 4 * target:
        # Many files -> already wide; decided from the file index
        # alone, with no plan materialization. The 100 TB no-op path.
        # The 4x margin covers Spark's small-file packing: the scan
        # bin-packs tiny files (maxSplitBytes), so file count is an
        # upper bound on partitions, not a floor -- marginal counts
        # fall through to the accurate check below.
        return df
    # Composed operators each call spread; only the first may add a
    # repartition. A logical-plan check (cheap, no physical planning)
    # keeps chains like quality_scores(language_id(df)) from shuffling
    # the corpus once per stage. Only SHUFFLE repartitions at/above
    # target count as "already spread" -- "Repartition n, false" is a
    # coalesce (may be narrowING), and a small explicit repartition(2)
    # is not width either.
    import re

    plan_str = df._jdf.queryExecution().logical().toString()
    widths = [int(n) for n in re.findall(r"Repartition (\d+), true", plan_str)]
    if any(n >= target for n in widths) or "RepartitionByExpression" in plan_str:
        return df
    # Few files is NOT proof of narrowness: one 8 GB file splits into
    # ~64 maxPartitionBytes scan partitions, and repartitioning that
    # would shuffle the lot (possibly REDUCING parallelism). Only here
    # -- few-file or in-memory inputs, whose plans are small -- pay
    # the accurate df.rdd partition count.
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
