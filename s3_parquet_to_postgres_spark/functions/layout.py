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
    defaultParallelism) iff it currently has fewer partitions."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
