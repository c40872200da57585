"""Bucketed tables: pre-shuffled storage for co-located joins.

Bucketing writes each table hash-partitioned on the join key into a
fixed number of buckets. Two tables bucketed on the same key with the
same bucket count join WITHOUT a shuffle -- the scan's output
partitioning already satisfies the join's distribution requirement.
At 100 TB this converts the dominant fact-fact shuffle (terabytes over
the network per query) into a storage-time cost paid once, which is
the right trade for any join key queried repeatedly (orderkey,
user_id, ...). ``sortBy`` additionally pre-sorts within buckets so
sort-merge join skips its sort.

Spark only honors bucketing metadata through the catalog (saveAsTable),
not bare-path parquet -- hence the table-name API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) catalog
    table. Joining two tables written with the same bucket spec on the
    bucket columns produces a shuffle-free plan."""
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> bool:
    """True when the bucketed join plan contains no shuffle exchange
    on either input (diagnostic used by tests and capacity planning)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    plan = (
        lt.join(rt, on)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    return "Exchange hashpartitioning" not in plan
