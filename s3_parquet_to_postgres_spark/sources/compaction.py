"""Small-file compaction: rewrite a parquet dataset into right-sized
files.

Incremental ingestion (streaming/ingest.py, pipeline.py) naturally
produces many small files -- one-per-micro-batch-per-partition -- and
at 100 TB small files are a primary performance killer: every file
costs a listing entry, an open, a footer parse, and a task. Compaction
rewrites a dataset to ~``target_file_bytes`` files based on its actual
on-disk size, preserving (optionally) Hive-style partition columns.

Written as rewrite-to-temp + atomic directory swap so readers never
observe a half-compacted dataset on a POSIX filesystem; on object
stores, write to a versioned prefix and flip a pointer instead.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def dataset_size_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def parquet_file_count(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> int:
    """Rewrite the dataset at ``path`` into ceil(size/target) files
    (per partition directory when ``partition_cols`` given). Returns
    the new file count. Local-filesystem paths only (uses an atomic
    directory swap)."""
    if target_file_bytes < 1:
        raise ValueError("target_file_bytes must be >= 1")
    size = dataset_size_bytes(path)
    n_files = max(1, -(-size // target_file_bytes))  # ceil
    df = spark.read.parquet(path)

    tmp = path.rstrip("/") + ".__compact_tmp__"
    old = path.rstrip("/") + ".__compact_old__"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)

    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except OSError:
        os.rename(old, path)  # roll back
        raise
    shutil.rmtree(old)
    return parquet_file_count(path)
