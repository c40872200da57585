"""Compaction: many small files -> few right-sized files, same rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.catalog import read_table
from s3_parquet_to_postgres_spark.sources.compaction import (
    compact_parquet,
    parquet_file_count,
)

SF = "/root/testdata/sf0.001"


def test_compacts_small_files(spark, tmp_path):
    li = read_table(spark, SF, "lineitem")
    out = str(tmp_path / "frag")
    # Fragment: 64 small files.
    li.repartition(64).write.parquet(out)
    assert parquet_file_count(out) == 64
    before = li.count()

    n = compact_parquet(spark, out, target_file_bytes=1 << 30)
    assert n == 1 == parquet_file_count(out)
    after = spark.read.parquet(out)
    assert after.count() == before
    # Values intact, not just counts.
    assert (
        after.agg(F.sum("l_orderkey")).first()[0]
        == li.agg(F.sum("l_orderkey")).first()[0]
    )


def test_compaction_respects_target_size(spark, tmp_path):
    li = read_table(spark, SF, "lineitem")
    out = str(tmp_path / "frag2")
    li.repartition(32).write.parquet(out)
    # Tiny target -> multiple output files.
    n = compact_parquet(spark, out, target_file_bytes=64 * 1024)
    assert n > 1
    assert spark.read.parquet(out).count() == li.count()


def test_compaction_preserves_partition_layout(spark, tmp_path):
    li = read_table(spark, SF, "lineitem").withColumn(
        "flag", F.col("l_returnflag")
    )
    out = str(tmp_path / "frag3")
    li.repartition(16).write.partitionBy("flag").parquet(out)
    compact_parquet(spark, out, target_file_bytes=1 << 30,
                    partition_cols=["flag"])
    after = spark.read.parquet(out)
    assert after.count() == li.count()
    assert set(r["flag"] for r in after.select("flag").distinct().collect()) \
        == set(r["flag"] for r in li.select("flag").distinct().collect())


def test_bad_target_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="target_file_bytes"):
        compact_parquet(spark, str(tmp_path), target_file_bytes=0)
