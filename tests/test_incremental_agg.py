"""Incrementally-maintained aggregate == full recompute, across
multiple drain rounds, with only new files read per round."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.catalog import read_table
from s3_parquet_to_postgres_spark.streaming.incremental_agg import (
    maintain_running_agg,
)

SF = "/root/testdata/sf0.001"


def _stage(df, stage_dir, src_dir, name):
    df.coalesce(1).write.parquet(str(stage_dir))
    part = [f for f in os.listdir(str(stage_dir)) if f.endswith(".parquet")][0]
    shutil.copyfile(str(stage_dir / part), str(src_dir / name))


def test_running_agg_matches_full_recompute(spark, tmp_path):
    li = read_table(spark, SF, "lineitem")
    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    part1 = li.filter(F.col("l_orderkey") % 2 == 0)
    part2 = li.filter(F.col("l_orderkey") % 2 == 1)

    # Round 1.
    _stage(part1, tmp_path / "s1", src, "f1.parquet")
    maintain_running_agg(
        spark, str(src), state, ckpt,
        group_cols=["l_returnflag"], sum_cols=["l_quantity"],
    )
    got1 = {
        r["l_returnflag"]: (r["rows"], r["sum_l_quantity"])
        for r in spark.read.parquet(state).collect()
    }
    exp1 = {
        r["l_returnflag"]: (r["rows"], r["s"])
        for r in part1.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).cast("long").alias("rows"),
             F.sum("l_quantity").alias("s")).collect()
    }
    assert {k: v[0] for k, v in got1.items()} == {k: v[0] for k, v in exp1.items()}

    # Round 2: second half lands; state must now equal the FULL agg.
    _stage(part2, tmp_path / "s2", src, "f2.parquet")
    maintain_running_agg(
        spark, str(src), state, ckpt,
        group_cols=["l_returnflag"], sum_cols=["l_quantity"],
    )
    got2 = {
        r["l_returnflag"]: r["rows"]
        for r in spark.read.parquet(state).collect()
    }
    expected_full = {
        r["l_returnflag"]: r["rows"]
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).cast("long").alias("rows")).collect()
    }
    assert got2 == expected_full

    # Round 3: no new data -> state unchanged (exactly-once per file).
    maintain_running_agg(
        spark, str(src), state, ckpt,
        group_cols=["l_returnflag"], sum_cols=["l_quantity"],
    )
    got3 = {
        r["l_returnflag"]: r["rows"]
        for r in spark.read.parquet(state).collect()
    }
    assert got3 == expected_full


def test_running_distinct_via_mergeable_hll(spark, tmp_path):
    """HLL sketch state folds new batches in; union is register-wise
    max, so the incremental estimate equals the from-scratch estimate
    EXACTLY, and both sit within a few % of the true distinct."""
    from pyspark.sql import functions as F

    from s3_parquet_to_postgres_spark.streaming.incremental_agg import (
        maintain_running_agg,
        read_running_agg,
    )

    src = tmp_path / "src"
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def land(lo, hi, part):
        spark.range(lo, hi).selectExpr(
            "id % 5 AS g", "id % 313 AS user", "CAST(id AS DOUBLE) AS amt"
        ).coalesce(1).write.mode("append").parquet(str(src))

    land(0, 4000, 0)
    maintain_running_agg(
        spark, str(src), state, ckpt, ["g"], ["amt"],
        distinct_cols=["user"], max_files_per_trigger=2,
    )
    land(2000, 8000, 1)  # overlapping users: sketches must dedup
    maintain_running_agg(
        spark, str(src), state, ckpt, ["g"], ["amt"],
        distinct_cols=["user"], max_files_per_trigger=2,
    )

    got = read_running_agg(spark, state, ["user"]).orderBy("g").collect()
    full = spark.read.parquet(str(src))
    direct = (
        full.groupBy("g")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user")).alias("est"),
             F.countDistinct("user").alias("exact"),
             F.count("*").alias("rows"))
        .orderBy("g").collect()
    )
    assert len(got) == 5
    for g_row, d_row in zip(got, direct):
        assert g_row["rows"] == d_row["rows"]
        # merge-then-estimate == estimate-over-everything, exactly
        assert g_row["distinct_user"] == d_row["est"]
        # and the estimate is a real distinct count, not a row count
        assert abs(g_row["distinct_user"] - d_row["exact"]) <= 0.05 * d_row["exact"]


def test_histogram_sketch_merge_equals_rebuild(spark):
    """agg_histogram_quantiles' per-bin counter table from disjoint
    shards must ADD to the global sketch (the mergeability claim the
    entry's docstring makes)."""
    li = read_table(spark, SF, "lineitem")
    bin_col = (
        F.least(F.floor(F.col("l_extendedprice") / F.lit(1750.0)), F.lit(63))
        .cast("long").alias("bin")
    )
    global_hist = {
        r["bin"]: r["cnt"]
        for r in li.groupBy(bin_col).agg(F.count("*").alias("cnt")).collect()
    }
    merged: dict = {}
    for shard in range(3):
        part = li.filter(F.col("l_orderkey") % 3 == shard)
        for r in part.groupBy(bin_col).agg(F.count("*").alias("cnt")).collect():
            merged[r["bin"]] = merged.get(r["bin"], 0) + r["cnt"]
    assert merged == global_hist
