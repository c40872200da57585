"""Delta-rule join-view maintenance == from-scratch join, at every
refresh point, with appends landing on both sides between refreshes."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.streaming.ivm_join import (
    maintain_join_view, read_join_view,
)

SF = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_join_view_matches_recompute_across_refreshes(spark, tmp_path):
    left_dir = str(tmp_path / "left")
    right_dir = str(tmp_path / "right")
    state = str(tmp_path / "state")
    os.makedirs(left_dir)
    os.makedirs(right_dir)

    events = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "user_id", "event_type")
        .limit(300)
        .cache()
    )
    users = (
        events.select("user_id").distinct()
        .withColumn("segment", F.col("user_id") % 3)
        .cache()
    )

    # Interleaved arrival: two event slices land, refresh; a user
    # slice lands, refresh; the rest of both sides land, refresh.
    ev = [events.filter(F.col("event_id") % 3 == k) for k in range(3)]
    us = [users.filter(F.col("user_id") % 2 == k) for k in range(2)]

    def refresh():
        maintain_join_view(
            spark, left_dir, right_dir, state,
            on="user_id",
            left_cols=["event_id", "event_type"],
            right_cols=["segment"],
        )

    def landed_join():
        a = spark.read.parquet(left_dir).select(
            "user_id", "event_id", "event_type"
        )
        b = spark.read.parquet(right_dir).select("user_id", "segment")
        return a.join(b, "user_id")

    ev[0].write.mode("append").parquet(left_dir)
    ev[1].write.mode("append").parquet(left_dir)
    us[0].write.mode("append").parquet(right_dir)
    refresh()
    assert _canon(read_join_view(spark, state)) == _canon(landed_join())

    us[1].write.mode("append").parquet(right_dir)
    refresh()
    assert _canon(read_join_view(spark, state)) == _canon(landed_join())

    ev[2].write.mode("append").parquet(left_dir)
    refresh()
    got = _canon(read_join_view(spark, state))
    want = _canon(landed_join())
    assert got == want
    # Non-vacuous: the final view is the full events x users join.
    assert len(got) == events.count()

    # A refresh with nothing new must be a no-op (commit logs drain
    # only unseen files; no duplicate pairs appended).
    refresh()
    assert _canon(read_join_view(spark, state)) == want
