"""Streaming surface tests: incremental file ingestion with resume
(the reference's work-list semantics on the file-source commit log),
watermarked event-time windows, and the stateful per-user profile.

Mirrors the reference's e2e test style (drive the public API, verify
via queries on the destination -- reference: src/runner.rs:163-236)
with tmpdir parquet stand-ins for S3 + Postgres.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.catalog import read_table
from s3_parquet_to_postgres_spark.streaming.ingest import (
    incremental_parquet_load,
)
from s3_parquet_to_postgres_spark.streaming.stateful import (
    user_activity_profile,
)
from s3_parquet_to_postgres_spark.streaming.windows import (
    session_aggregate,
    sliding_value_sums,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


def _copy_part_files(src_parquet: str, dst_dir: str, limit: int) -> list[str]:
    """Copy up to `limit` part files of a parquet dataset into dst_dir
    as standalone files (simulating files landing over time)."""
    parts = sorted(
        f for f in os.listdir(src_parquet)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    copied = []
    for f in parts[:limit]:
        dst = os.path.join(dst_dir, f)
        shutil.copyfile(os.path.join(src_parquet, f), dst)
        copied.append(dst)
    return copied


@pytest.fixture()
def events(spark):
    return read_table(spark, SF, "events")


def test_incremental_load_resumes_from_checkpoint(spark, tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    # Round 1: one file lands.
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    li.filter(F.col("l_orderkey") % 2 == 0).coalesce(1).write.parquet(
        str(tmp_path / "stage1")
    )
    _copy_part_files(str(tmp_path / "stage1"), str(src), 1)
    r1 = incremental_parquet_load(
        spark, str(src), str(out), str(ckpt), max_files_per_trigger=1
    )
    n1 = spark.read.parquet(str(out)).count()
    assert r1.rows == n1 > 0

    # Round 2: a second file lands; ONLY it is processed (commit log
    # remembers file 1 -- the reference's completed-list semantics).
    li.filter(F.col("l_orderkey") % 2 == 1).coalesce(1).write.parquet(
        str(tmp_path / "stage2")
    )
    dst2 = str(src / "part-round2.parquet")
    shutil.copyfile(
        _copy_part_files(str(tmp_path / "stage2"), str(tmp_path), 1)[0], dst2
    )
    r2 = incremental_parquet_load(
        spark, str(src), str(out), str(ckpt), max_files_per_trigger=1
    )
    total = spark.read.parquet(str(out)).count()
    assert r2.rows == total - n1 > 0
    assert total == li.count()

    # Round 3: nothing new -> no rows.
    r3 = incremental_parquet_load(spark, str(src), str(out), str(ckpt))
    assert r3.rows == 0


def test_incremental_load_applies_transform(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    spark.read.parquet(f"{SF}/orders.parquet").coalesce(1).write.parquet(
        str(tmp_path / "stage")
    )
    _copy_part_files(str(tmp_path / "stage"), str(src), 1)

    incremental_parquet_load(
        spark,
        str(src),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        transform=lambda df: df.select(
            "o_orderkey", F.col("o_totalprice").alias("price")
        ),
    )
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.columns == ["o_orderkey", "price"]


def test_foreach_batch_load_ids_and_resume(spark, tmp_path):
    from s3_parquet_to_postgres_spark.streaming.ingest import (
        foreach_batch_load,
    )

    src = tmp_path / "src"
    src.mkdir()
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    orders.coalesce(1).write.parquet(str(tmp_path / "stage"))
    _copy_part_files(str(tmp_path / "stage"), str(src), 1)

    seen: list[tuple[int, int]] = []
    foreach_batch_load(
        spark, str(src), str(tmp_path / "ckpt"),
        lambda df, bid: seen.append((bid, df.count())),
    )
    assert sum(n for _, n in seen) == orders.count()
    # batch_id is stable/monotonic -- the idempotence key for sinks.
    assert [b for b, _ in seen] == sorted({b for b, _ in seen})

    # Re-run with the same checkpoint: nothing new to process.
    seen2: list[int] = []
    foreach_batch_load(
        spark, str(src), str(tmp_path / "ckpt"),
        lambda df, bid: seen2.append(df.count()),
    )
    assert sum(seen2) == 0


def test_streaming_tumbling_counts_match_batch(spark, events, tmp_path):
    # Batch ground truth through the very same helper.
    expected = {
        (r["window_start"], r["event_type"]): r["events"]
        for r in tumbling_counts(events).collect()
    }

    events.write.parquet(str(tmp_path / "src"))
    stream = spark.readStream.schema(events.schema).parquet(str(tmp_path / "src"))
    q = (
        tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName("t_tumbling")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): r["events"]
        for r in spark.sql("select * from t_tumbling").collect()
    }
    assert got == expected


def test_streaming_session_and_sliding_run(spark, events, tmp_path):
    events.write.parquet(str(tmp_path / "src"))
    stream = spark.readStream.schema(events.schema).parquet(str(tmp_path / "src"))

    q1 = (
        sliding_value_sums(stream)
        .writeStream.format("memory")
        .queryName("t_sliding")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination()
    sliding = spark.sql("select * from t_sliding")
    assert sliding.count() > 0
    # Sliding windows must overlap: more windows than tumbling hours.
    assert sliding.count() > events.select(
        F.date_trunc("hour", "ts")
    ).distinct().count() * 0.9

    q2 = (
        session_aggregate(stream)
        .writeStream.format("memory")
        .queryName("t_session")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    sessions = spark.sql("select * from t_session")
    assert sessions.count() > 0
    assert sessions.filter(F.col("session_end") < F.col("session_start")).count() == 0


def test_stateful_user_profile(spark, events, tmp_path):
    events.write.parquet(str(tmp_path / "src"))
    stream = spark.readStream.schema(events.schema).parquet(str(tmp_path / "src"))
    q = (
        user_activity_profile(stream)
        .writeStream.format("memory")
        .queryName("t_profile")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # Update mode may emit one row per key per micro-batch; the LAST
    # emission per user carries the final running totals.
    prof = spark.sql(
        "select * from (select *, row_number() over "
        "(partition by user_id order by n_events desc) rn from t_profile) "
        "where rn = 1"
    )
    expected = events.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.coalesce("value", F.lit(0.0))).alias("tv"),
    )
    joined = prof.join(expected, "user_id")
    assert joined.count() == expected.count()
    bad = joined.filter(
        (F.col("n_events") != F.col("n"))
        | (F.abs(F.col("total_value") - F.col("tv")) > 1e-6)
    )
    assert bad.count() == 0


def test_watermark_drops_late_data_across_batches(spark, tmp_path):
    """A row whose event time is older than the committed watermark is
    dropped (numRowsDroppedByWatermark). The watermark computed from
    batch N's data is committed at N's end and applied from batch N+1
    on, so the late row rides the third micro-batch: batch 0 advances
    event time to 12:00, batch 1 commits watermark 10:00, batch 2's
    05:00 row is late."""
    import datetime
    import time

    from s3_parquet_to_postgres_spark.streaming.windows import (
        tumbling_counts,
    )

    def ts(h, m=0):
        return datetime.datetime(2024, 1, 1, h, m)

    schema = "event_id long, ts timestamp, event_type string"
    src = tmp_path / "src"
    src.mkdir()

    batches = [
        [(1, ts(11, 30), "click"), (2, ts(12, 0), "click")],
        [(3, ts(12, 15), "click")],
        [(4, ts(5, 0), "click"), (5, ts(11, 45), "click")],
    ]
    for i, rows in enumerate(batches):
        stage = tmp_path / f"b{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(stage)
        )
        part = [f for f in os.listdir(str(stage)) if f.endswith(".parquet")][0]
        shutil.copyfile(str(stage / part), str(src / f"f{i}.parquet"))
        time.sleep(1.1)  # file-source orders micro-batches by mtime

    stream = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        tumbling_counts(stream, duration="1 hour", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("t_late")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1  # exactly the 05:00 row

    totals = {}
    for r in spark.sql("select * from t_late").collect():
        h = r["window_start"].hour
        totals[h] = max(totals.get(h, 0), r["events"])
    assert 5 not in totals       # never aggregated
    assert totals.get(11) == 2   # 11:30 + late-but-in-watermark 11:45
