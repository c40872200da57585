"""Streaming CEP == batch CEP: the applyInPandasWithState pattern
matcher (streaming/cep.py), replayed over time-split micro-batches,
must emit exactly the rows of the lead()-compiled batch entry
(event_pattern_match) -- including matches whose 3-event lookahead
SPANS a micro-batch boundary, which is the whole reason the streaming
half needs state."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.catalog import read_table
from s3_parquet_to_postgres_spark.plans.ext import event_pattern_match
from s3_parquet_to_postgres_spark.streaming.cep import pattern_matches

SF = "/root/testdata/sf0.001"


def test_streaming_pattern_matches_batch(spark, tmp_path):
    events = read_table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    src = tmp_path / "src"
    src.mkdir()
    # Land the log as three time-ordered files (per-user order is
    # preserved because the split is global on ts) with distinct
    # mtimes so the file source drains them oldest-first.
    ep = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = events.agg(
        F.expr(
            "percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.34)"
        ).alias("t1"),
        F.expr(
            "percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.67)"
        ).alias("t2"),
    ).first()
    t1, t2 = bounds["t1"], bounds["t2"]
    chunks = [
        events.filter(ep <= t1),
        events.filter((ep > t1) & (ep <= t2)),
        events.filter(ep > t2),
    ]
    for i, ch in enumerate(chunks):
        stage = tmp_path / f"stage{i}"
        ch.coalesce(1).write.parquet(str(stage))
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        os.rename(str(stage / part), str(src / f"{i}.parquet"))
        time.sleep(1.1)  # distinct mtimes -> deterministic drain order

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        pattern_matches(stream)
        .writeStream.format("memory")
        .queryName("t_cep")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {tuple(r) for r in spark.table("t_cep").collect()}
    batch = {tuple(r) for r in event_pattern_match(spark, SF).collect()}
    assert len(batch) > 0
    assert streamed == batch

    # The split must actually have exercised cross-batch state: at
    # least one match's signup and error land in different chunks.
    ids = {}
    for i, ch in enumerate(chunks):
        for r in ch.select("event_id").collect():
            ids[r["event_id"]] = i
    spanning = [
        m for m in batch if ids[m[1]] != ids[m[2]]  # signup vs error chunk
    ]
    assert spanning, "time split produced no boundary-spanning matches"
