"""Stream-stream interval join + streaming dedup, driven availableNow
against batch ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.catalog import read_table
from s3_parquet_to_postgres_spark.streaming.joins import (
    stream_stream_interval_join,
    streaming_dedup,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events(spark):
    return read_table(spark, SF, "events")


def _run_to_memory(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_stream_join_matches_batch(spark, events, tmp_path):
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks.write.parquet(str(tmp_path / "clicks"))
    purchases.write.parquet(str(tmp_path / "purchases"))

    cs = spark.readStream.schema(clicks.schema).parquet(str(tmp_path / "clicks"))
    ps = spark.readStream.schema(purchases.schema).parquet(str(tmp_path / "purchases"))
    # purchases enriched with clicks up to 30 min earlier
    joined = stream_stream_interval_join(
        ps.withColumnRenamed("ts", "p_ts"),
        cs.withColumnRenamed("ts", "c_ts"),
        on="user_id", left_ts="p_ts", right_ts="c_ts",
    ).select("user_id", "purchase_id", "click_id")
    _run_to_memory(joined, "t_ssj")
    got = set(
        map(tuple, spark.sql("select * from t_ssj").collect())
    )

    p = purchases.withColumn("p_ts", F.col("ts").cast("timestamp"))
    c = clicks.withColumn("c_ts", F.col("ts").cast("timestamp"))
    expected = set(
        map(
            tuple,
            p.join(
                c,
                (p.user_id == c.user_id)
                & (c.c_ts <= p.p_ts)
                & (c.c_ts >= p.p_ts - F.expr("INTERVAL 30 minutes")),
            )
            .select(p.user_id, "purchase_id", "click_id")
            .collect(),
        )
    )
    assert got == expected
    assert len(got) > 0


def test_streaming_dedup_drops_replayed_rows(spark, events, tmp_path):
    # Same file staged twice = replay; dedup on event_id must keep one.
    sub = events.filter(F.col("event_id") < 200)
    sub.write.parquet(str(tmp_path / "src"))
    sub.write.mode("append").parquet(str(tmp_path / "src"))

    stream = spark.readStream.schema(sub.schema).parquet(str(tmp_path / "src"))
    deduped = streaming_dedup(stream, ["event_id"], watermark="10 hours")
    _run_to_memory(deduped.select("event_id"), "t_dedup")
    got = spark.sql("select count(*) c, count(distinct event_id) d from t_dedup").first()
    assert got["c"] == got["d"] == sub.count()
