"""Stream-stream interval join + streaming dedup, driven availableNow
against batch ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.catalog import read_table
from s3_parquet_to_postgres_spark.streaming.joins import (
    stream_static_enrich,
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


def test_stream_static_enrich_matches_batch_entry(spark, events, tmp_path):
    # The streaming half of event_enrich_customer: events arrive as
    # incremental files, the customer dim stays static; the per-batch
    # broadcast join must reproduce the batch rollup exactly.
    from s3_parquet_to_postgres_spark.plans.ext import event_enrich_customer

    # Stage the stream in two file batches to exercise >1 micro-batch.
    events.filter(F.col("event_id") % 2 == 0).write.parquet(
        str(tmp_path / "ev")
    )
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(
        str(tmp_path / "ev")
    )
    dim = read_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    stream = spark.readStream.schema(events.schema).parquet(str(tmp_path / "ev"))
    enriched = stream_static_enrich(
        stream, dim, on=stream["user_id"] == dim["c_custkey"], how="inner"
    ).select("event_id", "user_id", "event_type", "value", "c_mktsegment")
    _run_to_memory(enriched, "t_sse")

    got = {
        (r.segment, r.event_type): (r.n_events, r.n_users, r.total_value)
        for r in spark.sql(
            """select c_mktsegment segment, event_type,
                      count(*) n_events,
                      count(distinct user_id) n_users,
                      cast(sum(cast(value as decimal(18,4))) as double)
                        total_value
               from t_sse group by 1, 2"""
        ).collect()
    }
    expected = {
        (r.segment, r.event_type): (r.n_events, r.n_users, r.total_value)
        for r in event_enrich_customer(spark, SF).collect()
    }
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
