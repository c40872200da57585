"""Focused pins for the r10 ml_logreg_train internals: the checkpointed
iteration state is co-partitioned on doc_id (so per-iteration doc_id
requirements plan exchange-free) and the AQE toggle used to preserve
that partitioning through localCheckpoint is always restored.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.plans.base import size_scaled_partitions
from s3_parquet_to_postgres_spark.plans.mining import ml_logreg_train
from tests.conftest import SF_SMOKE


def test_aqe_conf_restored_after_construction(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    df = ml_logreg_train(spark, SF_SMOKE)
    # The builder toggles AQE off around its checkpoint builds; the
    # toggle must never leak into the session (every later query in a
    # bench/driver session would silently lose AQE).
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert df.count() == 16


def test_checkpoint_partitioning_preserved(spark):
    """A repartition planned with AQE off survives localCheckpoint as
    hashpartitioning (the whole point of the toggle: under AQE the
    LogicalRDD records UnknownPartitioning and downstream groupBys
    re-exchange), and a downstream groupBy on the partition key plans
    with zero Exchange nodes."""
    df = spark.range(0, 10_000).select(
        (F.col("id") % 97).alias("doc_id"), F.col("id").alias("v")
    )
    aqe_key = "spark.sql.adaptive.enabled"
    spark.conf.set(aqe_key, "false")
    try:
        ck = df.repartition(4, "doc_id").localCheckpoint(eager=True)
    finally:
        spark.conf.set(aqe_key, "true")
    part = str(ck._jdf.queryExecution().executedPlan().outputPartitioning())
    assert "hashpartitioning(doc_id" in part, part
    agg = ck.groupBy("doc_id").agg(F.sum("v"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_size_scaled_partitions_bounds(spark):
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Tiny local table -> 1 partition (no 32-empty-task stages).
    assert size_scaled_partitions(spark, SF_SMOKE, "documents") == 1
    # Unreachable path (cluster posture, e.g. s3a://) -> conf cap.
    assert size_scaled_partitions(spark, "/no/such/dir", "documents") == cap
