"""Streaming half of the curation funnel: the narrow signal stage
(curation_signals) runs unchanged on a file-source stream, and the
incremental result is batch-parity exact. This is the shape a 100 TB
pipeline actually runs: signals/gates stream per landing file (no
state), while dedup + accounting run as periodic batch jobs over the
signal table (or as stateful streaming dedup -- streaming/joins.py)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.plans.ext import curation_signals
from s3_parquet_to_postgres_spark.streaming.ingest import (
    incremental_parquet_load,
)

SF = "/root/testdata/sf0.001"


def test_streamed_signals_match_batch(spark, tmp_path):
    src = str(tmp_path / "landing")
    out = str(tmp_path / "signals")
    ckpt = str(tmp_path / "ckpt")
    # Land the corpus as several files to force multiple micro-batches.
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    docs.repartition(5).write.parquet(src)
    assert len(glob.glob(os.path.join(src, "*.parquet"))) >= 5

    res = incremental_parquet_load(
        spark, src, out, ckpt,
        transform=curation_signals, max_files_per_trigger=2,
    )
    assert res.batches >= 2  # genuinely incremental, not one big batch

    streamed = spark.read.parquet(out)
    batch = curation_signals(docs)
    s_rows = {tuple(r) for r in streamed.collect()}
    b_rows = {tuple(r) for r in batch.collect()}
    assert s_rows == b_rows and len(s_rows) > 0


def test_streamed_signals_resume_processes_only_new_files(spark, tmp_path):
    src = str(tmp_path / "landing")
    out = str(tmp_path / "signals")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    first = docs.filter(F.col("doc_id") < 250)
    second = docs.filter(F.col("doc_id") >= 250)
    first.coalesce(1).write.mode("append").parquet(src)
    r1 = incremental_parquet_load(spark, src, out, ckpt,
                                  transform=curation_signals)
    second.coalesce(1).write.mode("append").parquet(src)
    r2 = incremental_parquet_load(spark, src, out, ckpt,
                                  transform=curation_signals)
    # Second drain reads ONLY the new file's rows.
    assert r2.rows == second.count()
    streamed = spark.read.parquet(out)
    assert {tuple(r) for r in streamed.collect()} == {
        tuple(r) for r in curation_signals(docs).collect()
    }
