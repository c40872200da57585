"""Differential property tests for the session-6 operators beyond the
DuckDB oracle parity: the sweep-line concurrency entry against a
brute-force per-instant count, and the perceptual payload hash's
duplicate/stability guarantees."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.operators.multimodal import (
    attach_binary_payload,
    payload_phash16,
    phash_near_pairs,
)
from s3_parquet_to_postgres_spark.plans.mining import event_concurrency

SF_SMOKE = "/root/testdata/sf0.001"


def test_event_concurrency_matches_brute_force(spark):
    # Brute force: at each interval start instant, count the holds
    # [ts, ts+5m) covering it (half-open, so a hold ending exactly at
    # the instant does not count). The sweep-line peak must equal the
    # brute-force max per day, because the count only changes at
    # endpoints and every +1 endpoint is an interval start.
    got = {
        r["day"]: r["peak_concurrency"]
        for r in event_concurrency(spark, SF_SMOKE).collect()
    }

    ts = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("ts")
        .toPandas()["ts"]
        .sort_values()
        .reset_index(drop=True)
    )
    starts = ts.values
    ends = starts + pd.Timedelta(minutes=5).to_timedelta64()
    expected: dict[str, int] = {}
    for i in range(len(starts)):
        t0 = starts[i]
        cover = int(((starts <= t0) & (ends > t0)).sum())
        day = pd.Timestamp(t0).strftime("%Y-%m-%d")
        if cover > expected.get(day, 0):
            expected[day] = cover
    assert got == expected


def test_phash_exact_duplicates_collide(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "a completely different payload with other bytes inside"),
        (4, "a completely different payload with other bytes inside"),
    ]
    df = attach_binary_payload(
        spark.createDataFrame(rows, ["doc_id", "text"]), "text"
    )
    hashed = {
        r["doc_id"]: r["phash16"]
        for r in payload_phash16(df).select("doc_id", "phash16").collect()
    }
    assert hashed[1] == hashed[2]
    assert hashed[3] == hashed[4]
    assert all(0 <= h < (1 << 16) for h in hashed.values())

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_pairs(df, max_hamming=0).collect()
    }
    # exact duplicates MUST be found at hamming 0
    assert pairs.get((1, 2)) == 0
    assert pairs.get((3, 4)) == 0


def test_phash_is_partition_layout_invariant(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").filter(
        F.octet_length(F.encode("text", "UTF-8")) >= 16
    )
    one = payload_phash16(attach_binary_payload(d.coalesce(1), "text"))
    many = payload_phash16(
        attach_binary_payload(d.repartition(7), "text")
    )
    a = {r["doc_id"]: r["phash16"] for r in one.select("doc_id", "phash16").collect()}
    b = {r["doc_id"]: r["phash16"] for r in many.select("doc_id", "phash16").collect()}
    assert a == b
