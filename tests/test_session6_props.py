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


def test_phash_recall_exact_at_hamming_2(spark):
    """Pigeonhole guarantee of the 3-segment (6+5+5 bit) blocking:
    EVERY pair with hamming <= 2 must be emitted (two halves would
    only guarantee hamming <= 1 -- the straddling-bits recall gap).
    Brute-force differential: recompute all-pairs hamming in Python
    from the operator's own hashes and demand set equality."""
    import itertools
    import random

    rng = random.Random(20260814)
    # clustered payloads: many share most bytes, so hashes land close
    base = bytes(rng.randrange(256) for _ in range(64))
    rows = []
    for i in range(120):
        b = bytearray(base)
        for _ in range(rng.randrange(0, 6)):
            b[rng.randrange(64)] = rng.randrange(256)
        rows.append((i, bytes(b).hex()))  # hex roundtrip keeps UTF-8 safe
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    p = attach_binary_payload(df, "text")
    hashes = {
        r["doc_id"]: r["phash16"]
        for r in payload_phash16(p).select("doc_id", "phash16").collect()
    }
    want = {
        (a, b): bin(hashes[a] ^ hashes[b]).count("1")
        for a, b in itertools.combinations(sorted(hashes), 2)
        if bin(hashes[a] ^ hashes[b]).count("1") <= 2
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_pairs(
            p, max_hamming=2, max_bucket_size=1_000_000
        ).collect()
    }
    assert got == want
    assert len(want) > 0  # the fixture actually exercises near pairs


def test_phash_short_payload_hashes_null(spark):
    """< 16 bytes -> NULL hash (guarded inside the operator, not at
    call sites); such rows never reach the pair stage."""
    rows = [(1, ""), (2, "short"), (3, "fifteen bytes!!"),
            (4, "exactly 16 bytes"), (5, "exactly 16 bytes")]
    p = attach_binary_payload(
        spark.createDataFrame(rows, ["doc_id", "text"]), "text"
    )
    hashed = {
        r["doc_id"]: r["phash16"]
        for r in payload_phash16(p).select("doc_id", "phash16").collect()
    }
    assert hashed[1] is None and hashed[2] is None and hashed[3] is None
    assert hashed[4] is not None and hashed[4] == hashed[5]
    pairs = phash_near_pairs(p, max_hamming=2).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(4, 5)}


def test_phash_max_hamming_above_guarantee_rejected():
    import pytest as _pytest

    from s3_parquet_to_postgres_spark.operators.multimodal import (
        phash_near_pairs as pnp,
    )

    with _pytest.raises(ValueError, match="max_hamming <= 2"):
        pnp(None, max_hamming=3)
