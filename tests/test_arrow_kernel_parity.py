"""Differential tests for the Arrow-batched numpy kernels that
replaced interpreted higher-order-function expressions (round 3:
payload_phash16, pq_topk, semantic_dedup).

The DuckDB oracle already pins these end-to-end on the testdata
corpus; what it cannot probe is TIE behavior on engineered inputs --
the exact place where the "replicates the sequential fold order
element-for-element" claim carries weight. Each test here replays the
kernel's contract in pure Python (sequential left-to-right folds,
first-win ties) on adversarial inputs: exact duplicate vectors
(distance ties in encode and ADC), boundary-length payloads, and
uniform payloads where blocksum * n == total * blocklen exactly.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from pyspark.sql import functions as F


# ------------------------------------------------------------------
# payload_phash16
# ------------------------------------------------------------------

def _phash16_ref(p: bytes):
    """Pure-Python replay of the documented hash contract."""
    n = len(p)
    if n < 16:
        return None
    tot = sum(p)
    h = 0
    for b in range(16):
        lo = b * n // 16
        hi = (b + 1) * n // 16
        if sum(p[lo:hi]) * n >= tot * (hi - lo):
            h |= 1 << b
    return h


PAYLOADS = [
    b"",                             # empty -> NULL
    b"x",                            # < 16 -> NULL
    bytes(range(15)),                # boundary below
    bytes(range(16)),                # boundary: one byte per block
    bytes(range(17)),                # uneven blocks
    b"\x00" * 64,                    # uniform zeros: 0*n >= 0 -> all bits
    b"\xff" * 33,                    # uniform, non-divisible length
    bytes([i % 251 for i in range(255)]),
    bytes([(7 * i) % 256 for i in range(256)]),
    b"\x01" * 16 + b"\xfe" * 16,     # half low, half high
    bytes([255, 0] * 50),            # alternating
]


def test_phash16_matches_pure_python_reference(spark):
    from s3_parquet_to_postgres_spark.operators.multimodal import (
        payload_phash16,
    )

    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(PAYLOADS)],
        "doc_id long, payload binary",
    )
    got = {
        r["doc_id"]: r["phash16"]
        for r in payload_phash16(df).select("doc_id", "phash16").collect()
    }
    for i, p in enumerate(PAYLOADS):
        assert got[i] == _phash16_ref(p), f"payload {i} ({p[:8]!r}...)"


def test_phash16_uniform_payload_sets_every_bit(spark):
    # blocksum * n == tot * blocklen exactly for every block of a
    # uniform payload; the >= must include equality.
    from s3_parquet_to_postgres_spark.operators.multimodal import (
        payload_phash16,
    )

    df = spark.createDataFrame(
        [(1, b"\x2a" * 48)], "doc_id long, payload binary"
    )
    [r] = payload_phash16(df).select("phash16").collect()
    assert r["phash16"] == 0xFFFF


# ------------------------------------------------------------------
# pq_topk: encode argmin first-win ties + ADC neighbor_id tiebreak
# ------------------------------------------------------------------

def _md5h(cid: int) -> int:
    return int(hashlib.md5(str(cid).encode()).hexdigest()[:8], 16)


def _pq_ref(rows, queries, k, m, n_codes, dim):
    """Sequential-fold replay of the pq_topk contract in pure Python."""
    sub = dim // m
    sample = sorted(rows, key=lambda r: (_md5h(r[0]), r[0]))[:n_codes]
    cb = [v for _, v in sample]

    def l2sq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    def encode(v):
        codes = []
        for j in range(m):
            best_d, best_i = float("inf"), 0
            for i, c in enumerate(cb, start=1):
                d = l2sq(v[j * sub:(j + 1) * sub], c[j * sub:(j + 1) * sub])
                if d < best_d:
                    best_d, best_i = d, i
            codes.append(best_i)
        return codes

    enc = {cid: encode(v) for cid, v in rows}
    out = []
    for qid, qv in queries:
        scored = []
        for cid, _ in rows:
            if cid == qid:
                continue
            codes = enc[cid]
            adc = None
            for j in range(m):
                c = cb[codes[j] - 1]
                dj = l2sq(qv[j * sub:(j + 1) * sub], c[j * sub:(j + 1) * sub])
                adc = dj if adc is None else adc + dj
            scored.append((cid, adc))
        scored.sort(key=lambda t: (t[1], t[0]))
        for rank, (cid, adc) in enumerate(scored[:k], start=1):
            out.append((qid, cid, math.floor(adc * 1e6 + 0.5) / 1e6, rank))
    return sorted(out)


def test_pq_topk_tie_behavior_matches_sequential_replay(spark):
    from s3_parquet_to_postgres_spark.operators.similarity import pq_topk

    dim, m, n_codes, k = 8, 4, 4, 5
    # Exact duplicate vectors force encode-distance ties (first code
    # must win) and ADC ties (neighbor_id must break them).
    base = [float((i * 7) % 5) - 2.0 for i in range(dim)]
    rows = []
    for cid in range(20):
        if cid % 3 == 0:
            v = list(base)  # duplicates
        else:
            v = [((cid * 31 + j * 17) % 13) / 3.0 - 2.0 for j in range(dim)]
        rows.append((cid, v))
    queries = [(0, rows[0][1]), (7, rows[7][1])]

    df = spark.createDataFrame(
        [(cid, v) for cid, v in rows], "vec_id long, embedding array<double>"
    )
    qdf = spark.createDataFrame(
        [(qid, v) for qid, v in queries],
        "vec_id long, embedding array<double>",
    )
    got = sorted(
        (
            r["query_id"],
            r["neighbor_id"],
            r["adc_dist"],
            r["rank"],
        )
        for r in pq_topk(df, qdf, k=k, m=m, n_codes=n_codes, dim=dim).collect()
    )
    want = _pq_ref(rows, queries, k, m, n_codes, dim)
    assert got == want


# ------------------------------------------------------------------
# semantic_dedup: threshold equality must remove (cos >= thr)
# ------------------------------------------------------------------

def test_semantic_dedup_exact_duplicates_removed_at_threshold_one(spark):
    from s3_parquet_to_postgres_spark.operators.similarity import (
        semantic_dedup,
    )

    # Identical vectors have cosine exactly 1.0; with threshold=1.0
    # the >= must still fire, keeping only the smallest id per
    # duplicate group. Distinct directions survive.
    vecs = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),   # dup of 1
        (3, [1.0, 0.0, 0.0, 0.0]),   # dup of 1
        (4, [0.0, 1.0, 0.0, 0.0]),
        (5, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, n_clusters=1, threshold=1.0).collect()
    assert len(out) == 1
    row = out[0]
    assert row["size"] == 5
    assert row["n_removed"] == 2
    assert row["n_kept"] == 3


def test_semantic_dedup_oversize_cluster_skips_pairing(spark):
    from s3_parquet_to_postgres_spark.operators.similarity import (
        semantic_dedup,
    )

    vecs = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(10)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = semantic_dedup(
        df, n_clusters=1, threshold=0.5, max_cluster_size=5
    ).collect()
    [row] = out
    assert row["size"] == 10 and row["n_removed"] == 0 and row["n_kept"] == 10


# ------------------------------------------------------------------
# assign_nearest_centroid vs the nearest_centroid column fold
# ------------------------------------------------------------------

def test_assign_nearest_centroid_matches_column_fold(spark):
    from s3_parquet_to_postgres_spark.operators.similarity import (
        as_double,
        assign_nearest_centroid,
        nearest_centroid,
    )

    # Vectors engineered for ties: rows 10/11 are equidistant between
    # centroids (first centroid_id must win in both engines). The
    # zero-vector case (NaN cosine everywhere -> NULL) is kernel-only
    # behavior -- the column fold errors under ANSI -- so it lives in
    # the kernel-only test below, not in this fold comparison.
    cent_rows = [
        (3, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.0, 0.0, 1.0]),
    ]
    vec_rows = [
        (10, [1.0, 1.0, 0.0]),   # tie between centroids 3 and 1
        (11, [0.0, 1.0, 1.0]),   # tie between centroids 1 and 2
        (13, [0.9, 0.1, 0.0]),
        (14, [-1.0, -1.0, -1.0]),
    ]
    cent = spark.createDataFrame(
        cent_rows, "centroid_id long, cent_vec array<double>"
    )
    vecs = spark.createDataFrame(
        vec_rows, "vec_id long, embedding array<double>"
    )
    kernel = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_nearest_centroid(
            vecs.select("vec_id", as_double("embedding").alias("__v")),
            cent,
            "__v",
        ).collect()
    }
    cent_arr = cent.agg(
        F.array_sort(
            F.collect_list(F.struct("centroid_id", "cent_vec"))
        ).alias("cents")
    )
    fold = {
        r["vec_id"]: r["cluster_id"]
        for r in vecs.select(
            "vec_id", as_double("embedding").alias("__v")
        )
        .join(F.broadcast(cent_arr))
        .select(
            "vec_id",
            nearest_centroid(F.col("cents"), F.col("__v")).alias(
                "cluster_id"
            ),
        )
        .collect()
    }
    assert kernel == fold
    assert kernel[10] == 1 and kernel[11] == 1  # smallest-id tie wins


def test_assign_nearest_centroid_zero_vector_yields_null(spark):
    # A zero vector has NaN cosine against every centroid. Under ANSI
    # mode the COLUMN fold errors outright (0.0/0.0 is DIVIDE_BY_ZERO
    # in Spark 4), so the kernel is strictly more total: it returns
    # NULL for the unassignable row instead of failing the job.
    from s3_parquet_to_postgres_spark.operators.similarity import (
        as_double,
        assign_nearest_centroid,
    )

    cent = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "centroid_id long, cent_vec array<double>",
    )
    vecs = spark.createDataFrame(
        [(7, [0.0, 0.0]), (8, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_nearest_centroid(
            vecs.select("vec_id", as_double("embedding").alias("__v")),
            cent,
            "__v",
        ).collect()
    }
    assert got[7] is None and got[8] == 1


def test_semantic_dedup_zero_vector_gets_null_cluster_row(spark):
    # A zero vector is unassignable (NaN cosine everywhere): it lands
    # in the NULL-cluster accounting row with no pairing, and the job
    # must not crash on the null group key.
    from s3_parquet_to_postgres_spark.operators.similarity import (
        semantic_dedup,
    )

    vecs = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),
        (3, [0.0, 0.0]),  # zero vector
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r["cluster_id"]: r for r in semantic_dedup(
        df, n_clusters=1, threshold=0.9
    ).collect()}
    assert None in out
    assert out[None]["size"] == 1 and out[None]["n_removed"] == 0
    [real] = [k for k in out if k is not None]
    assert out[real]["size"] == 2 and out[real]["n_removed"] == 1


def test_pq_topk_null_vectors_and_empty_corpus(spark):
    from s3_parquet_to_postgres_spark.operators.similarity import pq_topk

    # NULL corpus/query vectors are dropped, not crashed on.
    rows = [
        (1, [1.0, 0.0, 2.0, 1.0]),
        (2, None),
        (3, [0.0, 1.0, 1.0, 2.0]),
        (4, [2.0, 2.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(1, [1.0, 0.0, 2.0, 1.0]), (9, None)],
        "vec_id long, embedding array<double>",
    )
    got = pq_topk(df, q, k=3, m=2, n_codes=2, dim=4).collect()
    assert all(r["query_id"] == 1 for r in got)  # NULL query dropped
    assert all(r["neighbor_id"] != 2 for r in got)  # NULL corpus row dropped
    # Empty corpus: empty result, correct schema, no crash.
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = pq_topk(empty, q, k=3, m=2, n_codes=2, dim=4)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "adc_dist", "rank"]


def test_assign_nearest_centroid_empty_centroids(spark):
    from s3_parquet_to_postgres_spark.operators.similarity import (
        as_double,
        assign_nearest_centroid,
    )

    cent = spark.createDataFrame(
        [], "centroid_id long, cent_vec array<double>"
    )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = assign_nearest_centroid(
        vecs.select("vec_id", as_double("embedding").alias("__v")),
        cent,
        "__v",
    ).collect()
    assert [r["cluster_id"] for r in got] == [None]
