"""Incremental LSH index: delta-dedup across ingest batches must
reproduce the single-shot full-corpus LSH pairs, and the index must
hold sketches only (no text)."""

from __future__ import annotations

import pyspark.sql.functions as F

from s3_parquet_to_postgres_spark.operators.dedup import minhash_lsh_pairs
from s3_parquet_to_postgres_spark.operators.lsh_index import (
    LshIndex,
    LshIndexConfig,
)


def _pairs_set(df):
    return {(r.id_a, r.id_b, round(r.jaccard_est, 9)) for r in df.collect()}


def test_incremental_equals_full_corpus(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    full = _pairs_set(minhash_lsh_pairs(docs))

    idx = LshIndex(spark, str(tmp_path / "idx"))
    b1 = docs.filter(F.col("doc_id") % 3 == 0)
    b2 = docs.filter(F.col("doc_id") % 3 == 1)
    b3 = docs.filter(F.col("doc_id") % 3 == 2)
    got = set()
    for b in (b1, b2, b3):
        got |= _pairs_set(idx.ingest(b))
    assert got == full and len(full) > 0


def test_index_stores_sketches_not_text(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = LshIndex(spark, str(tmp_path / "idx"))
    idx.ingest(docs)
    stored = spark.read.parquet(str(tmp_path / "idx"))
    assert set(stored.columns) == {"id", "sig", "band", "band_hash"}
    cfg = LshIndexConfig()
    assert stored.count() == docs.count() * cfg.bands


def test_first_batch_vs_empty_index_self_pairs_only(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    half = docs.filter(F.col("doc_id") < 250)
    idx = LshIndex(spark, str(tmp_path / "idx"))
    p1 = _pairs_set(idx.ingest(half))
    # every pair from the first ingest is within the batch
    assert all(a < 250 and b < 250 for a, b, _ in p1)
    # and matches the batch operator run on that half alone
    assert p1 == _pairs_set(minhash_lsh_pairs(half))


def test_second_ingest_finds_cross_batch_duplicates(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    full = _pairs_set(minhash_lsh_pairs(docs))
    cross_expected = {
        (a, b, j) for a, b, j in full
        if (a < 250) != (b < 250)
    }
    idx = LshIndex(spark, str(tmp_path / "idx"))
    idx.ingest(docs.filter(F.col("doc_id") < 250))
    p2 = _pairs_set(idx.ingest(docs.filter(F.col("doc_id") >= 250)))
    cross_got = {(a, b, j) for a, b, j in p2 if (a < 250) != (b < 250)}
    assert cross_got == cross_expected


def test_exact_index_matches_full_corpus_dedup(spark, sf_dir, tmp_path):
    from s3_parquet_to_postgres_spark.operators.lsh_index import (
        ExactDedupIndex,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = ExactDedupIndex(spark, str(tmp_path / "exact"))
    out = []
    for lo, hi in ((0, 200), (200, 400), (400, 10**9)):
        batch = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        out.extend(idx.ingest(batch).collect())
    got = {r.id: (r.keeper, r.is_duplicate) for r in out}
    # full-corpus truth: keeper = min doc_id per sha256(text)
    truth = {
        r.doc_id: r.keeper
        for r in docs.selectExpr(
            "doc_id",
            "min(doc_id) over (partition by sha2(text, 256)) as keeper",
        ).collect()
    }
    assert len(got) == len(truth)
    for doc_id, keeper in truth.items():
        assert got[doc_id] == (keeper, doc_id != keeper)


def test_exact_index_flags_cross_batch_duplicate(spark, tmp_path):
    from s3_parquet_to_postgres_spark.operators.lsh_index import (
        ExactDedupIndex,
    )

    idx = ExactDedupIndex(spark, str(tmp_path / "exact"))
    b1 = spark.createDataFrame([(1, "same text"), (2, "other")],
                               ["doc_id", "text"])
    b2 = spark.createDataFrame([(3, "same text")], ["doc_id", "text"])
    r1 = {r.id: r for r in idx.ingest(b1).collect()}
    assert not r1[1].is_duplicate and not r1[2].is_duplicate
    r2 = {r.id: r for r in idx.ingest(b2).collect()}
    assert r2[3].is_duplicate and r2[3].keeper == 1
