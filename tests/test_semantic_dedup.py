"""semantic_dedup behaves like SemDeDup: exact-duplicate groups keep
exactly one member (the smallest id), distinct points survive, and the
per-cluster accounting is internally consistent."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.operators.similarity import semantic_dedup


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_duplicate_group_keeps_one(spark):
    e1 = [1.0, 0.0, 0.0, 0.0]
    e2 = [0.0, 1.0, 0.0, 0.0]
    df = _emb(spark, [(1, e1), (2, e1), (3, e1), (4, e2)])
    out = {r.cluster_id: r for r in semantic_dedup(df, threshold=0.9).collect()}
    # Identical vectors share a nearest centroid, so the triple lands
    # in one cluster; two of its three members are removed (ids 2, 3
    # have the near-duplicate id 1 below them); the orthogonal vector
    # survives wherever it landed.
    assert sum(r.n_removed for r in out.values()) == 2
    assert sum(r.n_kept for r in out.values()) == 2
    for r in out.values():
        assert r.n_kept + r.n_removed == r.size
        assert r.n_kept >= 1  # greedy-by-id never empties a cluster


def test_no_near_duplicates_removes_nothing(spark):
    rows = [
        (i, [1.0 if d == i else 0.0 for d in range(8)]) for i in range(8)
    ]
    df = _emb(spark, rows)
    out = semantic_dedup(df, threshold=0.9).collect()
    assert sum(r.n_removed for r in out) == 0
    assert sum(r.size for r in out) == 8


def test_accounting_matches_corpus_at_sf(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = semantic_dedup(emb).agg(
        F.sum("size").alias("n"),
        F.sum("n_kept").alias("kept"),
        F.sum("n_removed").alias("removed"),
    ).collect()[0]
    assert out.n == emb.count()  # every vector accounted for exactly once
    assert out.kept + out.removed == out.n
