"""knn_classify propagates the locally-dominant label and votes
deterministically."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.operators.similarity import knn_classify


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )


def test_propagates_dominant_cluster_label(spark):
    # Two tight clusters on orthogonal axes; queries sit on the axes.
    corpus = [(i, 0, [1.0, 0.05 * i, 0.0, 0.0]) for i in range(10, 15)]
    corpus += [(i, 1, [0.0, 0.05 * i, 1.0, 0.0]) for i in range(20, 25)]
    queries = [(1, -1, [1.0, 0.0, 0.0, 0.0]), (2, -1, [0.0, 0.0, 1.0, 0.0])]
    out = {
        r.query_id: r
        for r in knn_classify(
            _emb(spark, corpus), _emb(spark, queries), k=3
        ).collect()
    }
    assert out[1].pred_label == 0
    assert out[2].pred_label == 1
    assert out[1].votes == 3 and out[2].votes == 3


def test_tie_breaks_to_smallest_label(spark):
    # k=2 with one neighbor of each label equidistant -> 1-1 tie ->
    # smallest label wins deterministically.
    corpus = [(10, 5, [1.0, 0.0]), (11, 3, [1.0, 0.0])]
    queries = [(1, -1, [1.0, 0.0])]
    out = knn_classify(_emb(spark, corpus), _emb(spark, queries), k=2).collect()
    assert out[0].pred_label == 3
    assert out[0].votes == 1


def test_every_query_gets_exactly_one_prediction(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    preds = knn_classify(
        e.filter(F.col("vec_id") >= 20), e.filter(F.col("vec_id") < 20), k=10
    )
    assert preds.count() == 20
    assert preds.select("query_id").distinct().count() == 20
