"""Faithful replays of the reference's e2e test scenarios
(FIXTURES.md §A; reference: src/runner.rs:163-374) on our pipeline:
same schemas, same rename maps, same verification queries -- tmpdir
parquet standing in for localstack S3, a recording sink for Postgres.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from s3_parquet_to_postgres_spark import pipeline
from s3_parquet_to_postgres_spark.config import (
    JobSpec,
    ProjectionSpec,
    SinkSpec,
    SourceSpec,
)

A1_FIELDS = ["order_id", "desc", "customer_name", "some_positive_int",
             "some_unsigned_float", "some_fraction"]
A1_RENAMES = {"order_id": "id", "desc": "description"}


def _a1_rows():
    """60 rows / 6 files like customer-orders-parquet; some_fraction is
    NULL in rows 8-9 of each file (reference: src/runner.rs:219-233),
    customer_name all-NULL (the NOT NULL violation fixture)."""
    rows = []
    for f in range(6):
        for i in range(10):
            oid = f * 10 + i
            rows.append(
                Row(
                    order_id=oid,
                    desc=f"order {oid}",
                    customer_name=None,
                    some_positive_int=oid * 3,
                    some_unsigned_float=float(oid) - 5.0,
                    some_positive_float=1.5,   # projection-dropped
                    some_other_float=2.5,      # projection-dropped
                    supplier="acme",           # projection-dropped
                    dept="toys",               # projection-dropped
                    some_fraction=None if i >= 8 else oid / 100.0,
                )
            )
    return rows


@pytest.fixture()
def a1(spark, tmp_path):
    df = spark.createDataFrame(
        _a1_rows(),
        "order_id long, desc string, customer_name string, "
        "some_positive_int long, some_unsigned_float double, "
        "some_positive_float double, some_other_float double, "
        "supplier string, dept string, some_fraction double",
    )
    keys = []
    for f in range(6):
        path = tmp_path / f"order_{f:02d}.parquet"
        df.filter((F.col("order_id") >= f * 10)
                  & (F.col("order_id") < (f + 1) * 10)) \
          .coalesce(1).write.parquet(str(path))
        keys.append(str(path))
    work = tmp_path / "work"
    work.mkdir()
    (work / "todo").write_text("\n".join(keys) + "\n")
    spec = JobSpec(
        source=SourceSpec(download_batch_size=4, work_lists_dir=str(work)),
        projection=ProjectionSpec(
            desired_fields=tuple(A1_FIELDS), renames=A1_RENAMES
        ),
        sink=SinkSpec(),
    )
    return spec, keys


def test_a1_happy_path_count_and_order(spark, a1):
    """reference: src/runner.rs:163-236 -- count(id)=60, first-2 UNION
    ALL last-2 ordered by id."""
    spec, keys = a1
    loaded = []
    pipeline.run(spark, spec, lambda df: loaded.append(df.toPandas()) or len(loaded[-1]))
    import pandas as pd

    table = pd.concat(loaded, ignore_index=True)
    assert len(table) == 60
    assert list(table.columns) == ["id", "description", "customer_name",
                                   "some_positive_int",
                                   "some_unsigned_float", "some_fraction"]
    ordered = table.sort_values("id")
    first2 = ordered.head(2)["id"].tolist()
    last2 = ordered.tail(2)["id"].tolist()
    assert first2 == [0, 1] and last2 == [58, 59]


def test_a1_is_null_verification(spark, a1):
    """reference verification: SELECT * WHERE some_fraction IS NULL
    returns rows 8-9 of each file (12 rows)."""
    spec, _ = a1
    nulls = []
    pipeline.run(
        spark, spec,
        lambda df: nulls.append(
            df.filter(F.col("some_fraction").isNull()).count()
        ) or df.count(),
    )
    assert sum(nulls) == 12


def test_a1_not_null_violation_fails_fast(spark, a1):
    """reference: src/runner.rs:345-374 -- the all-NULL customer_name
    violates the destination NOT NULL constraint; the run aborts and
    the in-flight batch is NOT marked completed."""
    spec, keys = a1

    def constrained_sink(df):
        if df.filter(F.col("customer_name").isNull()).count() > 0:
            raise RuntimeError("violates not-null constraint")
        return df.count()

    with pytest.raises(RuntimeError, match="not-null"):
        pipeline.run(spark, spec, constrained_sink)
    work_dir = spec.source.work_lists_dir
    with open(f"{work_dir}/wip") as fh:
        wip = [ln.strip() for ln in fh if ln.strip()]
    assert wip == keys[:4]  # first batch stuck in wip, nothing completed
    import os

    assert not os.path.exists(f"{work_dir}/completed")


def test_a2_dotted_names_roundtrip(spark, tmp_path):
    """reference: src/parquet_ops.rs:264-288 (iris 'sepal.length') --
    dotted physical names load via the rename map."""
    df = spark.createDataFrame([(5.1, "setosa"), (6.2, "virginica")],
                               ["sepal_length_tmp", "species"])
    df = df.withColumnRenamed("sepal_length_tmp", "sepal.length")
    src = tmp_path / "iris.parquet"
    df.write.parquet(str(src))
    work = tmp_path / "work"
    work.mkdir()
    (work / "todo").write_text(str(src) + "\n")
    spec = JobSpec(
        source=SourceSpec(work_lists_dir=str(work)),
        projection=ProjectionSpec(
            desired_fields=("sepal.length", "species"),
            renames={"sepal.length": "sepal_length"},
        ),
        sink=SinkSpec(),
    )
    out = []
    pipeline.run(spark, spec, lambda d: out.append(d.toPandas()) or len(out[-1]))
    assert list(out[0].columns) == ["sepal_length", "species"]
    assert sorted(out[0]["sepal_length"]) == [5.1, 6.2]
