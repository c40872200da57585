"""End-to-end batch pipeline tests: work-list drain -> scan -> project/
rename/cast -> sink, the reference's four e2e scenarios re-staged on
tmpdir parquet (happy path, resume, types, fail-fast --
reference: src/runner.rs:163-374)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark import pipeline
from s3_parquet_to_postgres_spark.config import (
    ConfigError,
    JobSpec,
    ProjectionSpec,
    SinkSpec,
    SourceSpec,
)
from s3_parquet_to_postgres_spark.operators.casts import CastPlanError
from s3_parquet_to_postgres_spark.operators.project import project_rename

SF = "/root/testdata/sf0.001"


def _spec(work_dir, fields, renames=None, batch=2):
    return JobSpec(
        source=SourceSpec(download_batch_size=batch, work_lists_dir=str(work_dir)),
        projection=ProjectionSpec(
            desired_fields=tuple(fields), renames=renames or {}
        ),
        sink=SinkSpec(),
    )


@pytest.fixture()
def staged(spark, tmp_path):
    """Three single-file parquet 'S3 objects' + a todo list over them."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    keys = []
    for i in range(3):
        path = tmp_path / f"obj{i}.parquet"
        orders.filter(F.col("o_orderkey") % 3 == i).coalesce(1).write.parquet(
            str(path)
        )
        keys.append(str(path))
    work = tmp_path / "work"
    work.mkdir()
    (work / "todo").write_text("\n".join(keys) + "\n")
    return tmp_path, keys, orders


def test_happy_path_drain(spark, staged, tmp_path):
    tmp, keys, orders = staged
    spec = _spec(tmp / "work", ["o_orderkey", "o_totalprice"],
                 renames={"o_orderkey": "id", "o_totalprice": None})
    written = []

    def sink(df):
        written.append(df.toPandas())
        return len(written[-1])

    results = pipeline.run(spark, spec, sink)
    # 3 keys, batch size 2 -> two batches; every key completed.
    assert [len(r.keys) for r in results] == [2, 1]
    assert sum(r.rows_written for r in results) == orders.count()
    assert written[0].columns.tolist() == ["id", "o_totalprice"]
    completed = (tmp / "work" / "completed").read_text().splitlines()
    assert sorted(completed) == sorted(keys)


def test_failed_batch_left_in_wip_then_resumes(spark, staged):
    tmp, keys, orders = staged
    spec = _spec(tmp / "work", ["o_orderkey"], batch=2)
    calls = []

    def failing_sink(df):
        if len(calls) == 1:
            raise RuntimeError("constraint violation")
        calls.append(1)
        return df.count()

    with pytest.raises(RuntimeError, match="constraint violation"):
        pipeline.run(spark, spec, failing_sink)
    # First batch committed, second stuck in wip (reference: file not
    # marked completed on failure, src/runner.rs:345-374).
    wip = (tmp / "work" / "wip").read_text().splitlines()
    assert wip == [keys[2]]

    # A fresh run (new WorkList -> resume) drains the remainder.
    results = pipeline.run(spark, spec, lambda df: df.count())
    assert [r.keys for r in results] == [[keys[2]]]


def test_unknown_desired_field_fails_before_sink(spark, staged):
    tmp, _, _ = staged
    spec = _spec(tmp / "work", ["o_orderkey", "nope"])
    with pytest.raises(Exception, match="nope"):
        pipeline.run(spark, spec, lambda df: df.count())
    # Nothing marked completed.
    assert not (tmp / "work" / "completed").exists()


def test_cast_plan_applied_and_validated(spark, staged):
    tmp, _, orders = staged
    spec = _spec(tmp / "work", ["o_orderkey", "o_orderdate"], batch=10)
    out = {}

    def sink(df):
        out["schema"] = dict(df.dtypes)
        return df.count()

    pipeline.run(spark, spec, sink,
                 column_targets={"o_orderdate": "varchar"})
    assert out["schema"]["o_orderdate"] == "string"


def test_cast_plan_bad_target_fails_at_plan_time(spark, staged):
    tmp, _, _ = staged
    spec = _spec(tmp / "work", ["o_orderkey"], batch=10)
    with pytest.raises(CastPlanError, match="unsupported destination"):
        pipeline.run(spark, spec, lambda df: df.count(),
                     column_targets={"o_orderkey": "blob"})


def test_project_rename_duplicates_and_dotted(spark):
    df = spark.createDataFrame([(1, 2.0)], ["id", "sepal.length"])
    out = project_rename(
        df, ["id", "id", "sepal.length"],
        renames={"sepal.length": "sepal_length"},
    )
    # Reference allows duplicate selection (src/parquet_ops.rs:248-259)
    # and dotted names via the alias map (src/parquet_ops.rs:272-278).
    assert out.columns == ["id", "id", "sepal_length"]


def test_config_validation():
    with pytest.raises(ConfigError, match="missing config section"):
        JobSpec.from_dict({"s3": {}})
    with pytest.raises(ConfigError, match="desired_fields"):
        JobSpec.from_dict({"s3": {}, "parquet": {"desired_fields": []}})
    spec = JobSpec.from_dict(
        {
            "s3": {"bucket": "b", "work_lists_dir": "w"},
            "parquet": {
                "desired_fields": ["a"],
                "parquet_to_db": {"a": None},
            },
        }
    )
    assert spec.source.key_to_path("k/x.parquet") == "s3a://b/k/x.parquet"
    assert spec.projection.output_name("a") == "a"
