"""Bounds tests for the approximate aggregates (the quality promise
behind the rows-only agg_approx entry) and the cast-plan matrix."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.catalog import read_table
from s3_parquet_to_postgres_spark.operators.casts import (
    CastPlanError,
    build_cast_plan,
)

SF = "/root/testdata/sf0.001"


def test_approx_count_distinct_within_bounds(spark):
    li = read_table(spark, SF, "lineitem")
    exact = li.select(F.countDistinct("l_partkey")).first()[0]
    approx = li.select(F.approx_count_distinct("l_partkey", 0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.05, (approx, exact)


def test_percentile_approx_brackets_exact(spark):
    li = read_table(spark, SF, "lineitem")
    approx = li.select(
        F.percentile_approx("l_extendedprice", 0.5, 10000)
    ).first()[0]
    exact = li.selectExpr("percentile(l_extendedprice, 0.5)").first()[0]
    # With accuracy 10000 on ~6k rows the sketch is near-exact.
    assert abs(approx - exact) / exact < 0.01, (approx, exact)


# ---------------------------------------------------------------------------
# Cast matrix (the reference's converter table, completed)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def typed_df(spark):
    return spark.createDataFrame(
        [
            (
                1,
                7,
                2.5,
                "2024-03-05",
                datetime.date(2024, 3, 5),
                datetime.datetime(2024, 3, 5, 6, 7, 8),
                True,
            )
        ],
        "i int, l bigint, d double, s string, dt date, ts timestamp, b boolean",
    )


def test_int_widening(spark, typed_df):
    out = build_cast_plan(typed_df, {"i": "int8", "l": "int8"})
    assert dict(out.dtypes)["i"] == "bigint"
    assert out.first()["i"] == 1


def test_date_to_string_format(spark, typed_df):
    out = build_cast_plan(typed_df, {"dt": "varchar"})
    assert out.first()["dt"] == "2024-03-05"


def test_timestamp_completed_not_null(spark, typed_df):
    # The reference writes NULL for INT64 timestamps
    # (reference: src/converters.rs:258-261); we implement the intent.
    out = build_cast_plan(typed_df, {"ts": "varchar"})
    assert out.first()["ts"] == "2024-03-05 06:07:08"
    out2 = build_cast_plan(typed_df, {"ts": "date"})
    assert out2.first()["ts"] == datetime.date(2024, 3, 5)


def test_string_parsed_to_date(spark, typed_df):
    out = build_cast_plan(typed_df, {"s": "date"})
    assert out.first()["s"] == datetime.date(2024, 3, 5)


def test_double_to_decimal(spark, typed_df):
    out = build_cast_plan(typed_df, {"d": "numeric"})
    assert dict(out.dtypes)["d"].startswith("decimal")


def test_incompatible_pair_fails_at_plan_time(spark, typed_df):
    with pytest.raises(CastPlanError, match="no conversion|not supported"):
        build_cast_plan(typed_df, {"dt": "int4"})


def test_unknown_target_column_fails(spark, typed_df):
    with pytest.raises(CastPlanError, match="unknown columns"):
        build_cast_plan(typed_df, {"nope": "int4"})
