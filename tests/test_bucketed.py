"""Bucketed co-located join: same key + same bucket count => the join
plan has no shuffle exchange, and results match the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.catalog import read_table
from s3_parquet_to_postgres_spark.sources.bucketed import (
    bucketed_join_is_shuffle_free,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucket_db(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{loc}'")
    # Broadcast off for the whole module: these test tables are tiny,
    # and a BroadcastHashJoin has no hash-partition exchange either --
    # it would make the shuffle-free assertions vacuous.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield "bucketdb"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_bucketed_join_no_shuffle_and_correct(spark, bucket_db):
    li = read_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = read_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, f"{bucket_db}.li_b", ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"])
    write_bucketed(orders, f"{bucket_db}.ord_b", ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"])

    assert bucketed_join_is_shuffle_free(
        spark, f"{bucket_db}.li_b", f"{bucket_db}.ord_b", ["l_orderkey"]
    ), "bucketed join still shuffles"

    got = (
        spark.table(f"{bucket_db}.li_b")
        .join(spark.table(f"{bucket_db}.ord_b"), "l_orderkey")
        .count()
    )
    expected = li.join(orders, "l_orderkey").count()
    assert got == expected


def test_unbucketed_join_does_shuffle(spark, bucket_db):
    # Sanity: the diagnostic actually detects shuffles. Broadcast must
    # be off, else these small tables take a BroadcastHashJoin (which
    # legitimately has no hash-partition exchange either).
    li = read_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    li.write.mode("overwrite").saveAsTable(f"{bucket_db}.li_plain")
    li.write.mode("overwrite").saveAsTable(f"{bucket_db}.li_plain2")
    assert not bucketed_join_is_shuffle_free(
        spark, f"{bucket_db}.li_plain", f"{bucket_db}.li_plain2",
        ["l_orderkey"],
    )


def test_write_bucketed_validates(spark):
    li = read_table(spark, SF, "lineitem")
    with pytest.raises(ValueError, match="num_buckets"):
        write_bucketed(li, "x", ["l_orderkey"], 0)
