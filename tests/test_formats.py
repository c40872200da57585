"""Source-format breadth: the engine's transforms are format-agnostic
-- the same pipeline semantics hold over CSV and JSON inputs (the
reference is parquet-only; Spark gives the rest free, but parity is
worth pinning: header/schema handling differs per format)."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.catalog import read_table
from s3_parquet_to_postgres_spark.operators.project import project_rename

SF = "/root/testdata/sf0.001"


def _check_roundtrip(spark, df, path, fmt, reader_opts):
    df.write.format(fmt).options(**reader_opts).save(str(path))
    back = (
        spark.read.format(fmt).options(**reader_opts)
        .schema(df.schema).load(str(path))
    )
    out = project_rename(back, ["o_orderkey", "o_totalprice"],
                         {"o_orderkey": "id"})
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias("s"),
    ).first()
    exp = df.agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias("s"),
    ).first()
    assert (agg["n"], agg["s"]) == (exp["n"], exp["s"])


def test_csv_roundtrip_same_semantics(spark, tmp_path):
    o = read_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    _check_roundtrip(spark, o, tmp_path / "csv", "csv", {"header": "true"})


def test_json_roundtrip_same_semantics(spark, tmp_path):
    o = read_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    _check_roundtrip(spark, o, tmp_path / "json", "json", {})


def test_orc_roundtrip_same_semantics(spark, tmp_path):
    o = read_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    _check_roundtrip(spark, o, tmp_path / "orc", "orc", {})
