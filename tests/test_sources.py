"""Source error paths, reference-style (not-a-parquet-file, missing
field, dotted names -- reference: src/parquet_ops.rs:87-259)."""

from __future__ import annotations

import pytest

from s3_parquet_to_postgres_spark.sources.parquet import (
    FieldResolutionError,
    resolve_fields,
    scan_parquet,
)

SF = "/root/testdata/sf0.001"


def test_scan_not_a_parquet_file(spark, tmp_path):
    bad = tmp_path / "just_contains.txt.parquet"
    bad.write_text("this is not parquet\n")
    with pytest.raises(Exception) as e:
        scan_parquet(spark, str(bad)).collect()
    assert "arquet" in str(e.value) or "footer" in str(e.value).lower()


def test_scan_missing_path(spark, tmp_path):
    with pytest.raises(Exception, match="PATH_NOT_FOUND|does not exist"):
        scan_parquet(spark, str(tmp_path / "nope.parquet")).collect()


def test_resolve_missing_field(spark):
    df = scan_parquet(spark, f"{SF}/region.parquet")
    with pytest.raises(FieldResolutionError, match="not_there"):
        resolve_fields(df, ["r_regionkey", "not_there"])


def test_resolve_duplicates_allowed(spark):
    df = scan_parquet(spark, f"{SF}/region.parquet")
    assert resolve_fields(df, ["r_name", "r_name"]) == ["r_name", "r_name"]


def test_resolve_case_sensitive(spark):
    df = scan_parquet(spark, f"{SF}/region.parquet")
    with pytest.raises(FieldResolutionError):
        resolve_fields(df, ["R_NAME"])


def test_multi_path_scan_unions_files(spark, tmp_path):
    r = scan_parquet(spark, f"{SF}/region.parquet")
    r.write.parquet(str(tmp_path / "a"))
    r.write.parquet(str(tmp_path / "b"))
    both = scan_parquet(spark, [str(tmp_path / "a"), str(tmp_path / "b")])
    assert both.count() == 2 * r.count()
