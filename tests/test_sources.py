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


def test_scan_merge_schema_reconciles_drift(spark, tmp_path):
    # Newer files add a column; mergeSchema unions the footers and
    # reads old files' missing column as NULL. Off by default.
    import pytest as _pytest

    from s3_parquet_to_postgres_spark.sources.parquet import scan_parquet

    old = str(tmp_path / "old.parquet")
    new = str(tmp_path / "new.parquet")
    spark.createDataFrame([(1,)], "id long").coalesce(1).write.parquet(old)
    spark.createDataFrame([(2, "x")], "id long, extra string") \
        .coalesce(1).write.parquet(new)
    merged = scan_parquet(spark, [old, new], merge_schema=True)
    assert sorted(merged.columns) == ["extra", "id"]
    rows = {r["id"]: r["extra"] for r in merged.collect()}
    assert rows == {1: None, 2: "x"}
    # default: no silent union -- the scan schema is exactly ONE
    # footer's schema (whichever file Spark samples), never a merge.
    plain = scan_parquet(spark, [old, new])
    assert sorted(plain.columns) in (["id"], ["extra", "id"])
    assert set(plain.columns) != {"id", "extra"} or sorted(
        plain.columns
    ) == ["extra", "id"]  # either footer verbatim, no invented mix


def test_scan_corrupt_policy(spark, tmp_path):
    import pytest as _pytest

    from s3_parquet_to_postgres_spark.sources.parquet import scan_parquet

    good = str(tmp_path / "good.parquet")
    spark.createDataFrame([(1,), (2,)], "id long").coalesce(1).write.parquet(good)
    bad_dir = tmp_path / "bad.parquet"
    bad_dir.mkdir()
    (bad_dir / "part-00000.parquet").write_bytes(b"PAR1 this is not parquet")
    # fail (default): abort like the reference's footer-parse error
    with _pytest.raises(Exception):
        scan_parquet(spark, [good, str(bad_dir)]).count()
    # skip: batch survives, corrupt file dropped
    assert scan_parquet(spark, [good, str(bad_dir)],
                        on_corrupt="skip").count() == 2
    with _pytest.raises(ValueError):
        scan_parquet(spark, good, on_corrupt="maybe")


def test_scan_skip_refuses_silent_type_drift(spark, tmp_path):
    # With a forced schema + ignoreCorruptFiles, Spark would silently
    # drop HEALTHY files whose types drifted; scan_parquet must
    # detect the conflict and fail loudly instead.
    import pytest as _pytest

    from s3_parquet_to_postgres_spark.sources.parquet import scan_parquet

    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    spark.createDataFrame([(1,)], "id int").coalesce(1).write.parquet(a)
    spark.createDataFrame([(2**40,)], "id long").coalesce(1).write.parquet(b)
    with _pytest.raises(ValueError, match="type drift on column 'id'"):
        scan_parquet(spark, [a, b], on_corrupt="skip")


def test_scan_skip_all_corrupt_is_io_error(spark, tmp_path):
    import pytest as _pytest

    from s3_parquet_to_postgres_spark.sources.parquet import scan_parquet

    bad = tmp_path / "bad.parquet"
    bad.mkdir()
    (bad / "part-0.parquet").write_bytes(b"junk")
    with _pytest.raises(IOError):
        scan_parquet(spark, [str(bad)], on_corrupt="skip")


def test_nested_ingest_round_trip_and_boundary(spark):
    # The r10 nested-ingestion entry: the written fixture must carry
    # REAL nesting (struct-of-struct + list<struct>), the boundary
    # must reject it with both columns named, and the flattened
    # result must replay the flat-table join exactly.
    from pyspark.sql.types import ArrayType, StructType

    from s3_parquet_to_postgres_spark.operators.casts import (
        CastPlanError, require_flat,
    )
    from s3_parquet_to_postgres_spark.plans.relational import (
        _NESTED_FIXTURE_CACHE, source_nested_ingest,
    )
    from s3_parquet_to_postgres_spark.sources.parquet import scan_parquet

    sf = "/root/testdata/sf0.001"
    flat = source_nested_ingest(spark, sf)
    # fixture written + memoized for this session
    import os
    key = (spark.sparkContext.applicationId, os.path.abspath(sf))
    path = _NESTED_FIXTURE_CACHE[key]
    back = scan_parquet(spark, path)
    types = dict((f.name, f.dataType) for f in back.schema.fields)
    assert isinstance(types["order_info"], StructType)
    assert isinstance(types["order_info"]["money"].dataType, StructType)
    assert isinstance(types["lines"], ArrayType)
    assert isinstance(types["lines"].elementType, StructType)
    try:
        require_flat(back, "test")
    except CastPlanError as e:
        assert "order_info" in str(e) and "lines" in str(e)
    else:
        raise AssertionError("require_flat accepted nesting")
    # flattened row count == the flat join's
    from pyspark.sql import functions as F
    o = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    want = o.join(li, o.o_orderkey == li.l_orderkey).count()
    assert flat.count() == want
