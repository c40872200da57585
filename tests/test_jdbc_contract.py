"""Contract tests for the PG-facing fail-fast validation, driven with
recorded JDBC schemas instead of a live Postgres (the reference's e2e
runs against real PG + localstack, src/runner.rs:163-374 and
src/test_setup.rs:433-456; this container has neither, so the
fail-fast matrix of src/db.rs:50-54,134-145,385-502 is pinned at the
contract seam instead)."""

from __future__ import annotations

import pytest

from s3_parquet_to_postgres_spark.sinks.jdbc import (
    JdbcSink,
    SchemaValidationError,
    check_destination_columns,
    validate_target_schema,
)

# A recorded destination schema, as a JDBC introspection of the
# reference's users example table would return it
# (reference: README.md config example; src/db.rs:385-502 tests).
USERS_COLS = ["id", "email", "age", "signup_date"]


def test_all_expected_columns_present_passes():
    check_destination_columns("users", USERS_COLS, ["id", "email"])
    check_destination_columns("users", USERS_COLS, USERS_COLS)


def test_missing_column_aborts_naming_it():
    # reference: src/db.rs:134-145 "Column '{}' not found in table"
    with pytest.raises(SchemaValidationError, match=r"\['nickname'\]"):
        check_destination_columns("users", USERS_COLS, ["id", "nickname"])


def test_multiple_missing_columns_all_named():
    with pytest.raises(SchemaValidationError, match="a.*b") as ei:
        check_destination_columns("users", USERS_COLS, ["a", "b", "id"])
    assert "users" in str(ei.value)


def test_case_sensitive_like_reference_hashmap():
    # PG folds unquoted identifiers to lowercase; the reference's
    # column lookup is a case-sensitive HashMap hit. 'ID' != 'id'.
    with pytest.raises(SchemaValidationError):
        check_destination_columns("users", USERS_COLS, ["ID"])


def test_empty_expected_is_vacuously_valid():
    check_destination_columns("users", USERS_COLS, [])


def test_unreachable_or_missing_table_wraps_to_schema_error(spark):
    # The JDBC read fails (no PG driver / no server here) and must
    # surface as SchemaValidationError naming the table -- the
    # missing-table abort path (reference: src/db.rs:50-54).
    with pytest.raises(SchemaValidationError, match="'nope'"):
        validate_target_schema(
            spark, "jdbc:postgresql://localhost:1/void", "nope", ["id"]
        )


def test_jdbc_sink_validate_delegates(spark):
    sink = JdbcSink(url="jdbc:postgresql://localhost:1/void", table="t")
    with pytest.raises(SchemaValidationError):
        sink.validate(spark, ["id"])
