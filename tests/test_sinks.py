"""COPY-encoder unit tests (the pure-Python piece of the Postgres COPY
sink; the socket half needs a live PG, reference-style e2e, gated out
of this container)."""

from __future__ import annotations

from datetime import date, datetime

from s3_parquet_to_postgres_spark.sinks.copy import encode_rows


def enc(*row):
    return list(encode_rows([row]))[0]


def test_basic_row():
    assert enc(1, "x", 2.5) == "1\tx\t2.5\n"


def test_null_is_backslash_n():
    assert enc(None, "a") == "\\N\ta\n"


def test_bool_and_bytes():
    assert enc(True, False) == "t\tf\n"
    assert enc(b"\x01\xff") == "\\\\x01ff\n"


def test_escapes():
    assert enc("a\tb") == "a\\tb\n"
    assert enc("a\nb") == "a\\nb\n"
    assert enc("a\\b") == "a\\\\b\n"
    assert enc("a\rb") == "a\\rb\n"


def test_dates_and_timestamps():
    assert enc(date(2024, 1, 2)) == "2024-01-02\n"
    assert enc(datetime(2024, 1, 2, 3, 4, 5)) == "2024-01-02 03:04:05\n"


def test_multiple_rows_stream():
    lines = list(encode_rows([(1,), (2,)]))
    assert lines == ["1\n", "2\n"]


def test_copy_sink_fails_cleanly_without_psycopg2(spark):
    # psycopg2 isn't installed in this container; the executor-side
    # import gate must surface a clear error, not a bare ImportError.
    import pytest as _pytest

    from s3_parquet_to_postgres_spark.sinks.copy import CopySink

    sink = CopySink(conn_string="postgresql://nope", table="t",
                    columns=("a",))
    df = spark.createDataFrame([(1,), (2,)], ["a"])
    with _pytest.raises(Exception, match="psycopg2|CopySink"):
        sink.write(df)


def test_copy_sql_quotes_identifiers():
    from s3_parquet_to_postgres_spark.sinks.copy import CopySink

    sink = CopySink(conn_string="", table="my table",
                    columns=("a", "select"))
    assert sink.copy_sql() == 'COPY "my table" ("a", "select") FROM STDIN'
