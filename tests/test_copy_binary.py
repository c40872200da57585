"""PG COPY BINARY encoder tests (reference: src/db.rs:167-177 uses
COPY ... FROM STDIN BINARY; this pins our wire-format encoder to the
PostgreSQL manual's "Binary Format" section without needing a live
PG: known byte vectors for every supported type, a NUMERIC round-trip
decoder under hypothesis, and stream-framing checks)."""

from __future__ import annotations

import struct
from datetime import date, datetime, timezone
from decimal import Decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from s3_parquet_to_postgres_spark.sinks.copy import (
    BINARY_HEADER,
    BINARY_TRAILER,
    CopySink,
    binary_encoders,
    encode_numeric,
    encode_rows_binary,
)


def test_header_and_trailer_bytes():
    # 11-byte signature + int32 flags 0 + int32 extension length 0
    assert BINARY_HEADER == b"PGCOPY\n\xff\r\n\x00" + b"\x00" * 8
    assert BINARY_TRAILER == b"\xff\xff"


def _encs(spark, *cols):
    df = spark.createDataFrame([cols[1]], schema=cols[0])
    return binary_encoders(df.schema)


def test_scalar_field_encodings(spark):
    df = spark.createDataFrame(
        [(True, 1, 2, 3, 4, 1.5, 2.5, "hé", b"\x00\xff")],
        "b boolean, t tinyint, s smallint, i int, l bigint, "
        "f float, d double, txt string, byt binary",
    )
    encs = binary_encoders(df.schema)
    vals = (True, 1, 2, 3, 4, 1.5, 2.5, "hé", b"\x00\xff")
    out = [e(v) for e, v in zip(encs, vals)]
    assert out[0] == b"\x01"
    assert out[1] == struct.pack(">h", 1)  # tinyint widened to int2
    assert out[2] == struct.pack(">h", 2)
    assert out[3] == struct.pack(">i", 3)
    assert out[4] == struct.pack(">q", 4)
    assert out[5] == struct.pack(">f", 1.5)
    assert out[6] == struct.pack(">d", 2.5)
    assert out[7] == "hé".encode("utf-8")
    assert out[8] == b"\x00\xff"


def test_date_and_timestamp_encodings(spark):
    df = spark.createDataFrame(
        [(date(2000, 1, 1), datetime(2000, 1, 1))], "d date, ts timestamp"
    )
    d_enc, ts_enc = binary_encoders(df.schema)
    # PG epoch is 2000-01-01 -> 0
    assert d_enc(date(2000, 1, 1)) == struct.pack(">i", 0)
    assert d_enc(date(2000, 1, 2)) == struct.pack(">i", 1)
    assert d_enc(date(1999, 12, 31)) == struct.pack(">i", -1)
    assert ts_enc(datetime(2000, 1, 1)) == struct.pack(">q", 0)
    assert ts_enc(datetime(2000, 1, 1, 0, 0, 1)) == struct.pack(">q", 1_000_000)
    # tz-aware normalizes to UTC
    aware = datetime(2000, 1, 1, 1, 0, 0, tzinfo=timezone.utc)
    assert ts_enc(aware) == struct.pack(">q", 3_600_000_000)


# -- NUMERIC ---------------------------------------------------------------

def test_numeric_known_vectors():
    # ndigits, weight, sign, dscale, digits... (base-10000)
    assert encode_numeric(Decimal("0")) == struct.pack(">hhHh", 0, 0, 0, 0)
    assert encode_numeric(Decimal("0.00")) == struct.pack(">hhHh", 0, 0, 0, 2)
    assert encode_numeric(Decimal("1")) == struct.pack(">hhHhh", 1, 0, 0, 0, 1)
    assert encode_numeric(Decimal("-1")) == struct.pack(">hhHhh", 1, 0, 0x4000, 0, 1)
    assert encode_numeric(Decimal("10000")) == struct.pack(">hhHhh", 1, 1, 0, 0, 1)
    assert encode_numeric(Decimal("1234.5678")) == struct.pack(
        ">hhHhhh", 2, 0, 0, 4, 1234, 5678
    )
    # 0.001 -> single digit 10 at weight -1, dscale 3
    assert encode_numeric(Decimal("0.001")) == struct.pack(">hhHhh", 1, -1, 0, 3, 10)
    assert encode_numeric(Decimal("NaN")) == struct.pack(">hhHh", 0, 0, 0xC000, 0)
    # trailing zero digits are stripped: 1.0000 has ndigits=1, dscale=4
    assert encode_numeric(Decimal("1.0000")) == struct.pack(">hhHhh", 1, 0, 0, 4, 1)


def decode_numeric(b: bytes) -> Decimal:
    """Inverse of encode_numeric, for round-trip testing."""
    ndigits, weight, sign, dscale = struct.unpack_from(">hhHh", b)
    digits = struct.unpack_from(f">{ndigits}h", b, 8)
    if sign == 0xC000:
        return Decimal("NaN")
    total = Decimal(0)
    for i, d in enumerate(digits):
        total += Decimal(d) * (Decimal(10000) ** (weight - i))
    if sign == 0x4000:
        total = -total
    return total.quantize(Decimal(1).scaleb(-dscale)) if dscale else total


@settings(max_examples=300, deadline=None)
@given(
    st.decimals(
        allow_nan=False,
        allow_infinity=False,
        min_value=Decimal("-1e20"),
        max_value=Decimal("1e20"),
        places=6,
    )
)
def test_numeric_round_trip(d):
    assert decode_numeric(encode_numeric(d)) == d


def test_numeric_rejects_infinity():
    with pytest.raises(ValueError):
        encode_numeric(Decimal("Infinity"))


# -- tuple framing ---------------------------------------------------------

def test_tuple_framing_with_nulls(spark):
    df = spark.createDataFrame([(1, "a")], "i int, s string")
    encs = binary_encoders(df.schema)
    tuples = list(encode_rows_binary([(1, "a"), (None, None)], encs))
    assert tuples[0] == (
        struct.pack(">h", 2)
        + struct.pack(">i", 4) + struct.pack(">i", 1)
        + struct.pack(">i", 1) + b"a"
    )
    assert tuples[1] == struct.pack(">h", 2) + struct.pack(">i", -1) * 2


def test_unsupported_type_fails_at_plan_time(spark):
    df = spark.createDataFrame([([1, 2],)], "a array<int>")
    with pytest.raises(TypeError, match="array<int>.*'a'"):
        binary_encoders(df.schema)


def test_decimal_column_encoder(spark):
    df = spark.createDataFrame([(Decimal("12.34"),)], "d decimal(10,2)")
    (enc,) = binary_encoders(df.schema)
    assert enc(Decimal("12.34")) == struct.pack(">hhHhhh", 2, 0, 0, 2, 12, 3400)


def test_binary_sink_copy_sql_and_plan_time_gate(spark):
    sink = CopySink(conn_string="", table="t", columns=("a", "b"),
                    format="binary")
    assert sink.copy_sql() == 'COPY "t" ("a", "b") FROM STDIN BINARY'
    with pytest.raises(ValueError):
        CopySink(conn_string="", table="t", columns=("a",), format="csv")
    # unsupported column type raises on the driver, before any task
    df = spark.createDataFrame([({"k": 1},)], "a map<string,int>") \
        .withColumn("b", df_lit_one())
    with pytest.raises(TypeError, match="map<string,int>"):
        CopySink(conn_string="", table="t", columns=("a", "b"),
                 format="binary").write(df)


def df_lit_one():
    from pyspark.sql import functions as F

    return F.lit(1)


# -- full-row hypothesis round trip (all supported types) -------------------

def parse_tuples(blob: bytes, nfields: int):
    """Parse PGCOPY tuple stream (no header/trailer) back to rows of
    raw field bytes (None for NULL)."""
    rows, pos = [], 0
    while pos < len(blob):
        (nf,) = struct.unpack_from(">h", blob, pos)
        assert nf == nfields
        pos += 2
        row = []
        for _ in range(nf):
            (ln,) = struct.unpack_from(">i", blob, pos)
            pos += 4
            if ln < 0:
                row.append(None)
            else:
                row.append(blob[pos:pos + ln])
                pos += ln
        rows.append(row)
    return rows


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.booleans()),
            st.one_of(st.none(), st.integers(-2**31, 2**31 - 1)),
            st.one_of(st.none(), st.integers(-2**63, 2**63 - 1)),
            st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
            st.one_of(st.none(), st.text(max_size=30)),
            st.one_of(st.none(), st.binary(max_size=20)),
            st.one_of(
                st.none(),
                st.dates(date(1900, 1, 1), date(2200, 1, 1)),
            ),
        ),
        max_size=10,
    )
)
def test_binary_rows_round_trip(rows):
    encs = [
        lambda v: b"\x01" if v else b"\x00",       # boolean
        lambda v: struct.pack(">i", v),            # int
        lambda v: struct.pack(">q", v),            # bigint
        lambda v: struct.pack(">d", v),            # double
        lambda v: str(v).encode("utf-8"),          # string
        bytes,                                     # binary
        lambda v: struct.pack(">i", (v - date(2000, 1, 1)).days),  # date
    ]
    blob = b"".join(encode_rows_binary(rows, encs))
    parsed = parse_tuples(blob, 7)
    assert len(parsed) == len(rows)
    for orig, got in zip(rows, parsed):
        b, i, l, d, s, by, dt = orig
        assert (got[0] is None) == (b is None)
        if b is not None:
            assert got[0] == (b"\x01" if b else b"\x00")
        if i is not None:
            assert struct.unpack(">i", got[1])[0] == i
        if l is not None:
            assert struct.unpack(">q", got[2])[0] == l
        if d is not None:
            assert struct.unpack(">d", got[3])[0] == d
        if s is not None:
            assert got[4].decode("utf-8") == s
        if by is not None:
            assert got[5] == by
        if dt is not None:
            assert date(2000, 1, 1) + __import__("datetime").timedelta(
                days=struct.unpack(">i", got[6])[0]
            ) == dt
