"""Postgres COPY sink: the reference's bulk-ingest fast path.

The reference streams rows through ``COPY <t> (<cols>) FROM STDIN
BINARY`` (reference: src/db.rs:161-240, COPY SQL at :167-171) -- PG's
fastest ingest path, well ahead of JDBC INSERT batches. Spark has no
built-in COPY writer, so this is the one custom *physical* sink this
engine needs (SURVEY.md §4.2): each partition opens its own
connection and pipes the encoded stream through ``copy_expert``.

Both COPY wire formats are implemented: TEXT (tab-separated, ``\\N``
nulls) and the reference's BINARY (PGCOPY header, int16 field count,
int32 length-prefixed big-endian fields, int16 -1 trailer -- the
format documented in the PostgreSQL manual, "Binary Format"). BINARY
skips PG's per-field text parse on ingest, which is the reference's
one stated performance feature; it needs the column types up front,
so ``CopySink(format="binary")`` takes the Spark schema and compiles
one encoder per column at plan time (fail-fast on unsupported types,
like the cast planner).

The executor connection resolves in order: an injected factory
(tests / alternative drivers), psycopg2 when the executor image has
it, else the bundled pure-stdlib v3 wire-protocol client
(``pgwire.py``) -- so the COPY path has no hard C-extension
dependency. The socket half (framing, flush boundaries,
commit/rollback) is exercised end-to-end against an in-process fake
PG wire server in tests/test_copy_socket_e2e.py. Error semantics
match the reference's fail-fast model: the first
bad row or constraint violation raises inside the partition, failing
the task and (with retries exhausted) the job (reference:
src/db.rs:202-239). Idempotence at scale: point ``table`` at a
staging table and swap atomically after the job, since a retried task
replays its whole partition.
"""

from __future__ import annotations

import io
import struct
from dataclasses import dataclass
from datetime import date, datetime, timezone
from decimal import Decimal
from typing import Any, Callable, Iterable, Iterator


def _encode_value(v: Any) -> str:
    r"""One value -> PG text-format COPY field (\N for NULL)."""
    if v is None:
        return r"\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, (bytes, bytearray)):
        return "\\\\x" + bytes(v).hex()
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    s = str(v)
    # COPY text format escapes: backslash, tab, newline, CR.
    return (
        s.replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


def encode_rows(rows: Iterable[tuple]) -> Iterator[str]:
    """Rows -> COPY TEXT lines. Pure function, unit-testable sans PG."""
    for row in rows:
        yield "\t".join(_encode_value(v) for v in row) + "\n"


# ---------------------------------------------------------------------------
# BINARY format (reference: src/db.rs:167-177 -- COPY ... FROM STDIN BINARY)
# ---------------------------------------------------------------------------

BINARY_HEADER = b"PGCOPY\n\xff\r\n\x00" + struct.pack(">ii", 0, 0)
BINARY_TRAILER = struct.pack(">h", -1)

_PG_EPOCH_DATE = date(2000, 1, 1)
_PG_EPOCH_TS = datetime(2000, 1, 1)
_NUMERIC_NEG = 0x4000
_NUMERIC_NAN = 0xC000


def _bin_bool(v: Any) -> bytes:
    return b"\x01" if v else b"\x00"


def _bin_bytes(v: Any) -> bytes:
    return bytes(v)


def _bin_text(v: Any) -> bytes:
    return str(v).encode("utf-8")


def _bin_date(v: Any) -> bytes:
    # int32 days since 2000-01-01 (PG epoch)
    return struct.pack(">i", (v - _PG_EPOCH_DATE).days)


def _bin_timestamp(v: Any) -> bytes:
    # int64 microseconds since 2000-01-01 00:00:00; tz-aware inputs are
    # normalized to UTC first (PG stores timestamptz as UTC micros too).
    if v.tzinfo is not None:
        v = v.astimezone(timezone.utc).replace(tzinfo=None)
    delta = v - _PG_EPOCH_TS
    micros = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
    return struct.pack(">q", micros)


def encode_numeric(v: Decimal) -> bytes:
    """Decimal -> PG NUMERIC binary: int16 ndigits, weight, sign,
    dscale, then ndigits base-10000 digits (PG manual, numeric.c's
    NumericVar layout). Weight = base-10000 exponent of the first
    digit; groups are aligned so the decimal point falls on a group
    boundary."""
    if v.is_nan():
        return struct.pack(">hhHh", 0, 0, _NUMERIC_NAN, 0)
    if not v.is_finite():
        raise ValueError("PG NUMERIC has no +/-Infinity binary form pre-PG14")
    sign = _NUMERIC_NEG if v < 0 else 0x0000
    t = abs(v).as_tuple()
    digits, exp = list(t.digits), t.exponent
    if exp > 0:  # e.g. 1E+3 -> shift into integer digits
        digits += [0] * exp
        exp = 0
    dscale = -exp
    int_len = len(digits) + exp  # decimal digits left of the point (may be <=0)
    pad_left = (-int_len) % 4
    digits = [0] * pad_left + digits
    digits += [0] * ((-len(digits)) % 4)
    groups = [
        digits[i] * 1000 + digits[i + 1] * 100 + digits[i + 2] * 10 + digits[i + 3]
        for i in range(0, len(digits), 4)
    ]
    weight = (int_len + pad_left) // 4 - 1
    while groups and groups[0] == 0:
        groups.pop(0)
        weight -= 1
    while groups and groups[-1] == 0:
        groups.pop()
    if not groups:  # zero: canonical ndigits=0, weight=0, positive
        return struct.pack(">hhHh", 0, 0, 0x0000, dscale)
    return struct.pack(">hhHh", len(groups), weight, sign, dscale) + struct.pack(
        f">{len(groups)}h", *groups
    )


# Spark simpleString (sans decimal precision) -> field encoder.
_BINARY_ENCODERS: dict[str, Callable[[Any], bytes]] = {
    "boolean": _bin_bool,
    "tinyint": lambda v: struct.pack(">h", v),  # PG has no int1; widen to int2
    "smallint": lambda v: struct.pack(">h", v),
    "int": lambda v: struct.pack(">i", v),
    "bigint": lambda v: struct.pack(">q", v),
    "float": lambda v: struct.pack(">f", v),
    "double": lambda v: struct.pack(">d", v),
    "string": _bin_text,
    "binary": _bin_bytes,
    "date": _bin_date,
    "timestamp": _bin_timestamp,
    "timestamp_ntz": _bin_timestamp,
    "decimal": lambda v: encode_numeric(v if isinstance(v, Decimal) else Decimal(str(v))),
}


def binary_encoders(schema) -> list[Callable[[Any], bytes]]:
    """Compile one encoder per column from a Spark StructType; raises
    at plan time on unsupported types (fail-fast, like the cast
    planner). Complex types (array/map/struct) have no COPY BINARY
    form -- flatten or serialize them first."""
    encs = []
    for f in schema.fields:
        key = f.dataType.simpleString().split("(")[0]
        enc = _BINARY_ENCODERS.get(key)
        if enc is None:
            raise TypeError(
                f"COPY BINARY: unsupported column type {f.dataType.simpleString()!r}"
                f" for column {f.name!r}"
            )
        encs.append(enc)
    return encs


def encode_rows_binary(
    rows: Iterable[tuple], encoders: list[Callable[[Any], bytes]]
) -> Iterator[bytes]:
    """Rows -> PGCOPY binary tuples (no header/trailer -- the caller
    frames the stream, since one COPY statement may span several
    buffer flushes on one connection)."""
    nfields = struct.pack(">h", len(encoders))
    null = struct.pack(">i", -1)
    for row in rows:
        parts = [nfields]
        for enc, v in zip(encoders, row):
            if v is None:
                parts.append(null)
            else:
                data = enc(v)
                parts.append(struct.pack(">i", len(data)))
                parts.append(data)
        yield b"".join(parts)


@dataclass
class CopySink:
    """foreachPartition writer using COPY ... FROM STDIN [BINARY].

    ``format="text"`` needs no type information; ``format="binary"``
    (the reference's fast path, src/db.rs:167-171) compiles per-column
    encoders from the DataFrame schema at plan time in ``write``.
    """

    conn_string: str
    table: str
    columns: tuple[str, ...]
    format: str = "text"  # "text" | "binary"
    # Injectable for tests / alternative drivers: a picklable callable
    # (conn_string) -> DB-API connection. None -> psycopg2.connect on
    # the executor. Lets the full foreachPartition path (framing,
    # flush boundaries, commit/rollback, accumulator counts) run
    # end-to-end without a live Postgres.
    connection_factory: Callable[[str], Any] | None = None

    def __post_init__(self) -> None:
        if self.format not in ("text", "binary"):
            raise ValueError(f"CopySink format must be text|binary, got {self.format!r}")

    def copy_sql(self) -> str:
        cols = ", ".join(f'"{c}"' for c in self.columns)
        suffix = " BINARY" if self.format == "binary" else ""
        return f'COPY "{self.table}" ({cols}) FROM STDIN{suffix}'

    def write(self, df) -> int:
        """Write df and return rows written. The count rides a Spark
        accumulator filled by the same foreachPartition job as the
        COPY itself -- no second scan (the Observation API does not
        resolve for RDD-backed actions, so an accumulator is the
        single-job mechanism here)."""
        sink = self  # capture a picklable copy for executors
        projected = df.select(*self.columns)
        rows_acc = df.sparkSession.sparkContext.accumulator(0)
        # Plan-time fail-fast: unsupported binary column types raise
        # here on the driver, before any task launches.
        encoders = binary_encoders(projected.schema) if self.format == "binary" else None

        def write_text_partition(rows: Iterator) -> None:
            conn = _connect(sink.conn_string, sink.connection_factory)
            buf = io.StringIO()
            n = 0
            try:
                with conn.cursor() as cur:
                    for line in encode_rows(tuple(r) for r in rows):
                        buf.write(line)
                        n += 1
                        if buf.tell() > 8 << 20:  # flush every ~8 MiB
                            buf.seek(0)
                            cur.copy_expert(sink.copy_sql(), buf)
                            buf = io.StringIO()
                    if n and buf.tell():
                        buf.seek(0)
                        cur.copy_expert(sink.copy_sql(), buf)
                conn.commit()  # all-or-nothing per partition
                rows_acc.add(n)
            except Exception:
                conn.rollback()
                raise  # fail the task -> fail-fast like the reference
            finally:
                conn.close()

        def write_binary_partition(rows: Iterator) -> None:
            conn = _connect(sink.conn_string, sink.connection_factory)
            buf = io.BytesIO()
            buf.write(BINARY_HEADER)
            n = 0
            try:
                with conn.cursor() as cur:
                    for tup in encode_rows_binary((tuple(r) for r in rows), encoders):
                        buf.write(tup)
                        n += 1
                        if buf.tell() > 8 << 20:
                            # Each copy_expert call is one complete
                            # PGCOPY stream: header + tuples + trailer.
                            buf.write(BINARY_TRAILER)
                            buf.seek(0)
                            cur.copy_expert(sink.copy_sql(), buf)
                            buf = io.BytesIO()
                            buf.write(BINARY_HEADER)
                    if n and buf.tell() > len(BINARY_HEADER):
                        buf.write(BINARY_TRAILER)
                        buf.seek(0)
                        cur.copy_expert(sink.copy_sql(), buf)
                conn.commit()
                rows_acc.add(n)
            except Exception:
                conn.rollback()
                raise
            finally:
                conn.close()

        fn = write_binary_partition if self.format == "binary" else write_text_partition
        projected.foreachPartition(fn)
        return rows_acc.value


def _connect(conn_string: str, factory: "Callable[[str], Any] | None" = None):
    """Executor-side connect: injected factory, psycopg2 when present,
    else the bundled pure-stdlib v3 wire client (pgwire.py) -- so the
    COPY fast path works on executors without the C extension."""
    if factory is not None:
        return factory(conn_string)
    try:
        import psycopg2  # preferred when the executor image has it
    except ImportError:
        from . import pgwire

        return pgwire.connect(conn_string)
    return psycopg2.connect(conn_string)
