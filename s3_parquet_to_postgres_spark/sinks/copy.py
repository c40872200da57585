"""Postgres COPY sink: the reference's bulk-ingest fast path.

The reference streams rows through ``COPY <t> (<cols>) FROM STDIN
BINARY`` (reference: src/db.rs:161-240, COPY SQL at :167-171) -- PG's
fastest ingest path, well ahead of JDBC INSERT batches. Spark has no
built-in COPY writer, so this is the one custom *physical* sink this
engine needs (SURVEY.md §4.2): each partition opens its own
connection and pipes a CSV-encoded stream through ``copy_expert``.

psycopg2 is not installed in this container; the import is gated and
the partition-level encoder is pure-Python and unit-tested on its own.
Error semantics match the reference's fail-fast model: the first bad
row or constraint violation raises inside the partition, failing the
task and (with retries exhausted) the job (reference: src/db.rs:202-239).
Idempotence at scale: point ``table`` at a staging table and swap
atomically after the job, since a retried task replays its whole
partition.
"""

from __future__ import annotations

import io
from dataclasses import dataclass
from datetime import date, datetime
from typing import Any, Iterable, Iterator


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


@dataclass
class CopySink:
    """foreachPartition writer using COPY ... FROM STDIN."""

    conn_string: str
    table: str
    columns: tuple[str, ...]

    def copy_sql(self) -> str:
        cols = ", ".join(f'"{c}"' for c in self.columns)
        return f'COPY "{self.table}" ({cols}) FROM STDIN'

    def write(self, df) -> None:
        sink = self  # capture a picklable copy for executors

        def write_partition(rows: Iterator) -> None:
            try:
                import psycopg2  # gated: not bundled in this container
            except ImportError as exc:  # pragma: no cover
                raise RuntimeError(
                    "CopySink requires psycopg2 on executors; "
                    "use JdbcSink where it is unavailable"
                ) from exc
            buf = io.StringIO()
            n = 0
            conn = psycopg2.connect(sink.conn_string)
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
            except Exception:
                conn.rollback()
                raise  # fail the task -> fail-fast like the reference
            finally:
                conn.close()

        df.select(*self.columns).foreachPartition(write_partition)
