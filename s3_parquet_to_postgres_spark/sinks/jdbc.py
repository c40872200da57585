"""Postgres JDBC sink + fail-fast destination validation.

The reference validates the destination before moving data: the table
must exist and every mapped column must exist in it, else abort
(reference: src/db.rs:50-54,134-145). ``validate_target_schema``
replicates that as a JDBC schema pre-flight. The write itself is
Spark's JDBC writer with batched-insert rewriting; true COPY parity
lives in copy.py.

Scale notes: JDBC fan-in is bounded with ``repartition(num_writers)``
so a 1000-executor job cannot open 1000 PG connections; writes aim at a
staging table + atomic swap when idempotence matters (Spark task
retries can replay partial batches -- the reference's serial fail-fast
model can't, so at-least-once + dedup-by-completed-log is the parity
semantics, SURVEY.md §7.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


class SchemaValidationError(RuntimeError):
    """Destination table/columns missing or of incompatible type."""


def check_destination_columns(
    table: str,
    dest_cols: list[str] | set[str] | tuple[str, ...],
    expected_columns: list[str] | tuple[str, ...],
) -> None:
    """The pure half of destination validation: every expected column
    must exist in the destination column set, else abort naming the
    gap (reference: src/db.rs:134-145 -- "Column '{}' not found").
    Matching is case-sensitive like the reference's HashMap lookup;
    PG folds unquoted identifiers to lowercase, so configs should use
    the exact stored spelling. Kept separate from the JDBC read so the
    fail-fast matrix is contract-testable with recorded schemas, no
    live PG (reference e2e: src/runner.rs:163-374)."""
    dest = set(dest_cols)
    missing = [c for c in expected_columns if c not in dest]
    if missing:
        raise SchemaValidationError(
            f"destination table {table!r} lacks column(s) {missing}; "
            f"has {sorted(dest)}"
        )


def validate_target_schema(
    spark: SparkSession,
    jdbc_url: str,
    table: str,
    expected_columns: list[str] | tuple[str, ...],
    properties: dict[str, str] | None = None,
) -> None:
    """Read the destination schema over JDBC and fail before any write
    if the table is missing or lacks an expected column."""
    reader = spark.read.format("jdbc").option("url", jdbc_url).option(
        "dbtable", table
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    try:
        dest_schema = reader.load().schema
    except Exception as exc:  # missing table, bad conn string, ...
        raise SchemaValidationError(
            f"cannot introspect destination table {table!r}: {exc}"
        ) from exc
    check_destination_columns(table, {f.name for f in dest_schema.fields},
                              expected_columns)


@dataclass
class JdbcSink:
    """Append DataFrames into a Postgres table over JDBC."""

    url: str
    table: str
    mode: str = "append"
    # Bound how many concurrent connections hit PG regardless of the
    # upstream partition count.
    num_writers: int = 8
    # reWriteBatchedInserts turns row INSERTs into multi-row statements
    # -- the closest JDBC gets to the reference's binary COPY fast path.
    properties: dict[str, str] = field(
        default_factory=lambda: {
            "driver": "org.postgresql.Driver",
            "reWriteBatchedInserts": "true",
            "batchsize": "10000",
        }
    )

    def validate(self, spark: SparkSession, columns: list[str]) -> None:
        validate_target_schema(spark, self.url, self.table, columns, self.properties)

    def write(self, df: DataFrame) -> None:
        # repartition, NOT coalesce: coalesce(n) propagates the reduced
        # parallelism through the whole narrow upstream (the scan and
        # casts would run in num_writers tasks -- a ~100x slowdown on a
        # wide cluster); repartition pays one shuffle of the final rows
        # and leaves the scan at full width while bounding concurrent
        # PG connections at num_writers.
        writer = (
            df.repartition(self.num_writers)
            .write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table)
            .mode(self.mode)
        )
        for k, v in self.properties.items():
            writer = writer.option(k, v)
        writer.save()
