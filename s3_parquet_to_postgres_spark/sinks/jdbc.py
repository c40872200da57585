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
    dest_cols = {f.name for f in dest_schema.fields}
    missing = [c for c in expected_columns if c not in dest_cols]
    if missing:
        raise SchemaValidationError(
            f"destination table {table!r} lacks column(s) {missing}; "
            f"has {sorted(dest_cols)}"
        )


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
        writer = (
            df.repartition(min(self.num_writers, max(df.rdd.getNumPartitions(), 1)))
            .write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table)
            .mode(self.mode)
        )
        for k, v in self.properties.items():
            writer = writer.option(k, v)
        writer.save()
