"""Projection + rename: the reference's P1/P2 operators.

Column projection keeps only desired fields in config order with
duplicates allowed (reference: src/parquet_ops.rs:44-53, dup test
:248-259); the rename map sends source names to destination names with
null meaning "keep" (reference: src/db.rs:113-132, src/config.rs:12).
In Spark both collapse into a single ``select`` of aliased columns,
which Catalyst pushes into the parquet scan as footer-level column
pruning -- the reference decodes every column and drops per row
(reference: src/runner.rs:32, src/db.rs:183-186); we never read the
dropped bytes at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.parquet import resolve_fields


def project_rename(
    df: DataFrame,
    desired_fields: list[str] | tuple[str, ...],
    renames: dict[str, str | None] | None = None,
) -> DataFrame:
    """select + alias in one pass; fails fast on unknown fields.

    Duplicate desired fields produce duplicate output columns unless
    disambiguated by the rename map, matching the reference.
    """
    renames = renames or {}
    fields = resolve_fields(df, desired_fields)
    cols = []
    for src in fields:
        dst = renames.get(src)
        out = src if dst is None else dst
        # Backticks tolerate dotted physical names (iris 'sepal.length').
        cols.append(F.col(f"`{src}`").alias(out))
    return df.select(*cols)
