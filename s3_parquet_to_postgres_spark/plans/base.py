"""QuerySpec: one declared engine capability.

Each spec pairs a Spark DataFrame program with the equivalent ANSI SQL
for the DuckDB oracle (None for ops SQL cannot express -- the driver
then records a weaker rows-only check).

Cross-engine determinism rules used throughout the catalog (the oracle
hash is order-insensitive but value-exact):

* money/quantity SUMs go through DECIMAL(18,2|4) -- exact and
  commutative, so Spark's partial-aggregation order vs DuckDB's scan
  order cannot change the result; final cast back to DOUBLE.
* per-row float arithmetic (+,-,*,/) is IEEE-identical across engines
  and needs no rounding; transcendentals (log, pow, stddev, corr) are
  rounded.
* dates/timestamps are rendered as strings (engines disagree on
  date/timestamp physical dtypes after a pandas conversion).
* derived integers are cast to BIGINT on both sides (DuckDB SUM(int)
  yields HUGEINT, year() yields BIGINT, ...).
* every query with a LIMIT has a total order (unique tiebreak column).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..catalog import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over views region/nation/.../embeddings
    doc: str = ""


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand table loader for query bodies."""
    return read_table(spark, sf_dir, name)
