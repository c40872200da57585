"""Deterministic cross-engine numeric quantization.

Why not ``CAST(x AS DECIMAL)`` or ``round(x, s)``: Spark rounds the
shortest-string representation of a double (Java
``BigDecimal.valueOf``) while DuckDB rounds the exact binary value;
they disagree on roughly 1e-4 of arbitrary doubles at scale 4 --
enough to break value-exact comparisons on every large aggregate
(measured: TPC-H Q1 sum_charge off by 3e-4 at sf0.001).

``floor(x * 10^s + 0.5)`` uses only IEEE multiply/add/floor, which are
bit-identical in any IEEE-754 engine given identical input, so the
quantized integer -- and therefore sums of it, in any order -- match
exactly. Half-up ties resolve identically everywhere because the tie
itself is computed in binary.

These are also the engine's answer to order-dependent float summation
at 100 TB: scaled-integer sums are associative/commutative, so partial
aggregation over any partitioning is exact and reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def sint(col: Column | str, scale: int) -> Column:
    """Double -> scaled integer (long): floor(x * 10^scale + 0.5)."""
    return F.floor(_col(col) * F.lit(float(10**scale)) + F.lit(0.5)).cast("long")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent exact SUM of a double at fixed scale."""
    return F.sum(sint(col, scale)).cast("double") / F.lit(float(10**scale))


def dround(col: Column | str, scale: int = 4) -> Column:
    """Deterministic cross-engine rounding of a double."""
    m = float(10**scale)
    return F.floor(_col(col) * F.lit(m) + F.lit(0.5)).cast("double") / F.lit(m)


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB SQL equivalent of ``dsum``."""
    m = 10**scale
    return (
        f"CAST(SUM(CAST(floor(({expr}) * {m} + 0.5) AS BIGINT)) AS BIGINT)"
        f" / {m}.0"
    )


def sql_dround(expr: str, scale: int = 4) -> str:
    """DuckDB SQL equivalent of ``dround``."""
    m = 10**scale
    return f"(floor(({expr}) * {m} + 0.5) / {m}.0)"
