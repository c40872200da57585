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


_HEX = "0123456789abcdef"


def md5_unit(col: Column | str) -> Column:
    """Content-stable uniform double in (0, 1): fold the first 8 hex
    chars of md5(cast(col as string)) into an exact 32-bit integer
    (Horner over instr digit lookups -- every step is exact integer
    arithmetic in doubles, bit-identical cross-engine), then map to
    (u_int + 0.5) / 2^32. The numeric twin of the catalog's md5
    string-bucket splits, for operators that need an arithmetic
    uniform (weighted sampling keys, acceptance-rate thresholds).
    """
    # conv(hex8, 16, 10) parses the 8-char prefix in ONE builtin --
    # bit-identical to the Horner digit fold (exact integer < 2^32,
    # so the double is exact) and ~1.8x faster per evaluation, which
    # matters because hot entries (ml_linear_score, the samplers)
    # call this per TOKEN. The DuckDB twin (sql_md5_unit) keeps the
    # explicit digit fold; both sides produce the same integer.
    return (
        F.conv(
            F.substring(F.md5(F.expr(f"cast({_expr_sql(col)} as string)")),
                        1, 8),
            16, 10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)


def _expr_sql(col: Column | str) -> str:
    """Column name (or SQL fragment) for embedding in F.expr bodies."""
    if isinstance(col, str):
        return col
    # Column -> its SQL via the jc's sql() where available; names like
    # `doc_id` round-trip fine, which is all the catalog uses.
    return col._jc.toString()  # noqa: SLF001


def sql_md5_unit(expr: str) -> str:
    """DuckDB SQL equivalent of ``md5_unit``."""
    return (
        "((list_sum(list_transform(range(1, 9), i -> "
        f"(instr('{_HEX}', substr(md5(CAST(({expr}) AS VARCHAR)), i, 1)) - 1)"
        " * power(16.0, 8 - i))) + 0.5) / 4294967296.0)"
    )


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
