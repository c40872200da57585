"""Z-order (Morton) clustering for multi-column data skipping.

Parquet scans skip row groups whose column min/max stats exclude the
predicate. Sorting by a single column gives perfect skipping on that
column and none on others; interleaving the bits of several columns'
rank positions (the Z-order curve) gives GOOD skipping on each of
them simultaneously. At 100 TB this is the difference between reading
one-in-N files and reading everything for the second filter column.

Implementation is pure column expressions: per column, a percentile
rank quantized to ``bits`` levels (rank-based, so skew and arbitrary
types flatten out), then bit interleaving into one long sort key used
with repartitionByRange + sortWithinPartitions (range partitioning
keeps files disjoint in key space).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _quantized_rank(col: str, bits: int) -> Column:
    """Percent-rank of the column quantized to 2^bits buckets.

    CAVEAT: percent_rank over an unpartitioned window funnels every
    row through ONE task — exact and skew-proof, but only acceptable
    for frames that fit a single executor (dimension tables, samples).
    For fact-scale clustering use ``zorder_key_by_range`` below, whose
    quantizer is a pure per-row expression fed by broadcast min/max.
    """
    pr = F.percent_rank().over(Window.orderBy(F.col(col)))
    levels = (1 << bits) - 1
    return F.least(
        F.lit(levels), F.floor(pr * F.lit(float(1 << bits))).cast("long")
    )


def zorder_key_by_range(
    cols: list[str],
    bounds: dict[str, tuple[int, int]],
    bits: int = 16,
) -> Column:
    """Morton key from value-range quantization: per column,
    ``q = (v - lo) * 2^bits div (hi - lo + 1)`` (exact integer
    arithmetic over broadcastable (lo, hi) stats — ONE tiny aggregate
    to compute, no global-window rank), then bit interleave. This is
    the 100 TB path: every step is a narrow per-row expression.
    Rank-based quantization (``zorder_key``) equalizes bucket
    populations under skew; range-based assumes roughly uniform key
    ranges (true for surrogate keys). ``plans/spatial.py``'s
    ``layout_zorder_stats`` measures the file-skipping this layout
    buys and is oracle-verified against DuckDB.
    """
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(f"bits*cols must fit a long: {bits}*{len(cols)} > 63")
    lvl = 1 << bits
    qs = []
    for c in cols:
        lo, hi = bounds[c]
        # Clamp to [0, lvl-1]: stats can be stale/approximate, and an
        # out-of-range value must degrade to the edge bucket — a value
        # below lo would otherwise sign-extend through shiftright and
        # set every interleave bit; one above hi would wrap mod 2^bits
        # and scatter into an arbitrary interior bucket. The NULL
        # check comes FIRST: Spark's least/greatest SKIP null
        # arguments rather than propagate them, so an unguarded clamp
        # would silently map a NULL value (or a NULL quotient from
        # degenerate hi < lo stats) to the top bucket; NULL keys keep
        # NULL rows clustered together instead.
        qs.append(F.expr(
            f"CASE WHEN (({c} - {lo}L) * {lvl}L) div ({hi - lo + 1}L)"
            f" IS NULL THEN CAST(NULL AS BIGINT)"
            f" ELSE greatest(0L, least({lvl - 1}L,"
            f" (({c} - {lo}L) * {lvl}L) div ({hi - lo + 1}L))) END"
        ))
    key = F.lit(0).cast("long")
    for bit in range(bits):
        for i in range(len(cols)):
            out_pos = bit * len(cols) + i
            key = key + (
                F.shiftright(qs[i], bit).bitwiseAND(F.lit(1))
                * F.lit(1 << out_pos)
            ).cast("long")
    return key


def zorder_key(cols: list[str], bits: int = 16) -> "tuple[list[Column], Column]":
    """(rank columns to precompute, interleaved key over them).

    Returned separately because the ranks need a window pass before
    the key expression can reference them.
    """
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(f"bits*cols must fit a long: {bits}*{len(cols)} > 63")
    ranks = [_quantized_rank(c, bits).alias(f"__zr_{i}")
             for i, c in enumerate(cols)]
    key = F.lit(0).cast("long")
    for bit in range(bits):
        for i in range(len(cols)):
            out_pos = bit * len(cols) + i
            key = key + (
                F.shiftright(F.col(f"__zr_{i}"), bit).bitwiseAND(F.lit(1))
                * F.lit(1 << out_pos)
            ).cast("long")
    return ranks, key


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    num_files: int,
    bits: int = 16,
) -> DataFrame:
    """Return df ordered for writing as ``num_files`` z-clustered
    files: ``.write.parquet`` on the result yields files whose min/max
    ranges are tight on EVERY clustering column."""
    ranks, key = zorder_key(cols, bits)
    with_key = df.select("*", *ranks).withColumn("__zkey", key)
    return (
        with_key.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *[f"__zr_{i}" for i in range(len(cols))])
    )
