"""Z-order clustering must measurably tighten per-file min/max ranges
on EVERY clustering column (that's the data-skipping win), while
preserving the data exactly."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.catalog import read_table
from s3_parquet_to_postgres_spark.operators.zorder import (
    cluster_by_zorder,
    zorder_key,
    zorder_key_by_range,
)

SF = "/root/testdata/sf0.001"
N_FILES = 8


def _files(path):
    return [
        os.path.join(path, f) for f in sorted(os.listdir(path))
        if f.endswith(".parquet")
    ]


def _avg_range_fraction(path, col):
    """Mean (max-min)/global_range of `col` across files; 1.0 = every
    file spans the whole domain (no skipping), ~1/N = perfect."""
    spans, gmin, gmax = [], None, None
    for f in _files(path):
        md = pq.ParquetFile(f).metadata
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        spans.append((fmin, fmax))
        gmin = fmin if gmin is None else min(gmin, fmin)
        gmax = fmax if gmax is None else max(gmax, fmax)
    rng = gmax - gmin
    return sum((b - a) / rng for a, b in spans) / len(spans)


def test_zorder_tightens_both_columns(spark, tmp_path):
    li = read_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    rand = str(tmp_path / "rand")
    zord = str(tmp_path / "zord")
    li.repartition(N_FILES).write.parquet(rand)
    cluster_by_zorder(li, ["l_orderkey", "l_partkey"], N_FILES) \
        .write.parquet(zord)

    # Same data.
    assert spark.read.parquet(zord).count() == li.count()
    # Order-independent exact checksum (plain SUM(double) varies with
    # partitioning -- see functions/numeric.py).
    checksum = F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"))
    assert (
        spark.read.parquet(zord).agg(checksum).first()[0]
        == li.agg(checksum).first()[0]
    )

    # Random layout: every file spans ~the whole domain of both cols.
    # Z-ordered: each file covers a strictly smaller slice of BOTH.
    for col in ("l_orderkey", "l_partkey"):
        r_rand = _avg_range_fraction(rand, col)
        r_z = _avg_range_fraction(zord, col)
        assert r_z < r_rand * 0.8, (col, r_z, r_rand)
        assert r_z < 0.8


def test_zorder_key_validation():
    with pytest.raises(ValueError, match="at least one column"):
        zorder_key([])
    with pytest.raises(ValueError, match="fit a long"):
        zorder_key(["a", "b", "c", "d"], bits=16)


def test_zorder_key_by_range_matches_reference_interleave(spark):
    """The pure-expression range quantizer must produce the textbook
    Morton code: independently recompute q/interleave in Python for
    every row of a small grid and compare bit-for-bit."""
    rows = [(a, b) for a in range(0, 40, 3) for b in range(5, 45, 3)]
    df = spark.createDataFrame(rows, "x: long, y: long")
    bounds = {"x": (0, 39), "y": (5, 44)}
    bits = 6
    out = df.withColumn(
        "z", zorder_key_by_range(["x", "y"], bounds, bits=bits)
    ).collect()

    def q(v, lo, hi):
        return ((v - lo) * (1 << bits)) // (hi - lo + 1)

    for r in out:
        qx, qy = q(r.x, 0, 39), q(r.y, 5, 44)
        want = 0
        for bit in range(bits):
            want |= ((qx >> bit) & 1) << (2 * bit)
            want |= ((qy >> bit) & 1) << (2 * bit + 1)
        assert r.z == want, (r.x, r.y, r.z, want)


def test_zorder_key_by_range_validation():
    with pytest.raises(ValueError, match="at least one column"):
        zorder_key_by_range([], {})
    with pytest.raises(ValueError, match="fit a long"):
        zorder_key_by_range(
            ["a", "b", "c", "d"],
            {c: (0, 1) for c in "abcd"},
            bits=16,
        )


def test_zorder_key_by_range_clamps_stale_bounds(spark):
    """Values outside the caller-supplied (lo, hi) — stale or
    approximate stats — must land in the edge buckets, never
    sign-extend (below-lo) or wrap mod 2^bits (above-hi)."""
    bits = 6
    bounds = {"x": (10, 20), "y": (10, 20)}
    df = spark.createDataFrame(
        [(-5, 15), (500, 15), (10, -99), (20, 10_000), (15, 15)],
        "x: long, y: long",
    )
    out = df.withColumn(
        "z", zorder_key_by_range(["x", "y"], bounds, bits=bits)
    ).collect()

    def q(v, lo, hi):
        raw = ((v - lo) * (1 << bits)) // (hi - lo + 1)
        return max(0, min((1 << bits) - 1, raw))

    for r in out:
        qx, qy = q(r.x, 10, 20), q(r.y, 10, 20)
        want = 0
        for bit in range(bits):
            want |= ((qx >> bit) & 1) << (2 * bit)
            want |= ((qy >> bit) & 1) << (2 * bit + 1)
        assert r.z == want, (r.x, r.y, r.z, want)
        assert 0 <= r.z < (1 << (2 * bits))


def test_zorder_key_by_range_null_values_keep_null_keys(spark):
    # Spark's least/greatest SKIP null arguments, so an unguarded
    # clamp would map NULL to the top bucket; NULL inputs must yield
    # NULL keys (nulls cluster together).
    from s3_parquet_to_postgres_spark.operators.zorder import (
        zorder_key_by_range,
    )

    df = spark.createDataFrame(
        [(1, 5), (None, 5), (3, None)], "a int, b int"
    )
    key = zorder_key_by_range(["a", "b"], {"a": (0, 10), "b": (0, 10)},
                              bits=4)
    got = [r["k"] for r in df.select(key.alias("k")).collect()]
    assert got[0] is not None
    assert got[1] is None and got[2] is None
