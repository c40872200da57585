"""pagerank() behaves like PageRank: hubs outrank leaves, mass is
conserved, and symmetric-regular graphs are uniform."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.operators.components import pagerank


def _edges(spark, pairs):
    sym = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "src long, dst long")


def test_star_center_dominates_and_mass_conserved(spark):
    e = _edges(spark, [(0, i) for i in range(1, 6)])
    out = {r.id: r.pagerank for r in pagerank(e).collect()}
    center, leaves = out[0], [out[i] for i in range(1, 6)]
    assert all(center > lv for lv in leaves)
    assert len(set(leaves)) == 1  # symmetric leaves tie exactly
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-4)


def test_cycle_is_uniform(spark):
    k = 6
    e = _edges(spark, [(i, (i + 1) % k) for i in range(k)])
    ranks = [r.pagerank for r in pagerank(e).collect()]
    assert len(set(ranks)) == 1
    assert ranks[0] == pytest.approx(1 / k, abs=1e-6)


def test_triangle_counts_on_known_graphs(spark):
    from s3_parquet_to_postgres_spark.operators.components import (
        triangle_counts,
    )

    def run(pairs):
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        return {r.id: r.n_triangles for r in triangle_counts(df).collect()}

    # K4: 4 triangles, every vertex in exactly 3.
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert run(k4) == {0: 3, 1: 3, 2: 3, 3: 3}
    # Square (4-cycle): no triangles.
    assert run([(0, 1), (1, 2), (2, 3), (0, 3)]) == {}
    # Triangle + pendant: pendant vertex absent, corners counted once.
    assert run([(0, 1), (1, 2), (0, 2), (2, 9)]) == {0: 1, 1: 1, 2: 1}
    # Hub star + one cross edge: exactly the one closed wedge.
    star = [(0, i) for i in range(1, 6)] + [(1, 2)]
    assert run(star) == {0: 1, 1: 1, 2: 1}


def test_iterations_converge(spark):
    # More iterations move the star ranks less: |r(12) - r(10)| is
    # far smaller than |r(2) - r(0 uniform)|.
    e = _edges(spark, [(0, i) for i in range(1, 6)] + [(1, 2)])
    r10 = {r.id: r.pagerank for r in pagerank(e, iters=10).collect()}
    r12 = {r.id: r.pagerank for r in pagerank(e, iters=12).collect()}
    r2 = {r.id: r.pagerank for r in pagerank(e, iters=2).collect()}
    uniform = 1.0 / len(r10)
    drift_late = max(abs(r12[i] - r10[i]) for i in r10)
    drift_early = max(abs(r2[i] - uniform) for i in r10)
    assert drift_late < drift_early / 10


def test_pagerank_empty_edges_returns_empty(spark):
    from s3_parquet_to_postgres_spark.operators.components import pagerank

    edges = spark.createDataFrame([], "src string, dst string")
    out = pagerank(edges)
    assert out.count() == 0
    assert out.columns == ["id", "pagerank"]
