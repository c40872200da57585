"""Connected components: iterative label propagation vs a pure-Python
union-find ground truth, plus convergence behavior."""

from __future__ import annotations

import pytest

import random

from s3_parquet_to_postgres_spark.operators.components import (
    ConvergenceError,
    connected_components,
    connected_components_star,
    dedup_groups,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


EDGES = [
    (1, 2), (2, 3),            # chain -> {1,2,3}
    (10, 11), (11, 10),        # cycle duplicate -> {10,11}
    (20, 21), (22, 21), (23, 22), (24, 23),  # long chain -> {20..24}
    (30, 30),                  # self loop -> {30}
]


def test_matches_union_find(spark):
    df = spark.createDataFrame(EDGES, ["id_a", "id_b"])
    got = {
        r["id"]: r["comp"] for r in connected_components(df).collect()
    }
    expected = _union_find(EDGES)
    assert got == expected


def test_dedup_groups_summary(spark):
    df = spark.createDataFrame(EDGES, ["id_a", "id_b"])
    rows = {r["component"]: r for r in dedup_groups(df).collect()}
    assert rows[1]["group_size"] == 3 and rows[1]["keeper_id"] == 1
    assert rows[20]["group_size"] == 5 and rows[20]["keeper_id"] == 20
    assert rows[30]["group_size"] == 1


def test_star_matches_union_find(spark):
    df = spark.createDataFrame(EDGES, ["id_a", "id_b"])
    got = {
        r["id"]: r["comp"]
        for r in connected_components_star(df).collect()
    }
    assert got == _union_find(EDGES)


def test_star_matches_union_find_random_graph(spark):
    rng = random.Random(42)
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r["id"]: r["comp"]
        for r in connected_components_star(df).collect()
    }
    assert got == _union_find(edges)


def test_star_beats_diameter_bound_on_long_chain(spark):
    # A 65-node path has diameter 64: label propagation needs ~64
    # rounds, large-star/small-star must finish in O(log^2 n) -- give
    # it 8. This is the property that makes it the 100 TB path for
    # adversarial (deep) duplicate graphs.
    chain = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(chain, ["id_a", "id_b"])
    got = {
        r["id"]: r["comp"]
        for r in connected_components_star(df, max_iter=8).collect()
    }
    assert got == {i: 0 for i in range(65)}


def test_convergence_error_on_tiny_budget(spark):
    # A 5-node chain needs >1 propagation round.
    df = spark.createDataFrame([(i, i + 1) for i in range(20, 24)],
                               ["id_a", "id_b"])
    with pytest.raises(ConvergenceError):
        connected_components(df, max_iter=1)
