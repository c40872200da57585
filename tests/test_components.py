"""Connected components: iterative label propagation vs a pure-Python
union-find ground truth, plus convergence behavior."""

from __future__ import annotations

import pytest

from s3_parquet_to_postgres_spark.operators.components import (
    ConvergenceError,
    connected_components,
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


def test_convergence_error_on_tiny_budget(spark):
    # A 5-node chain needs >1 propagation round.
    df = spark.createDataFrame([(i, i + 1) for i in range(20, 24)],
                               ["id_a", "id_b"])
    with pytest.raises(ConvergenceError):
        connected_components(df, max_iter=1)
