"""Engine-level properties for the spatial and mining families, beyond
the DuckDB oracle parity that test_oracle_parity.py already replays:

* join_spatial_grid vs brute-force all-pairs haversine — the grid
  candidate generator must find EVERY pair within the radius (cells
  sized >= radius guarantee the 3x3 neighborhood covers the ball).
* ml_grid_cluster maximality — no two distinct clusters may contain
  adjacent dense cells (otherwise components under-merged).
* text_textrank — PageRank mass conservation (scores sum to ~1).
* ml_logreg_train — gradient descent actually descends: the fitted
  weights' training logloss beats the all-zero start.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from s3_parquet_to_postgres_spark.plans import spatial as SP
from s3_parquet_to_postgres_spark.plans.mining import (
    ml_logreg_train, text_textrank,
)

SF = "/root/testdata/sf0.001"


def _coords(spark):
    return {
        r["c_custkey"]: (r["lat"], r["lon"])
        for r in SP._points(spark, SF).collect()
    }


def _haversine(a, b):
    lat1, lon1 = a
    lat2, lon2 = b
    rad = math.pi / 180.0
    p1, p2 = lat1 * rad, lat2 * rad
    dphi, dlmb = (lat2 - lat1) * rad, (lon2 - lon1) * rad
    h = (
        math.sin(dphi / 2) ** 2
        + math.cos(p1) * math.cos(p2) * math.sin(dlmb / 2) ** 2
    )
    return 6371.0 * 2 * math.asin(math.sqrt(h))


def test_spatial_grid_matches_bruteforce(spark):
    pts = _coords(spark)
    ids = sorted(pts)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = math.floor(_haversine(pts[a], pts[b]) * 1000 + 0.5) / 1000
            if d <= SP._RADIUS_KM:
                want.add((a, b))
    got = {
        (r["id_a"], r["id_b"])
        for r in SP.join_spatial_grid(spark, SF).collect()
    }
    # sf0.001 has 150 points — every cell is far below the 256 cap, so
    # the capped grid join must equal the uncapped brute force exactly.
    assert got == want
    assert want, "fixture produced no in-radius pairs; test is vacuous"


def test_grid_cluster_components_are_maximal(spark):
    from s3_parquet_to_postgres_spark.plans.spatial import (
        _LAT_CELL_INV, _LON_CELL_INV, _MIN_PTS,
    )

    pts = _coords(spark)
    cells: dict[tuple[int, int], int] = {}
    for lat, lon in pts.values():
        key = (math.floor(lat * _LAT_CELL_INV), math.floor(lon * _LON_CELL_INV))
        cells[key] = cells.get(key, 0) + 1
    dense = {k for k, n in cells.items() if n >= _MIN_PTS}

    rows = SP.ml_grid_cluster(spark, SF).collect()
    # Cluster labels decode back to (cy, cx): cid = (cy+64)*4096+(cx+64).
    assert sum(r["n_cells"] for r in rows) == len(dense)
    assert sum(r["n_points"] for r in rows) == sum(
        cells[k] for k in dense
    )
    # Maximality: the label cells of two different clusters are never
    # 8-adjacent... stronger: recompute components brute-force and
    # compare the (size-sorted) cluster profile.
    parent = {k: k for k in dense}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (cy, cx) in dense:
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                nb = (cy + dy, cx + dx)
                if nb != (cy, cx) and nb in dense:
                    parent[find((cy, cx))] = find(nb)
    sizes: dict[tuple[int, int], int] = {}
    for k in dense:
        sizes[find(k)] = sizes.get(find(k), 0) + 1
    assert sorted(sizes.values()) == sorted(r["n_cells"] for r in rows)


def _geohash6_ref(lat: float, lon: float) -> str:
    """Independent textbook geohash encoder (bisection, lon first)."""
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
    bits, out, even = 0, [], True
    ch = 0
    for _ in range(30):
        rng, v = (lon_rng, lon) if even else (lat_rng, lat)
        mid = (rng[0] + rng[1]) / 2
        ch = ch << 1
        if v >= mid:
            ch |= 1
            rng[0] = mid
        else:
            rng[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(alpha[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_geohash_matches_reference_encoder(spark):
    rows = SP.scalar_geohash(spark, SF).collect()
    pts = _coords(spark)
    assert len(rows) == len(pts)
    for r in rows:
        lat, lon = pts[r["c_custkey"]]
        assert r["geohash6"] == _geohash6_ref(lat, lon), (
            r["c_custkey"], lat, lon, r["geohash6"]
        )


def test_geohash_interleave_hypothesis():
    # Engine-independent check of the bit-interleave + base-32 SQL on
    # arbitrary quantized cells: DuckDB evaluates the same generated
    # expression Spark runs, compared against a direct Python
    # interleave. (The fixture-point test above ties the arithmetic to
    # the textbook bisection encoder; random *continuous* coords can
    # legitimately differ from bisection within one float ulp of a
    # cell boundary, so here we drive the integer cells directly.)
    import duckdb
    from hypothesis import given, settings, strategies as st

    from s3_parquet_to_postgres_spark.plans.spatial import (
        _GH_ALPHA, _GH_DUCK_G, _GH_MAX, _gh_chars,
    )

    con = duckdb.connect()
    chars = " || ".join(_gh_chars("g"))

    def ref(lon_n: int, lat_n: int) -> str:
        g = 0
        for k in range(15):
            g |= ((lon_n >> k) & 1) << (2 * k + 1)
            g |= ((lat_n >> k) & 1) << (2 * k)
        return "".join(
            _GH_ALPHA[(g >> (25 - 5 * i)) & 31] for i in range(6)
        )

    @settings(max_examples=200, deadline=None)
    @given(
        lon_n=st.integers(min_value=0, max_value=_GH_MAX),
        lat_n=st.integers(min_value=0, max_value=_GH_MAX),
    )
    def check(lon_n, lat_n):
        row = con.execute(
            f"""
            WITH q AS (SELECT CAST({lon_n} AS BIGINT) AS lon_n,
                              CAST({lat_n} AS BIGINT) AS lat_n),
            g AS (SELECT {_GH_DUCK_G} AS g FROM q)
            SELECT {chars} FROM g
            """
        ).fetchone()
        assert row[0] == ref(lon_n, lat_n), (lon_n, lat_n, row[0])

    check()


def test_textrank_mass_conservation(spark):
    rows = text_textrank(spark, SF).collect()
    assert 0 < len(rows) <= 25
    total = sum(r["pagerank"] for r in rows)
    # Top-25 of a ~30-word vocabulary carries nearly all the mass; the
    # full distribution sums to 1 by construction.
    assert 0.8 < total <= 1.0 + 1e-6
    assert rows == sorted(
        rows, key=lambda r: (-r["pagerank"], r["token"])
    )


def test_logreg_training_descends(spark):
    import duckdb

    w = {
        r["bucket"]: r["weight"]
        for r in ml_logreg_train(spark, SF).collect()
    }
    assert any(abs(v) > 0 for v in w.values()), "no weight moved"

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    from s3_parquet_to_postgres_spark.functions.numeric import sql_md5_unit
    feats = con.execute(f"""
        WITH toks AS (
          SELECT doc_id, lang, unnest(
            list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                        tk -> tk != '')) AS tok
          FROM documents
        )
        SELECT doc_id,
               max(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS y,
               list(CAST(floor({sql_md5_unit('tok')} * 16) AS INT)) AS bks
        FROM toks GROUP BY doc_id
    """).fetchall()

    def logloss(weights):
        tot = 0.0
        for _, y, bks in feats:
            m = sum(weights.get(b, 0.0) for b in bks)
            # stable log(1 + exp(-z*m)) with z in {-1, +1}
            z = 1.0 if y else -1.0
            x = -z * m
            tot += x + math.log1p(math.exp(-x)) if x > 0 else math.log1p(
                math.exp(x)
            )
        return tot / len(feats)

    assert logloss(w) < logloss({}) - 1e-4
