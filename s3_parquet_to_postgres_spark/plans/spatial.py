"""Geo/spatial catalog: deterministic derived coordinates, grid-cell
density, and a grid-bucketed radius self-join (the geohash pattern).

The test tables carry no native coordinates, so each customer gets a
content-stable synthetic (lat, lon) derived from ``md5_unit`` — exact
integer arithmetic in doubles, bit-identical across Spark and DuckDB,
the same convention as the catalog's md5 split/sample keys. Latitude
is confined to [-60, 60) so a fixed-degree longitude cell keeps a
minimum metric width (cos 60° = 0.5) and grid cells never degenerate
toward the poles.

Cross-engine determinism: cell ids come from floor(lat * 0.25) /
floor(lon * 0.125) — multiplications by powers of two are exact on
the exact-dyadic derived coordinates, so bucketing is bit-stable.
Haversine output is transcendental and follows the catalog rule:
quantized via dround with repr()'d double literals for pi/180 so both
engines parse identical constants.

Scale shape (the geohash story): the radius join NEVER goes all-pairs
— points are bucketed to fixed grid cells sized >= the search radius,
one side expands to its 3x3 cell neighborhood (a narrow 9x explode,
no join), and candidates meet in a plain hash equi-join on cell id.
A declared per-cell membership cap (first 256 ids per cell) bounds
the worst hot cell exactly like the LSH band-bucket and shingle
posting-list caps elsewhere in the catalog. Declared limitation: no
antimeridian wrap (cells at lon ±180 do not join across the seam).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import dround, md5_unit, sql_dround
from ..functions.numeric import sql_md5_unit
from .base import QuerySpec, t

# pi/180 as a repr()'d literal: both engines parse the identical
# double instead of each computing radians() their own way.
_DEG = repr(math.pi / 180.0)
_EARTH_R_KM = "6371.0"

# Radius join parameters. Cell sizes are powers-of-two degrees so the
# floor() bucketing multiplications stay exact: lat cell 4 deg
# (>= 400 km everywhere), lon cell 8 deg (8 * 111.19 * cos(60) =
# 444.8 km >= 400 km at the worst latitude).
_RADIUS_KM = 400.0
_LAT_CELL_INV = 0.25  # 1 / 4 deg
_LON_CELL_INV = 0.125  # 1 / 8 deg
_MAX_CELL = 256  # declared per-cell membership cap


def _lat_expr() -> F.Column:
    return md5_unit("concat('lat:', c_custkey)") * F.lit(120.0) - F.lit(60.0)


def _lon_expr() -> F.Column:
    return md5_unit("concat('lon:', c_custkey)") * F.lit(360.0) - F.lit(180.0)


_SQL_LAT = "(" + sql_md5_unit("concat('lat:', c_custkey)") + " * 120.0 - 60.0)"
_SQL_LON = "(" + sql_md5_unit("concat('lon:', c_custkey)") + " * 360.0 - 180.0)"


def _haversine_km(lat1, lon1, lat2, lon2) -> F.Column:
    """Great-circle distance (haversine); inputs in degrees."""
    p1, p2 = lat1 * F.lit(float(_DEG)), lat2 * F.lit(float(_DEG))
    dphi = (lat2 - lat1) * F.lit(float(_DEG))
    dlmb = (lon2 - lon1) * F.lit(float(_DEG))
    a = (
        F.sin(dphi / 2) * F.sin(dphi / 2)
        + F.cos(p1) * F.cos(p2) * F.sin(dlmb / 2) * F.sin(dlmb / 2)
    )
    return F.lit(float(_EARTH_R_KM)) * 2 * F.asin(F.sqrt(a))


def _sql_haversine_km(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    p1, p2 = f"(({lat1}) * {_DEG})", f"(({lat2}) * {_DEG})"
    dphi = f"((({lat2}) - ({lat1})) * {_DEG})"
    dlmb = f"((({lon2}) - ({lon1})) * {_DEG})"
    a = (
        f"(sin({dphi} / 2) * sin({dphi} / 2)"
        f" + cos({p1}) * cos({p2}) * sin({dlmb} / 2) * sin({dlmb} / 2))"
    )
    return f"({_EARTH_R_KM} * 2 * asin(sqrt({a})))"


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat_expr().alias("lat"),
        _lon_expr().alias("lon"),
    )


_POINTS_SQL = f"""
SELECT c_custkey, {_SQL_LAT} AS lat, {_SQL_LON} AS lon FROM customer
"""


# --------------------------------------------------------------------------
# scalar_geo: per-point derived coordinates, grid cells, fixed-point
# distance (narrow map, zero shuffle)
# --------------------------------------------------------------------------

_PARIS_LAT, _PARIS_LON = "48.8566", "2.3522"


def scalar_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _points(spark, sf_dir)
    return p.select(
        "c_custkey",
        "lat",
        "lon",
        F.floor(F.col("lat") * F.lit(_LAT_CELL_INV)).cast("long").alias("cell_y"),
        F.floor(F.col("lon") * F.lit(_LON_CELL_INV)).cast("long").alias("cell_x"),
        dround(
            _haversine_km(
                F.col("lat"), F.col("lon"),
                F.lit(float(_PARIS_LAT)), F.lit(float(_PARIS_LON)),
            ),
            3,
        ).alias("dist_paris_km"),
    )


SCALAR_GEO_SQL = f"""
WITH p AS ({_POINTS_SQL})
SELECT c_custkey, lat, lon,
       CAST(floor(lat * {_LAT_CELL_INV}) AS BIGINT) AS cell_y,
       CAST(floor(lon * {_LON_CELL_INV}) AS BIGINT) AS cell_x,
       {sql_dround(_sql_haversine_km('lat', 'lon', _PARIS_LAT, _PARIS_LON), 3)}
         AS dist_paris_km
FROM p
"""


# --------------------------------------------------------------------------
# agg_spatial_density: top-25 densest grid cells (partial-aggregated
# groupBy on cell id — the spatial heavy-hitters pattern)
# --------------------------------------------------------------------------


def agg_spatial_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _points(spark, sf_dir)
    cells = p.groupBy(
        F.floor(F.col("lat") * F.lit(_LAT_CELL_INV)).cast("long").alias("cell_y"),
        F.floor(F.col("lon") * F.lit(_LON_CELL_INV)).cast("long").alias("cell_x"),
    ).agg(F.count("*").alias("n_points"))
    return cells.orderBy(
        F.desc("n_points"), F.asc("cell_y"), F.asc("cell_x")
    ).limit(25)


AGG_SPATIAL_DENSITY_SQL = f"""
WITH p AS ({_POINTS_SQL})
SELECT CAST(floor(lat * {_LAT_CELL_INV}) AS BIGINT) AS cell_y,
       CAST(floor(lon * {_LON_CELL_INV}) AS BIGINT) AS cell_x,
       count(*) AS n_points
FROM p GROUP BY 1, 2
ORDER BY n_points DESC, cell_y ASC, cell_x ASC LIMIT 25
"""


# --------------------------------------------------------------------------
# join_spatial_grid: all point pairs within RADIUS km via 3x3 grid
# neighborhood candidates + exact haversine refine
# --------------------------------------------------------------------------


def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _points(spark, sf_dir).select(
        "c_custkey", "lat", "lon",
        F.floor(F.col("lat") * F.lit(_LAT_CELL_INV)).cast("long").alias("cell_y"),
        F.floor(F.col("lon") * F.lit(_LON_CELL_INV)).cast("long").alias("cell_x"),
    )
    # Declared per-cell cap: keep the first _MAX_CELL ids per cell so a
    # pathologically hot cell cannot go quadratic (the grid analogue of
    # the LSH max_bucket_size cap). Deterministic on both engines.
    w = Window.partitionBy("cell_y", "cell_x").orderBy("c_custkey")
    p = p.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= _MAX_CELL
    ).drop("__rn")
    # One side expands to its 3x3 cell neighborhood: a narrow 9x
    # explode (no join), so candidates meet in ONE hash equi-join on
    # the cell id. Each (a, b) pair matches exactly once — at the
    # exploded cell equal to b's home cell.
    offsets = F.array(*[
        F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
        for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    ])
    a = p.select(
        F.col("c_custkey").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        F.explode(offsets).alias("o"),
        F.col("cell_y"), F.col("cell_x"),
    ).select(
        "id_a", "lat_a", "lon_a",
        (F.col("cell_y") + F.col("o.dy")).alias("jy"),
        (F.col("cell_x") + F.col("o.dx")).alias("jx"),
    )
    b = p.select(
        F.col("c_custkey").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cell_y").alias("jy"),
        F.col("cell_x").alias("jx"),
    )
    pairs = a.join(b, ["jy", "jx"]).filter(F.col("id_a") < F.col("id_b"))
    dist = dround(
        _haversine_km(
            F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
        ),
        3,
    )
    return pairs.select(
        "id_a", "id_b", dist.alias("dist_km")
    ).filter(F.col("dist_km") <= F.lit(_RADIUS_KM))


JOIN_SPATIAL_GRID_SQL = f"""
WITH p0 AS ({_POINTS_SQL}),
p1 AS (
  SELECT c_custkey, lat, lon,
         CAST(floor(lat * {_LAT_CELL_INV}) AS BIGINT) AS cell_y,
         CAST(floor(lon * {_LON_CELL_INV}) AS BIGINT) AS cell_x
  FROM p0
), p AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY cell_y, cell_x
                                 ORDER BY c_custkey) AS rn
    FROM p1
  ) WHERE rn <= {_MAX_CELL}
), offs AS (
  SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                        (1,-1),(1,0),(1,1)) o(dy, dx)
), a AS (
  SELECT p.c_custkey AS id_a, p.lat AS lat_a, p.lon AS lon_a,
         p.cell_y + o.dy AS jy, p.cell_x + o.dx AS jx
  FROM p, offs o
), b AS (
  SELECT c_custkey AS id_b, lat AS lat_b, lon AS lon_b,
         cell_y AS jy, cell_x AS jx
  FROM p
), cand AS (
  SELECT id_a, id_b,
         {sql_dround(_sql_haversine_km('lat_a', 'lon_a', 'lat_b', 'lon_b'), 3)}
           AS dist_km
  FROM a JOIN b USING (jy, jx)
  WHERE id_a < id_b
)
SELECT id_a, id_b, dist_km FROM cand WHERE dist_km <= {_RADIUS_KM}
"""


SPECS: list[QuerySpec] = [
    QuerySpec("scalar_geo", scalar_geo, SCALAR_GEO_SQL),
    QuerySpec("agg_spatial_density", agg_spatial_density,
              AGG_SPATIAL_DENSITY_SQL),
    QuerySpec("join_spatial_grid", join_spatial_grid,
              JOIN_SPATIAL_GRID_SQL),
]
