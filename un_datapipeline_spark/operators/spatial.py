"""Spatial operators: grid-bucketed radius join over synthetic
coordinates.

The testdata tables carry no geo columns, so coordinates are derived
DETERMINISTICALLY from the keys (a 0.1°-granular city grid) — the same
construction in the oracle, so the join itself is hash-verified.  What
matters is the plan shape: a geo radius join is never a cross join —
points are bucketed into 1° grid cells, candidate pairs come from an
equi-join of each point's cell against its 3×3 cell neighborhood, and
only candidates pay the haversine.  At 100 TB that's the standard
spatial-join recipe (geohash/S2 cell join + exact refine), with
shuffle volume proportional to points × 9, not points²."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from un_datapipeline_spark.registry import register
from un_datapipeline_spark.tables import load_table

# Derived city-grid coordinates: lat in [40, 52), lon in [-8, 8), on a
# 0.1° lattice.  Multipliers are co-prime with the moduli so keys spread
# uniformly; the 0.1° granularity keeps pair distances far from the
# radius boundary relative to float ulps.
_CUST_LAT = "(40.0 + ((c_custkey * 7) % 120) / 10.0)"
_CUST_LON = "(-8.0 + ((c_custkey * 13) % 160) / 10.0)"
_SUPP_LAT = "(40.0 + ((s_suppkey * 11) % 120) / 10.0)"
_SUPP_LON = "(-8.0 + ((s_suppkey * 17) % 160) / 10.0)"

_RADIUS_KM = 25.0

# Haversine with the mean-earth radius; identical literal formula on
# both engines so the doubles agree to the last ulp of libm.
_HAV = (
    "2.0 * 6371.0088 * asin(sqrt("
    "pow(sin(radians({lat2} - {lat1}) / 2), 2) + "
    "cos(radians({lat1})) * cos(radians({lat2})) * "
    "pow(sin(radians({lon2} - {lon1}) / 2), 2)))"
)

_GEO_ORACLE = f"""
WITH c AS (
  SELECT c_custkey, {_CUST_LAT} AS clat, {_CUST_LON} AS clon,
         CAST(floor({_CUST_LAT}) AS BIGINT) AS cell_lat,
         CAST(floor({_CUST_LON}) AS BIGINT) AS cell_lon
  FROM customer
), s AS (
  SELECT s_suppkey, {_SUPP_LAT} AS slat, {_SUPP_LON} AS slon,
         CAST(floor({_SUPP_LAT}) AS BIGINT) AS cell_lat,
         CAST(floor({_SUPP_LON}) AS BIGINT) AS cell_lon
  FROM supplier
), s9 AS (
  SELECT s.*, s.cell_lat + dlat.d AS jlat, s.cell_lon + dlon.d AS jlon
  FROM s, (VALUES (-1), (0), (1)) dlat(d), (VALUES (-1), (0), (1)) dlon(d)
), pairs AS (
  SELECT c.c_custkey, s9.s_suppkey,
         {_HAV.format(lat1="c.clat", lon1="c.clon", lat2="s9.slat", lon2="s9.slon")}
           AS dist_km
  FROM c JOIN s9 ON c.cell_lat = s9.jlat AND c.cell_lon = s9.jlon
)
SELECT c_custkey, s_suppkey, ROUND(dist_km, 4) AS dist_km
FROM pairs WHERE dist_km <= {_RADIUS_KM}
"""


@register("join_geo_radius", oracle=_GEO_ORACLE, tier="T2")
def join_geo_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join: every (customer, supplier) pair within 25 km, via
    grid-cell bucketing — suppliers are replicated into their 1° cell
    plus the 8 neighbors (the radius fits inside one cell at these
    latitudes), candidates come from a cell equi-join, and the exact
    haversine refines.  The equi-join keeps Catalyst on a hash/sort
    join; the naive theta formulation (cross join + distance predicate)
    is BroadcastNestedLoop and dies at scale.  Replication factor is a
    constant 9; for denser planets shrink the cell and add a
    cell-count skew audit (the salting machinery of join_skew_salted
    applies unchanged)."""
    c = load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey",
        f"{_CUST_LAT} AS clat",
        f"{_CUST_LON} AS clon",
        f"CAST(floor({_CUST_LAT}) AS BIGINT) AS cell_lat",
        f"CAST(floor({_CUST_LON}) AS BIGINT) AS cell_lon",
    )
    s = load_table(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey",
        f"{_SUPP_LAT} AS slat",
        f"{_SUPP_LON} AS slon",
        f"CAST(floor({_SUPP_LAT}) AS BIGINT) AS cell_lat",
        f"CAST(floor({_SUPP_LON}) AS BIGINT) AS cell_lon",
    )
    s9 = s.select(
        "s_suppkey",
        "slat",
        "slon",
        F.explode(
            F.expr("array(cell_lat - 1, cell_lat, cell_lat + 1)")
        ).alias("jlat"),
        "cell_lon",
    ).select(
        "s_suppkey",
        "slat",
        "slon",
        "jlat",
        F.explode(
            F.expr("array(cell_lon - 1, cell_lon, cell_lon + 1)")
        ).alias("jlon"),
    )
    pairs = c.join(
        s9,
        (c.cell_lat == s9.jlat) & (c.cell_lon == s9.jlon),
    ).selectExpr(
        "c_custkey",
        "s_suppkey",
        _HAV.format(lat1="clat", lon1="clon", lat2="slat", lon2="slon")
        + " AS dist_km",
    )
    return pairs.filter(F.col("dist_km") <= _RADIUS_KM).select(
        "c_custkey", "s_suppkey", F.round("dist_km", 4).alias("dist_km")
    )
