"""Zonal aggregation (aggregateByGeometry) — raster/vector zonal statistics.

Reference: GeometrySplitter
(/root/reference/oshdb-api/src/main/java/org/heigit/ohsome/oshdb/api/mapreducer/GeometrySplitter.java:43-277):
snapshot/contribution rows are matched against a SMALL user-supplied zone set
(STRtree candidate lookup, bbox short-circuits, exact intersects, clip), one
output row per (zone, feature), then grouped by zone with zerofill.

Spark shape: the zone set is broadcast (it is small by construction — the
reference builds an in-memory STRtree of it); features stream past it in one
narrow stage; the groupBy(zone_key) is the only shuffle. Absent zones appear
with identity values via the left join from the zone frame (zerofill,
MapAggregator.java:880-889).

Two paths:
  * ``zonal_rect_aggregate`` — axis-aligned fixed-point rectangles, pure
    JVM predicates (whole-stage codegen; no Python at all);
  * ``zonal_polygon_aggregate`` — arbitrary polygons via the vectorized
    point-in-polygon kernel (geometry/pip.py) inside an Arrow pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zonal_rect_aggregate(
    spark: SparkSession,
    points: DataFrame,
    zones: list[tuple[str, int, int, int, int]],
    aggs: list[Column],
    lon_col: str = "lon_fp",
    lat_col: str = "lat_fp",
) -> DataFrame:
    """Aggregate points per rectangular zone (fixed-point bounds,
    half-open [min, max) like the reference's OSHDBBoundingBox intersects
    on the closed side we standardize here).

    zones: [(zone_key, minlon, minlat, maxlon, maxlat)] — small, broadcast.
    Zones with no points still appear (zerofill): aggregates must be
    null-tolerant (F.count(col) / countDistinct give 0).
    """
    zdf = spark.createDataFrame(
        zones, "zone_key string, minlon long, minlat long, maxlon long, maxlat long"
    )
    cond = (
        (F.col(lon_col) >= F.col("minlon"))
        & (F.col(lon_col) < F.col("maxlon"))
        & (F.col(lat_col) >= F.col("minlat"))
        & (F.col(lat_col) < F.col("maxlat"))
    )
    joined = F.broadcast(zdf).join(points, cond, "left")
    return joined.groupBy("zone_key").agg(*aggs)


def zonal_polygon_aggregate(
    spark: SparkSession,
    points: DataFrame,
    zones: list[tuple[str, dict]],
    aggs: list[Column],
    lon_col: str = "lon_fp",
    lat_col: str = "lat_fp",
) -> DataFrame:
    """Aggregate points per polygon zone (GeoJSON-style geometry dicts).

    Per Arrow batch: bbox prefilter (vectorized numpy compare) then exact
    crossing-number PIP (geometry/pip.py — FastPointInPolygon semantics,
    fip/FastPointInPolygon.java:25) per zone. Emits the matching zone keys
    as an array column, exploded, then grouped — the explode-candidates +
    groupBy(region) plan from SURVEY §2.3.
    """
    from oshdb_spark.geometry.model import bounds
    from oshdb_spark.geometry.pip import points_in_polygon

    zone_keys = [k for k, _ in zones]
    zone_geoms = [g for _, g in zones]
    zone_bounds = [bounds(g) for g in zone_geoms]

    @F.pandas_udf("array<string>")
    def _zones_of(lon: pd.Series, lat: pd.Series) -> pd.Series:
        x = lon.to_numpy("int64") / 1e7
        y = lat.to_numpy("int64") / 1e7
        hits = [[] for _ in range(len(x))]
        for key, geom, b in zip(zone_keys, zone_geoms, zone_bounds):
            if b is None:
                continue
            mask = (x >= b[0]) & (x <= b[2]) & (y >= b[1]) & (y <= b[3])
            if not mask.any():
                continue
            idx = np.nonzero(mask)[0]
            # boundary-inclusive: JTS intersects semantics, matching the
            # exact test GeometrySplitter applies (GeometrySplitter.java:120)
            inside = points_in_polygon(x[idx], y[idx], geom, include_boundary=True)
            for i in idx[inside]:
                hits[int(i)].append(key)
        return pd.Series(hits)

    tagged = points.withColumn(
        "zone_key", F.explode(_zones_of(F.col(lon_col), F.col(lat_col)))
    )
    agged = tagged.groupBy("zone_key").agg(*aggs)
    # zerofill absent zones
    zdf = spark.createDataFrame([(k,) for k in zone_keys], "zone_key string")
    out = zdf.join(agged, "zone_key", "left")
    for c in agged.columns:
        if c != "zone_key":
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out
