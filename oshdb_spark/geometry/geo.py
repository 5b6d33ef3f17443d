"""Geodesic measures — verbatim ports of the reference formulas.

Reference: /root/reference/oshdb-util/src/main/java/org/heigit/ohsome/oshdb/util/geometry/Geo.java
  * lengthOf   (Geo.java:57-135): equirectangular approximation with spheroid
    latitude correction atan(f'^1.5 * tan(lat)), R_mean = 6371000 m.
  * areaOf     (Geo.java:172-308): spherical-excess ring sum (Chamberlain &
    Duquette, JPL 07-03) with WGS84 latitude correction, R_eq = 6378137 m and
    a mid-latitude flattening factor.
  * roundness  (Geo.java:327): Polsby-Popper 4*pi*A/P^2.
  * squareness (Geo.java:373-507): Zunic-Rosin rectilinearity.
  * bearingRadians (Geo.java:342).

Numerics are IEEE-double identical to the JVM (same operation order), so
results are bit-parity with the reference, not merely approximate.
"""

from __future__ import annotations

import math

import numpy as np

from oshdb_spark.geometry.model import Geometry, is_empty

EARTH_RADIUS_MEAN = 6371000.0
EARTH_RADIUS_EQUATOR = 6378137.0
EARTH_INVERSE_FLATTENING = 298.257223563
_F = 1.0 - 1.0 / EARTH_INVERSE_FLATTENING
_SPHERE_FACT = _F ** 1.5


def _length_of_coords(coords: np.ndarray) -> float:
    """Geo.java:61-81 — vectorized over the coordinate array."""
    if len(coords) < 2:
        return 0.0
    lon = np.radians(coords[:, 0])
    lat = np.arctan(_SPHERE_FACT * np.tan(np.radians(coords[:, 1])))
    dlon = np.diff(lon) * np.cos((lat[1:] + lat[:-1]) / 2)
    dlat = np.diff(lat)
    return float(np.sqrt(dlon * dlon + dlat * dlat).sum() * EARTH_RADIUS_MEAN)


def length_of(geom: Geometry | None) -> float:
    """Approximate geodesic length in meters; 0 for non-linear geometries."""
    if geom is None or is_empty(geom):
        return 0.0
    t = geom["type"]
    if t == "LineString":
        return _length_of_coords(np.asarray(geom["coordinates"], dtype=np.float64))
    if t == "MultiLineString":
        return sum(
            _length_of_coords(np.asarray(l, dtype=np.float64))
            for l in geom["coordinates"]
        )
    if t == "GeometryCollection":
        return sum(length_of(g) for g in geom["geometries"])
    return 0.0


def _boundary_length(geom: Geometry) -> float:
    """Length of the boundary of a polygonal geometry (rings as lines)."""
    t = geom["type"]
    if t == "Polygon":
        return sum(
            _length_of_coords(np.asarray(r, dtype=np.float64))
            for r in geom["coordinates"]
        )
    if t == "MultiPolygon":
        return sum(
            _length_of_coords(np.asarray(r, dtype=np.float64))
            for rings in geom["coordinates"]
            for r in rings
        )
    return 0.0


def _ring_area(coords: np.ndarray) -> float:
    """Signed spherical-excess area of a closed ring (Geo.java:268-308).

    Positive for clockwise rings (as in the reference).
    """
    n = len(coords)
    if n <= 2:
        return 0.0
    # p1 = coords[i], p2 = coords[i+1], p3 = coords[i+2] with the reference's
    # special wrap-around indexing for i = N-2 / N-1 (Geo.java:276-291);
    # since coords[N-1] == coords[0] for closed rings this equals rolling by
    # 1 and 2 with modulo, which we replicate exactly.
    idx = np.arange(n)
    lower = idx
    middle = (idx + 1) % n
    upper = (idx + 2) % n
    p1x = coords[lower, 0]
    p2y = coords[middle, 1]
    p3x = coords[upper, 0]
    x = _F * np.tan(np.radians(p2y))
    sin_lat = x / np.sqrt(x * x + 1.0)
    area = float(np.sum(np.radians(p3x - p1x) * sin_lat))
    mid_lat = (coords[:, 1].max() + coords[:, 1].min()) / 2
    area *= (
        0.5
        * EARTH_RADIUS_EQUATOR
        * EARTH_RADIUS_EQUATOR
        * (
            1
            - 1 / EARTH_INVERSE_FLATTENING
            * math.cos(math.radians(mid_lat)) ** 2
        )
    )
    return area


def _polygon_area(rings: list) -> float:
    """Geo.java:172-179 — |shell| - sum(|holes|), floored at 0."""
    if not rings:
        return 0.0
    area = abs(_ring_area(np.asarray(rings[0], dtype=np.float64)))
    for hole in rings[1:]:
        area -= abs(_ring_area(np.asarray(hole, dtype=np.float64)))
    return max(0.0, area)


def area_of(geom: Geometry | None) -> float:
    """Approximate geodesic area in m^2; 0 for non-polygonal geometries."""
    if geom is None or is_empty(geom):
        return 0.0
    t = geom["type"]
    if t == "Polygon":
        return _polygon_area(geom["coordinates"])
    if t == "MultiPolygon":
        return sum(_polygon_area(rings) for rings in geom["coordinates"])
    if t == "GeometryCollection":
        return sum(area_of(g) for g in geom["geometries"])
    return 0.0


def roundness(geom: Geometry | None) -> float:
    """Polsby-Popper compactness (Geo.java:327-346); 1.0 = circle."""
    if geom is None or geom["type"] not in ("Polygon", "MultiPolygon"):
        return 0.0
    boundary_length = _boundary_length(geom)
    if boundary_length == 0:
        return 0.0
    return 4 * math.pi * area_of(geom) / (boundary_length * boundary_length)


def bearing_radians(from_pt, to_pt) -> float:
    """Geo.java:342-352."""
    x1 = from_pt[0] * math.pi / 180
    x2 = to_pt[0] * math.pi / 180
    y1 = from_pt[1] * math.pi / 180
    y2 = to_pt[1] * math.pi / 180
    y = math.sin(x2 - x1) * math.cos(y2)
    x = math.cos(y1) * math.sin(y2) - math.sin(y1) * math.cos(y2) * math.cos(x2 - x1)
    return (math.atan2(y, x) + 2 * math.pi) % (2 * math.pi)


# --------------------------------------------------------------------------
# Squareness (Zunic-Rosin rectilinearity), Geo.java:373-507
# --------------------------------------------------------------------------


def _length_l1(coords: np.ndarray) -> float:
    if len(coords) < 2:
        return 0.0
    lon = np.radians(coords[:, 0])
    lat = np.radians(coords[:, 1])
    dlon = np.diff(lon) * np.cos((lat[1:] + lat[:-1]) / 2)
    dlat = np.diff(lat)
    return float((np.abs(dlon) + np.abs(dlat)).sum())


def _length_l2(coords: np.ndarray) -> float:
    if len(coords) < 2:
        return 0.0
    lon = np.radians(coords[:, 0])
    lat = np.radians(coords[:, 1])
    dlon = np.diff(lon) * np.cos((lat[1:] + lat[:-1]) / 2)
    dlat = np.diff(lat)
    return float(np.sqrt(dlon * dlon + dlat * dlat).sum())


def _centroid(coords: np.ndarray) -> tuple[float, float]:
    """Line centroid (length-weighted midpoint average, as JTS getCentroid
    on a LineString)."""
    if len(coords) == 1:
        return float(coords[0, 0]), float(coords[0, 1])
    seg = coords[1:] - coords[:-1]
    seg_len = np.sqrt((seg ** 2).sum(axis=1))
    total = seg_len.sum()
    if total == 0:
        return float(coords[:, 0].mean()), float(coords[:, 1].mean())
    mid = (coords[1:] + coords[:-1]) / 2
    cx = float((mid[:, 0] * seg_len).sum() / total)
    cy = float((mid[:, 1] * seg_len).sum() / total)
    return cx, cy


def _grid_aligned_length_l1(coords: np.ndarray, angle: float) -> float:
    """Geo.java:441-470 — rotate by -angle around the centroid (with local
    cos-latitude x-scaling) then take the L1 length."""
    cos_a = math.cos(angle)
    sin_a = math.sin(angle)
    cx, cy = _centroid(coords)
    cos_cy = math.cos(cy * math.pi / 180)
    inv_cos_cy = 1 / cos_cy
    mx = (coords[:, 0] - cx) * cos_cy
    my = coords[:, 1] - cy
    rx = mx * cos_a - my * sin_a
    ry = mx * sin_a + my * cos_a
    out = np.column_stack((rx * inv_cos_cy + cx, ry + cy))
    return _length_l1(out)


def squareness(geom: Geometry | None) -> float:
    """Rectilinearity in [0, 1]; 1.0 for axis-parallel-rotatable shapes."""
    if geom is None or is_empty(geom):
        return 0.0
    t = geom["type"]
    if t == "Polygon":
        lines = [np.asarray(r, dtype=np.float64) for r in geom["coordinates"]]
    elif t == "MultiPolygon":
        lines = [
            np.asarray(r, dtype=np.float64)
            for rings in geom["coordinates"]
            for r in rings
        ]
    elif t == "LineString":
        lines = [np.asarray(geom["coordinates"], dtype=np.float64)]
    else:
        return 0.0

    min_length_l1 = math.inf
    for line in lines:
        for j in range(1, len(line)):
            angle = bearing_radians(line[j - 1], line[j])
            length_l1 = sum(_grid_aligned_length_l1(l2, angle) for l2 in lines)
            if length_l1 < min_length_l1:
                min_length_l1 = length_l1
    length_l2 = sum(_length_l2(l) for l in lines)
    if min_length_l1 == 0 or math.isinf(min_length_l1):
        return 0.0
    return 4 / (4 - math.pi) * (length_l2 / min_length_l1 - math.pi / 4)
