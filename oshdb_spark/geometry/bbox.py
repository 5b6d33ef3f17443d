"""Fixed-point bounding-box value type with OSHDBBoundingBox parity.

The engine's query surface passes bounding boxes as plain degree tuples
``(minlon, minlat, maxlon, maxlat)``; this module adds the reference's
public value type on top of that convention so user code written against
OSHDB's API maps one-to-one.

Parity sources (behavior, not code):
  /root/reference/oshdb/src/main/java/org/heigit/ohsome/oshdb/OSHDBBoundingBox.java
    (fixed-point 1e7 "OSM coordinate" storage, wgs84 constructor rounding,
     7-decimal toString, value equality on the four ints)
  /root/reference/oshdb/src/main/java/org/heigit/ohsome/oshdb/OSHDBBoundable.java
    (intersects / coveredBy null-safe closed-interval predicates, isPoint,
     isValid, non-clamping intersection)
  /root/reference/oshdb/src/main/java/org/heigit/ohsome/oshdb/osm/OSMCoordinates.java
    (GEOM_PRECISION_TO_LONG = 1e7 scale)

Like the reference, intersection does NOT clamp or validate: intersecting
disjoint boxes yields an invalid (min > max) box, and ``INVALID`` is the
canonical such value.  All predicates use closed intervals on the
fixed-point ints, so boxes touching at an edge intersect.
"""

from __future__ import annotations

from dataclasses import dataclass

GEOM_PRECISION_TO_LONG = 10_000_000
GEOM_PRECISION = 1.0 / GEOM_PRECISION_TO_LONG


def to_osm(value: float) -> int:
    """Degrees -> fixed-point int.  Uses Java ``Math.round`` semantics
    (floor(x + 0.5)) as OSHDBBoundingBox.bboxWgs84Coordinates does — NOT
    OSMCoordinates.toOSM's truncating cast, which the reference reserves
    for already-exact values."""
    import math

    return int(math.floor(value * GEOM_PRECISION_TO_LONG + 0.5))


def to_wgs84(value: int) -> float:
    """Fixed-point int -> degrees (OSMCoordinates.toWgs84)."""
    return value * GEOM_PRECISION


@dataclass(frozen=True)
class BoundingBox:
    """OSHDBBoundingBox: four fixed-point (1e7) coordinates.

    Construct via :meth:`osm` (scaled ints) or :meth:`wgs84` (degrees) —
    mirroring ``bboxOSMCoordinates`` / ``bboxWgs84Coordinates``.
    """

    min_lon: int
    min_lat: int
    max_lon: int
    max_lat: int

    @staticmethod
    def osm(min_lon: int, min_lat: int, max_lon: int, max_lat: int) -> "BoundingBox":
        return BoundingBox(int(min_lon), int(min_lat), int(max_lon), int(max_lat))

    @staticmethod
    def wgs84(
        min_lon: float, min_lat: float, max_lon: float, max_lat: float
    ) -> "BoundingBox":
        return BoundingBox(
            to_osm(min_lon), to_osm(min_lat), to_osm(max_lon), to_osm(max_lat)
        )

    # -- OSHDBBoundable predicates (closed intervals, null-safe) ----------

    def intersects(self, other: "BoundingBox | None") -> bool:
        return (
            other is not None
            and self.max_lat >= other.min_lat
            and self.min_lat <= other.max_lat
            and self.max_lon >= other.min_lon
            and self.min_lon <= other.max_lon
        )

    def covered_by(self, other: "BoundingBox | None") -> bool:
        return (
            other is not None
            and self.min_lat >= other.min_lat
            and self.max_lat <= other.max_lat
            and self.min_lon >= other.min_lon
            and self.max_lon <= other.max_lon
        )

    def is_point(self) -> bool:
        return self.min_lon == self.max_lon and self.min_lat == self.max_lat

    def is_valid(self) -> bool:
        return self.min_lon <= self.max_lon and self.min_lat <= self.max_lat

    def intersection(self, other: "BoundingBox") -> "BoundingBox":
        """Componentwise max/min — deliberately no clamping (reference
        OSHDBBoundable.intersection): disjoint inputs give an invalid box."""
        return BoundingBox(
            max(self.min_lon, other.min_lon),
            max(self.min_lat, other.min_lat),
            min(self.max_lon, other.max_lon),
            min(self.max_lat, other.max_lat),
        )

    # -- conversions -------------------------------------------------------

    def degrees(self) -> tuple[float, float, float, float]:
        """(minlon, minlat, maxlon, maxlat) in degrees — the engine's
        plain-tuple bbox convention (api.area_of_interest)."""
        return (
            to_wgs84(self.min_lon),
            to_wgs84(self.min_lat),
            to_wgs84(self.max_lon),
            to_wgs84(self.max_lat),
        )

    def __str__(self) -> str:
        return "({:.7f},{:.7f},{:.7f},{:.7f})".format(*self.degrees())

    def java_hash_code(self) -> int:
        """Bit-equal to the reference's ``hashCode()`` —
        ``Objects.hash(maxLat, maxLon, minLat, minLon)``
        (OSHDBBoundingBox.java:122-124): Java's 31-multiplier array hash
        with signed-int32 overflow."""
        h = 1
        for v in (self.max_lat, self.max_lon, self.min_lat, self.min_lon):
            h = (31 * h + v) & 0xFFFFFFFF
        return h - 0x100000000 if h >= 0x80000000 else h


INVALID = BoundingBox.osm(1, 1, -1, -1)
