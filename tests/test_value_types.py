"""1:1 ports of the reference's core value-type test suites:

  OSHDBBoundingBoxTest.java       (oshdb/src/test/java/.../util/OSHDBBoundingBoxTest.java)
  OSHDBBoundableTest.java         (oshdb/src/test/java/.../util/OSHDBBoundableTest.java)
  OSHDBTimestampIntervalTest.java (oshdb-util/src/test/java/.../time/OSHDBTimestampIntervalTest.java)
  OSHDBTemporalTest.java          (oshdb/src/test/java/.../util/OSHDBTemporalTest.java)
  CellIdTest.java                 (oshdb/src/test/java/.../util/CellIdTest.java)

The engine maps OSHDBBoundingBox -> geometry.bbox.BoundingBox (fixed-point
1e7 ints), OSHDBTimestampInterval -> timestamps.TimestampInterval,
OSHDBTemporal/OSHDBTimestamp -> plain epoch ints (compared with <, >, ==),
and CellId -> the packed (zoom << 56 | id) long of grid.xygrid.
No Spark session needed — these are pure value types.
"""

from oshdb_spark.geometry.bbox import (
    INVALID,
    GEOM_PRECISION_TO_LONG,
    BoundingBox,
    to_osm,
    to_wgs84,
)
from oshdb_spark.grid.xygrid import from_level_id, get_level_id
from oshdb_spark.timestamps import TimestampInterval


def sign(x: int) -> int:
    return (x > 0) - (x < 0)


# ---------------------------------------------------------------- bbox


class TestOSHDBBoundingBox:
    """OSHDBBoundingBoxTest.java:11-77, method-per-method."""

    def test_to_string(self):
        # testToString:13-18 — 7-decimal fixed format, comma-joined, parens
        instance = BoundingBox.wgs84(0.0, 1.0, 89.0, 90.0)
        assert str(instance) == "(0.0000000,1.0000000,89.0000000,90.0000000)"

    def test_intersect(self):
        # testIntersect:21-27 — intersection is componentwise max/min
        first = BoundingBox.wgs84(0.0, 89.0, 1.0, 90.0)
        second = BoundingBox.wgs84(0.0, 89.9, 2.0, 90.0)
        assert first.intersection(second) == BoundingBox.wgs84(0.0, 89.9, 1.0, 90.0)

    def test_getters(self):
        # testGetMinLon/MaxLon/MinLat/MaxLat:30-59 — fixed-point 1e7 ints
        instance = BoundingBox.wgs84(0.0, 89.0, 1.0, 90.0)
        assert instance.min_lon == 0
        assert instance.max_lon == 1_0000000
        assert instance.min_lat == 89_0000000
        assert instance.max_lat == 90_0000000

    def test_hash_code(self):
        # testHashCode:62-67 — Objects.hash(maxLat, maxLon, minLat, minLon)
        instance = BoundingBox.wgs84(0.0, 89.0, 1.0, 90.0)
        assert instance.java_hash_code() == 1260356225

    def test_equals(self):
        # testEquals:70-76 — value equality on the four ints
        obj = BoundingBox.wgs84(0.0, 89.0, 1.0, 90.0)
        assert obj == obj
        assert obj != ""
        assert obj == BoundingBox.wgs84(0.0, 89.0, 1.0, 90.0)
        assert obj != BoundingBox.wgs84(0.1, 89.0, 1.0, 90.0)

    def test_wgs84_rounding(self):
        # OSHDBBoundingBox.bboxWgs84Coordinates uses Math.round (floor(x+.5)),
        # so a degree value one ulp below a grid line still lands on it.
        assert to_osm(0.1) == 1_000000
        assert to_osm(-0.1) == -1_000000
        # toWgs84 multiplies by the reciprocal (OSMCoordinates.java:17-18),
        # NOT divides — bit-parity includes Java's one-ulp-off result here.
        assert to_wgs84(1_000000) == 1_000000 * (1.0 / GEOM_PRECISION_TO_LONG)
        assert to_wgs84(1_000000) != 1_000000 / GEOM_PRECISION_TO_LONG


class TestOSHDBBoundable:
    """OSHDBBoundableTest.java:12-50."""

    point = BoundingBox.osm(0, 0, 0, 0)
    box = BoundingBox.osm(-1, -1, 1, 1)

    def test_point(self):
        # testPoint:16-19
        assert self.point.is_point()
        assert not self.box.is_point()

    def test_valid(self):
        # testValid:22-28 — min > max is invalid, point/box are valid
        assert self.point.is_valid()
        assert self.box.is_valid()
        assert not BoundingBox.osm(1, 1, -1, -1).is_valid()
        assert not INVALID.is_valid()

    def test_covered(self):
        # testCovered:31-34 — null-safe: coveredBy(null) is false
        assert self.point.covered_by(self.box)
        assert not self.point.covered_by(None)

    def test_intersects(self):
        # testIntersects:37-40 — closed intervals, null-safe
        assert self.point.intersects(self.box)
        assert not self.point.intersects(None)

    def test_intersection(self):
        # testIntersection:43-49
        box2 = BoundingBox.osm(0, 0, 2, 2)
        inter = box2.intersection(self.box)
        assert inter.min_lon == 0
        assert inter.min_lat == 0
        assert inter.max_lon == 1
        assert inter.max_lat == 1

    def test_intersection_no_clamp(self):
        # reference intersection does NOT validate: disjoint boxes yield an
        # invalid (min > max) result rather than raising or clamping
        a = BoundingBox.osm(0, 0, 1, 1)
        b = BoundingBox.osm(5, 5, 6, 6)
        out = a.intersection(b)
        assert not out.is_valid()


# ---------------------------------------------------------- timestamps


class TestOSHDBTimestampInterval:
    """OSHDBTimestampIntervalTest.java:17-46 — the Comparable contract."""

    def test_compare_to(self):
        x = TimestampInterval(0, 1)
        y = TimestampInterval(0, 2)

        assert sign(x.compare_to(y)) == -1
        assert sign(y.compare_to(x)) == 1
        # antisymmetry
        assert sign(x.compare_to(y)) == -sign(y.compare_to(x))

        # transitivity
        z = TimestampInterval(1, 2)
        assert sign(y.compare_to(z)) == -1
        assert sign(x.compare_to(z)) == -1

        # consistency: x == y implies same sign vs any z
        y = TimestampInterval(0, 1)
        assert x.compare_to(y) == 0
        assert sign(x.compare_to(z)) == sign(y.compare_to(z))

    def test_interval_semantics(self):
        # OSHDBTimestampInterval.java: intersects is closed on both ends,
        # includes is half-open [from, to)
        iv = TimestampInterval(10, 20)
        assert iv.intersects(TimestampInterval(20, 30))  # touching end
        assert iv.intersects(TimestampInterval(0, 10))  # touching start
        assert not iv.intersects(TimestampInterval(21, 30))
        assert iv.includes(10)
        assert iv.includes(19)
        assert not iv.includes(20)
        assert iv.compare_against_timestamp(5) == -1
        assert iv.compare_against_timestamp(15) == 0
        assert iv.compare_against_timestamp(20) == 1

    def test_unbounded_default(self):
        # no-arg constructor = (Long.MIN_VALUE, Long.MAX_VALUE) analog
        iv = TimestampInterval()
        assert iv.includes(0)
        assert iv.includes(-(2**62))
        assert iv.intersects(TimestampInterval(5, 5))


class TestOSHDBTemporal:
    """OSHDBTemporalTest.java:12-22 — the engine's temporal scalar is a
    plain epoch int, so isBefore/isAfter/compare map to < / > / sign."""

    def test_before_after(self):
        t1, t2 = 0, 1
        assert t1 < t2  # t1.isBefore(t2)
        assert t2 > t1  # t2.isAfter(t1)
        assert sign(t1 - t1) == 0
        assert sign(t1 - t2) < 0
        assert sign(t2 - t1) > 0


# ------------------------------------------------------------- cell id


class TestCellId:
    """CellIdTest.java:10-25 plus the level-id pack round-trip the engine
    actually relies on (CellId.getLevelId/fromLevelId, CellId.java:37-53)."""

    def test_get_id_and_zoom(self):
        zoom, cid = from_level_id(get_level_id(1, 1))
        assert cid == 1
        assert zoom == 1

    def test_round_trip_extremes(self):
        for zoom, cid in [(0, 0), (15, (1 << 31) - 1), (30, (1 << 55) - 1)]:
            packed = get_level_id(zoom, cid)
            assert from_level_id(packed) == (zoom, cid)
