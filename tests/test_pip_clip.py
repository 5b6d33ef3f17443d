"""Point-in-polygon + bbox relation + clipping tests.

Scenarios modeled on the reference's fip test suite:
/root/reference/oshdb-util/src/test/java/org/heigit/ohsome/oshdb/util/geometry/fip/
(FastPointInPolygonTest, FastBboxInPolygonTest, FastBboxOutsidePolygonTest)
and CellIterator.constructClippedGeometry (CellIterator.java:417-459).
"""

import numpy as np
import pytest

from oshdb_spark.geometry import (
    area_of,
    bbox_in_polygon,
    bbox_outside_polygon,
    clip_to_bbox,
    is_empty,
    line_string,
    point,
    points_in_polygon,
    polygon,
)

# concave "C" polygon + a square with a hole
SQUARE = polygon([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]])
HOLED = polygon(
    [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
    [[[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]]],
)
CONCAVE = polygon([[0, 0], [4, 0], [4, 1], [1, 1], [1, 3], [4, 3], [4, 4], [0, 4], [0, 0]])


def pip(x, y, poly):
    return bool(points_in_polygon(np.array([x]), np.array([y]), poly)[0])


def test_points_in_polygon_basic():
    assert pip(2, 2, SQUARE)
    assert not pip(5, 2, SQUARE)
    assert not pip(-1, -1, SQUARE)


def test_points_in_polygon_hole():
    assert pip(0.5, 0.5, HOLED)  # between shell and hole
    assert not pip(2, 2, HOLED)  # inside the hole
    assert not pip(5, 5, HOLED)


def test_points_in_polygon_concave():
    assert pip(0.5, 2, CONCAVE)  # in the spine
    assert not pip(2.5, 2, CONCAVE)  # in the notch
    assert pip(2.5, 0.5, CONCAVE)  # lower arm
    assert pip(2.5, 3.5, CONCAVE)  # upper arm


def test_points_in_polygon_vectorized():
    xs = np.linspace(-1, 5, 61)
    ys = np.full_like(xs, 2.0)
    got = points_in_polygon(xs, ys, CONCAVE)
    expected = (xs > 0) & (xs < 1)  # at y=2 only the spine is inside
    # points exactly on the boundary (x=0,1) may go either way; exclude them
    interior = (np.abs(xs) > 1e-9) & (np.abs(xs - 1) > 1e-9)
    assert (got[interior] == expected[interior]).all()


def test_bbox_in_polygon():
    assert bbox_in_polygon((0.25, 0.25, 0.75, 0.75), HOLED)  # in the ring zone
    assert not bbox_in_polygon((1.5, 1.5, 2.5, 2.5), HOLED)  # inside hole
    assert not bbox_in_polygon((0.5, 0.5, 2.0, 2.0), HOLED)  # straddles hole edge
    assert not bbox_in_polygon((0.5, 0.5, 3.5, 3.5), HOLED)  # swallows the hole
    assert bbox_in_polygon((0.2, 0.2, 0.8, 0.8), CONCAVE)
    assert not bbox_in_polygon((2, 1.5, 3, 2.5), CONCAVE)  # in the notch


def test_bbox_outside_polygon():
    assert bbox_outside_polygon((5, 5, 6, 6), SQUARE)
    assert not bbox_outside_polygon((3, 3, 6, 6), SQUARE)  # overlaps corner
    assert bbox_outside_polygon((1.5, 1.5, 2.5, 2.5), HOLED)  # inside hole = outside poly
    assert not bbox_outside_polygon((-1, -1, 5, 5), SQUARE)  # bbox swallows poly
    assert bbox_outside_polygon((1.5, 1.5, 3.5, 2.5), CONCAVE)  # in the notch


# --- clipping ----------------------------------------------------------------

def test_clip_point():
    assert clip_to_bbox(point(1, 1), (0, 0, 2, 2)) == point(1, 1)
    assert is_empty(clip_to_bbox(point(3, 3), (0, 0, 2, 2)))


def test_clip_line():
    line = line_string([[-1, 1], [3, 1]])
    got = clip_to_bbox(line, (0, 0, 2, 2))
    assert got == line_string([[0, 1], [2, 1]])
    # line fully inside -> identity
    inside = line_string([[0.5, 0.5], [1.5, 1.5]])
    assert clip_to_bbox(inside, (0, 0, 2, 2)) == inside
    # line fully outside -> empty
    assert is_empty(clip_to_bbox(line_string([[5, 5], [6, 6]]), (0, 0, 2, 2)))


def test_clip_line_multiple_parts():
    # line enters and leaves the bbox twice -> MultiLineString
    zig = line_string([[-1, 1], [1, 1], [1, 5], [1.5, 5], [1.5, 1], [3, 1]])
    got = clip_to_bbox(zig, (0, 0, 2, 2))
    assert got["type"] == "MultiLineString"
    assert len(got["coordinates"]) == 2


def test_clip_polygon():
    got = clip_to_bbox(SQUARE, (2, 2, 6, 6))
    assert got["type"] == "Polygon"
    assert area_of(got) == pytest.approx(area_of(SQUARE) / 4, rel=0.01)
    # fully inside -> same area
    got2 = clip_to_bbox(SQUARE, (-1, -1, 5, 5))
    assert area_of(got2) == pytest.approx(area_of(SQUARE), rel=1e-12)
    # fully outside -> empty
    assert is_empty(clip_to_bbox(SQUARE, (10, 10, 12, 12)))


def test_clip_polygon_with_hole():
    # clip to the west half: hole is halved too
    got = clip_to_bbox(HOLED, (0, 0, 2, 4))
    assert got["type"] == "Polygon"
    assert len(got["coordinates"]) == 2
    west_shell = area_of(polygon([[0, 0], [2, 0], [2, 4], [0, 4], [0, 0]]))
    west_hole = area_of(polygon([[1, 1], [2, 1], [2, 3], [1, 3], [1, 1]]))
    assert area_of(got) == pytest.approx(west_shell - west_hole, rel=0.01)


def test_clip_empty_typed():
    # reference emits typed empty geometries (CellIterator.java:448-459)
    got = clip_to_bbox(SQUARE, (10, 10, 12, 12))
    assert got["type"] == "Polygon" and is_empty(got)
    got = clip_to_bbox(line_string([[5, 5], [6, 6]]), (0, 0, 1, 1))
    assert got["type"] == "LineString" and is_empty(got)


# ---------------------------------------------------------------------------
# convex-polygon clipping (clip_to_convex_polygon)
# ---------------------------------------------------------------------------


def test_convex_clip_triangle_line():
    from oshdb_spark.geometry.clip import clip_to_convex_polygon, is_convex_polygon
    from oshdb_spark.geometry.model import line_string, polygon

    tri = polygon([[0, 0], [10, 0], [0, 10], [0, 0]])
    assert is_convex_polygon(tri)
    # horizontal line at y=2 crosses the hypotenuse x+y=10 at x=8
    clipped = clip_to_convex_polygon(line_string([[-5, 2], [20, 2]]), tri)
    assert clipped["type"] == "LineString"
    (x1, y1), (x2, y2) = clipped["coordinates"]
    assert (x1, y1) == (0.0, 2.0)
    assert abs(x2 - 8.0) < 1e-9 and y2 == 2.0


def test_convex_clip_polygon_square():
    from oshdb_spark.geometry.clip import clip_to_convex_polygon
    from oshdb_spark.geometry.model import polygon

    clip = polygon([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
    subject = polygon([[5, 5], [15, 5], [15, 15], [5, 15], [5, 5]])
    out = clip_to_convex_polygon(subject, clip)
    xs = [p[0] for p in out["coordinates"][0]]
    ys = [p[1] for p in out["coordinates"][0]]
    assert min(xs) == 5 and max(xs) == 10 and min(ys) == 5 and max(ys) == 10


def test_convex_clip_point_and_outside():
    from oshdb_spark.geometry.clip import clip_to_convex_polygon
    from oshdb_spark.geometry.model import is_empty, point, polygon

    tri = polygon([[0, 0], [10, 0], [0, 10], [0, 0]])
    assert clip_to_convex_polygon(point(1, 1), tri)["coordinates"] == [1, 1]
    assert is_empty(clip_to_convex_polygon(point(9, 9), tri))


def test_nonconvex_rejected():
    import pytest as _pytest

    from oshdb_spark.geometry.clip import clip_to_convex_polygon, is_convex_polygon
    from oshdb_spark.geometry.model import point, polygon

    arrow = polygon([[0, 0], [10, 0], [5, 3], [10, 10], [0, 10], [0, 0]])
    assert not is_convex_polygon(arrow)
    with _pytest.raises(ValueError):
        clip_to_convex_polygon(point(1, 1), arrow)


def test_convex_clip_cw_polygon_normalized():
    from oshdb_spark.geometry.clip import clip_to_convex_polygon
    from oshdb_spark.geometry.model import point

    cw = {"type": "Polygon",
          "coordinates": [[[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]]]}
    assert clip_to_convex_polygon(point(5, 5), cw)["coordinates"] == [5, 5]
