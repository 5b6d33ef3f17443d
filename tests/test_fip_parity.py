"""1:1 port of the reference's FastBboxInPolygon / FastBboxOutsidePolygon
scenario batteries against geometry/pip.py.

Sources (every assertion below mirrors one assert there, same coordinates):
  /root/reference/oshdb-util/src/test/java/org/heigit/ohsome/oshdb/util/geometry/fip/FastBboxInPolygonTest.java
  /root/reference/oshdb-util/src/test/java/org/heigit/ohsome/oshdb/util/geometry/fip/FastBboxOutsidePolygonTest.java
Fixtures: FastPointInPolygonTest.createPolygon (reversed-Σ concave),
createPolygonWithHole, createMultiPolygon, and FastBboxInPolygonTest.
createSquareSquareMultiPolygon (four squares arranged in a square).
"""

from __future__ import annotations

import pytest

from oshdb_spark.geometry.pip import bbox_in_polygon, bbox_outside_polygon
from tests.test_polyclip import both_multipolygon, sigma_polygon, square_with_hole


def square_square_multipolygon():
    def rect(x0, y0, x1, y1):
        return [[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]]

    return {
        "type": "MultiPolygon",
        "coordinates": [
            rect(-1.5, -1.5, -0.5, -0.5),
            rect(0.5, -1.5, 1.5, -0.5),
            rect(-1.5, 0.5, -0.5, 1.5),
            rect(0.5, 0.5, 1.5, 1.5),
        ],
    }


# (minx, miny, maxx, maxy, expect_inside, expect_outside) — expectations are
# the reference's assertTrue/assertFalse pairs for the same bbox
SIGMA_CASES = [
    ((-0.6, -0.1, -0.4, 0.1), True, False),    # inside
    ((-1.5, -0.1, -0.4, 0.1), False, False),   # partially inside
    ((-0.6, -0.1, 1.4, 0.1), False, False),
    ((-0.6, -1.1, -0.4, 0.1), False, False),
    ((-0.6, -0.1, -0.4, 1.1), False, False),
    ((0.4, -0.1, 0.6, 0.1), False, True),      # in concave part
    ((0.4, -0.9, 0.6, -0.8), True, False),
    ((0.4, 0.8, 0.6, 0.9), True, False),
    ((0.4, -0.9, 0.6, 0.9), False, False),     # concave, corners all inside
    ((1.4, -0.1, 1.6, 0.1), False, True),      # outside poly's bbox
    ((-11.0, -10.0, 10.0, 10.0), False, False),  # bbox covering
]

HOLE_CASES = [
    ((2.1, -0.1, 2.2, 0.1), True, False),      # inside
    ((3.1, -0.9, 3.2, -0.8), True, False),
    ((3.1, 0.8, 3.2, 0.9), True, False),
    ((3.8, -0.1, 3.9, 0.1), True, False),
    ((1.8, -0.1, 2.2, 0.1), False, False),     # partially inside
    ((3.1, -1.1, 3.2, -0.8), False, False),
    ((3.1, 0.8, 3.2, 1.1), False, False),
    ((3.8, -0.1, 4.1, 0.1), False, False),
    ((2.9, -0.1, 3.1, 0.1), False, True),      # in hole
    ((2.4, -0.1, 2.6, 0.1), False, False),     # partially in hole
    ((3.1, -0.6, 3.2, -0.4), False, False),
    ((3.1, 0.4, 3.2, 0.6), False, False),
    ((3.4, -0.1, 3.6, 0.1), False, False),
    ((2.1, -0.1, 3.9, 0.1), False, False),     # intersecting hole
    ((4.1, -0.1, 4.2, 0.1), False, True),      # outside poly's bbox
    ((1.8, -0.1, 1.9, 0.1), False, True),
    ((3.1, -1.2, 3.2, -1.1), False, True),
    ((3.1, 1.1, 3.2, 1.2), False, True),
    ((2.2, -0.8, 3.8, 0.8), False, False),     # covers hole, corners inside
]


@pytest.mark.parametrize("bbox,exp_in,exp_out", SIGMA_CASES)
def test_sigma_polygon(bbox, exp_in, exp_out):
    p = sigma_polygon()
    assert bbox_in_polygon(bbox, p) is exp_in
    assert bbox_outside_polygon(bbox, p) is exp_out


@pytest.mark.parametrize("bbox,exp_in,exp_out", HOLE_CASES)
def test_polygon_with_hole(bbox, exp_in, exp_out):
    p = square_with_hole()
    assert bbox_in_polygon(bbox, p) is exp_in
    assert bbox_outside_polygon(bbox, p) is exp_out


@pytest.mark.parametrize("bbox,exp_in,exp_out", SIGMA_CASES + HOLE_CASES)
def test_multipolygon_union(bbox, exp_in, exp_out):
    """testBboxInMultiPolygon / (outside variant): both component polygons'
    batteries must hold unchanged against their union."""
    p = both_multipolygon()
    assert bbox_in_polygon(bbox, p) is exp_in
    assert bbox_outside_polygon(bbox, p) is exp_out


def test_square_square_multipolygon():
    """testBboxInSquareSquareMultiPolygon: bbox spanning the gap between
    four squares is neither inside nor outside."""
    p = square_square_multipolygon()
    bbox = (-1.0, -1.0, 1.0, 1.0)
    assert bbox_in_polygon(bbox, p) is False
    assert bbox_outside_polygon(bbox, p) is False
