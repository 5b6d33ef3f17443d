"""Geodesic measure tests, ported from the reference:
/root/reference/oshdb-util/src/test/java/org/heigit/ohsome/oshdb/util/geometry/GeoTest.java
"""

import math

import pytest

from oshdb_spark.geometry import (
    area_of,
    bearing_radians,
    from_wkt,
    geometry_collection,
    length_of,
    line_string,
    point,
    polygon,
    roundness,
    squareness,
    to_wkt,
)
from oshdb_spark.geometry.model import multi_line_string, multi_polygon

SQ = [[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]]
SQ_INNER = [[0.5, 0.5], [0.5, 0.6], [0.6, 0.6], [0.6, 0.5], [0.5, 0.5]]
SQ2 = [[2, 0], [2, 1], [3, 1], [3, 0], [2, 0]]


# --- areaOf (GeoTest.java:43-180) -----------------------------------------

def test_area_polygon():
    poly = polygon(SQ)
    # golden value from geojson.io, 5% tolerance (GeoTest.java:61)
    assert 12391399902.0 / area_of(poly) == pytest.approx(1.0, abs=0.05)
    poly_with_inner = polygon(SQ, [SQ_INNER])
    assert area_of(poly_with_inner) / area_of(poly) == pytest.approx(0.99, abs=0.0001)


def test_area_multipolygon():
    mp = multi_polygon([[SQ], [SQ2]])
    assert area_of(mp) / area_of(polygon(SQ)) == pytest.approx(2.0, abs=0.0001)


def test_area_geometry_collection():
    gc = geometry_collection([polygon(SQ), polygon(SQ2)])
    assert area_of(gc) / area_of(polygon(SQ)) == pytest.approx(2.0, abs=0.0001)
    # non-polygon members ignored
    gc2 = geometry_collection([polygon(SQ), point(0, 0), line_string(SQ2)])
    assert area_of(gc2) / area_of(polygon(SQ)) == pytest.approx(1.0, abs=0.0001)


def test_area_other_types_zero():
    assert area_of(point(0, 0)) == 0.0
    assert area_of(line_string([[0, 0], [1, 1]])) == 0.0


def test_area_not_negative():
    # inner ring bigger than the outer ring -> clamp at 0 (GeoTest.java:162)
    big_inner = [[-1, -1], [-1, 2], [2, 2], [2, -1], [-1, -1]]
    assert area_of(polygon(SQ, [big_inner])) == 0.0


# --- lengthOf (GeoTest.java:184-280) ----------------------------------------

def test_length_linestring():
    line = line_string([[0, 0], [1, 1]])
    # golden value, 5% tolerance (GeoTest.java:191)
    assert 157425.5 / length_of(line) == pytest.approx(1.0, abs=0.05)


def test_length_multilinestring():
    l1 = [[0, 0], [1, 1]]
    l2 = [[1, 1], [2, 0]]
    ml = multi_line_string([l1, l2])
    assert length_of(ml) / length_of(line_string(l1)) == pytest.approx(2.0, abs=0.0001)


def test_length_geometry_collection():
    l1 = [[0, 0], [1, 1]]
    gc = geometry_collection([line_string(l1), line_string([[1, 1], [2, 0]])])
    assert length_of(gc) / length_of(line_string(l1)) == pytest.approx(2.0, abs=0.0001)
    gc2 = geometry_collection([line_string(l1), point(0, 0), polygon(SQ)])
    assert length_of(gc2) / length_of(line_string(l1)) == pytest.approx(1.0, abs=0.0001)


def test_length_other_types_zero():
    assert length_of(point(0, 0)) == 0.0
    assert length_of(polygon(SQ)) == 0.0


# --- roundness (Polsby-Popper) ------------------------------------------------

def test_roundness():
    # a near-circle (32-gon) should approach 1.0; a square is 4*pi*A/P^2 = pi/4
    n = 32
    circle = [
        [0.01 * math.cos(2 * math.pi * i / n), 0.01 * math.sin(2 * math.pi * i / n)]
        for i in range(n + 1)
    ]
    assert roundness(polygon(circle)) == pytest.approx(1.0, abs=0.01)
    sq = [[0, 0], [0, 0.01], [0.01, 0.01], [0.01, 0], [0, 0]]
    assert roundness(polygon(sq)) == pytest.approx(math.pi / 4, abs=0.01)
    assert roundness(line_string(SQ)) == 0.0


# --- squareness (GeoTest.java:285-420) -----------------------------------------

L = 1e-4
D = 10


def test_squareness_square():
    sq = [[0, 0], [L, 0], [L, L], [0, L], [0, 0]]
    assert squareness(polygon(sq)) == pytest.approx(1.0, abs=0.01)


def test_squareness_square_shifted():
    sq_x = [[D, 0], [D + L, 0], [D + L, L], [D, L], [D, 0]]
    assert squareness(polygon(sq_x)) == pytest.approx(1.0, abs=0.01)
    sq_y = [[0, D], [L, D], [L, D + L], [0, D + L], [0, D]]
    assert squareness(polygon(sq_y)) == pytest.approx(1.0, abs=0.01)


def test_squareness_square_tilted():
    sq = [[L, 0], [0, L], [-L, 0], [0, -L], [L, 0]]
    assert squareness(polygon(sq)) == pytest.approx(1.0, abs=0.01)


def test_squareness_triangle():
    tri = [[0, 0], [L, 0], [L, L], [0, 0]]
    assert squareness(polygon(tri)) == pytest.approx(0.3, abs=0.1)


def test_squareness_circle():
    n = 32
    gon = [
        [L * math.cos(2 * math.pi * i / n), L * math.sin(2 * math.pi * i / n)]
        for i in range(n + 1)
    ]
    assert squareness(polygon(gon)) == pytest.approx(0.0, abs=0.1)


def test_squareness_lines():
    assert squareness(line_string([[0, 0], [L, 0]])) == pytest.approx(1.0, abs=0.01)
    assert squareness(line_string([[0, 0], [L, L]])) == pytest.approx(1.0, abs=0.01)
    assert squareness(line_string([[0, 0], [L, 0], [L, L]])) == pytest.approx(
        1.0, abs=0.01
    )
    # not-right-angle line is NOT 1.0
    assert abs(squareness(line_string([[0, 0], [L, 0], [0, L]])) - 1.0) > 0.1


def test_squareness_polygon_with_aligned_holes():
    sq = [[0, 0], [L, 0], [L, L], [0, L], [0, 0]]
    hole = [
        [L / 3, L / 3],
        [2 * L / 3, L / 3],
        [2 * L / 3, 2 * L / 3],
        [L / 3, 2 * L / 3],
        [L / 3, L / 3],
    ]
    assert squareness(polygon(sq, [hole])) == pytest.approx(1.0, abs=0.01)


def test_squareness_other_types():
    assert squareness(point(0, 0)) == 0.0


# --- bearing ------------------------------------------------------------------

def test_bearing():
    assert bearing_radians([0, 0], [0, 1]) == pytest.approx(0.0)  # north
    assert bearing_radians([0, 0], [1, 0]) == pytest.approx(math.pi / 2)  # east
    assert bearing_radians([0, 0], [0, -1]) == pytest.approx(math.pi)  # south


# --- WKT round-trip --------------------------------------------------------------

@pytest.mark.parametrize(
    "geom",
    [
        point(8.5, 49.25),
        point(),
        line_string([[0, 0], [1.5, 2.25]]),
        polygon(SQ),
        polygon(SQ, [SQ_INNER]),
        multi_polygon([[SQ], [SQ2]]),
        multi_line_string([[[0, 0], [1, 1]], [[2, 2], [3, 3]]]),
        geometry_collection([point(1, 2), polygon(SQ)]),
    ],
)
def test_wkt_roundtrip(geom):
    assert from_wkt(to_wkt(geom)) == geom
