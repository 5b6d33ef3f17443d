"""osm-testdata grade suite, 7xx (multipolygon assembly).

1:1 port of OSHDBGeometryBuilderTestOsmTestData7xxTest.java — the hardest
ring-assembly fixtures (joined ways, touching rings, invalid inputs).
Same entity ids, same expected-region WKTs, same structural assertions;
region equality is asserted the way the reference does (expected area ==
intersection area) plus a total-area check.  Tests the reference skips
(commented out there: 721-723, 726/727, 733/734, 743, 758-762, 765-767,
770, 775/776, 794) are not ported either.  Fixture provenance:
tests/osmtestdata_harness.py.
"""

from __future__ import annotations

import pytest

from tests.osmtestdata_harness import (
    Grid,
    assert_region_equals,
    geom_type,
    is_polygonal,
    num_coords,
    num_geometries,
    num_interior,
    num_interior_n,
)

G = Grid()


def test_700_polygon_single_closed_way():
    g = G.build_way(700800)
    assert geom_type(g) == "Polygon"
    assert num_interior(g) == 0
    assert num_coords(g) == 5
    ring = g["coordinates"][0]
    assert {tuple(c) for c in ring} == {
        (7.01, 1.01), (7.01, 1.04), (7.04, 1.04), (7.04, 1.01)
    }


# (test id, relation id, expected type(s), n_geometries, interior rings
#  [total over parts], n_coords or None, expected WKT or None)
VALID_MP_CASES = [
    (701, 701900, "Polygon", 1, 0, 5,
     "MULTIPOLYGON(((7.14 1.01,7.11 1.01,7.11 1.04,7.14 1.04,7.14 1.01)))"),
    (702, 702900, "Polygon", 1, 0, 9,
     "MULTIPOLYGON(((7.24 1.01,7.21 1.01,7.21 1.02,7.23 1.03,7.23 1.04,"
     "7.21 1.04,7.21 1.05,7.24 1.05,7.24 1.01)))"),
    (703, 703900, "Polygon", 1, 0, 9,
     "MULTIPOLYGON(((7.34 1.01,7.31 1.01,7.31 1.02,7.33 1.03,7.33 1.04,"
     "7.32 1.04,7.32 1.05,7.34 1.05,7.34 1.01)))"),
    (704, 704900, "Polygon", 1, 0, 13,
     "MULTIPOLYGON(((7.41 1.02,7.41 1.03,7.42 1.03,7.42 1.04,7.43 1.04,"
     "7.43 1.03,7.44 1.03,7.44 1.02,7.43 1.02,7.43 1.01,7.42 1.01,"
     "7.42 1.02,7.41 1.02)))"),
    (705, 705900, "Polygon", 1, 0, 14,
     "MULTIPOLYGON(((7.58 1.02,7.56 1.03,7.56 1.04,7.55 1.04,7.54 1.01,"
     "7.52 1.01,7.53 1.03,7.51 1.04,7.52 1.08,7.54 1.07,7.55 1.09,"
     "7.56 1.09,7.59 1.06,7.58 1.02)))"),
    (706, 706900, "MultiPolygon", 2, 0, 11,
     "MULTIPOLYGON(((7.61 1.04,7.62 1.06,7.65 1.05,7.64 1.03,7.63 1.02,"
     "7.61 1.04)),((7.64 1.03,7.67 1.03,7.67 1.01,7.64 1.01,7.64 1.03)))"),
    (707, 707900, "MultiPolygon", 2, 0, 10,
     "MULTIPOLYGON(((7.71 1.04,7.72 1.06,7.75 1.05,7.73 1.02,7.71 1.04)),"
     "((7.74 1.03,7.77 1.03,7.77 1.01,7.74 1.01,7.74 1.03)))"),
    (708, 708900, "MultiPolygon", 2, 0, 18,
     "MULTIPOLYGON(((7.81 1.03,7.82 1.06,7.85 1.06,7.86 1.03,7.85 1.03,"
     "7.84 1.05,7.83 1.05,7.82 1.02,7.81 1.03)),((7.83 1.04,7.84 1.04,"
     "7.84 1.02,7.87 1.02,7.87 1.03,7.88 1.03,7.88 1.01,7.83 1.01,"
     "7.83 1.04)))"),
    (709, 709900, "MultiPolygon", 3, 0, 15,
     "MULTIPOLYGON(((7.91 1.04,7.92 1.06,7.95 1.05,7.94 1.03,7.93 1.02,"
     "7.91 1.04)),((7.94 1.03,7.97 1.03,7.97 1.01,7.94 1.01,7.94 1.03)),"
     "((7.95 1.05,7.97 1.03,7.98 1.08,7.95 1.05)))"),
    (720, 720900, "Polygon", 1, 1, 10,
     "MULTIPOLYGON(((7.05 1.21,7.01 1.21,7.01 1.25,7.05 1.25,7.05 1.21),"
     "(7.04 1.22,7.02 1.22,7.02 1.24,7.04 1.24,7.04 1.22)))"),
    (724, 724900, "Polygon", 1, 1, 14,
     "MULTIPOLYGON(((7.44 1.22,7.47 1.21,7.41 1.21,7.42 1.22,7.41 1.24,"
     "7.43 1.26,7.46 1.26,7.45 1.23,7.44 1.22),(7.43 1.22,7.42 1.24,"
     "7.44 1.25,7.45 1.24,7.43 1.22)))"),
    (725, 725900, "Polygon", 1, 0, 7,
     "MULTIPOLYGON(((7.53 1.21,7.54 1.21,7.52 1.23,7.54 1.25,7.53 1.25,"
     "7.51 1.23,7.53 1.21)))"),
    (728, 728900, "Polygon", 1, 0, 9,
     "MULTIPOLYGON(((7.85 1.23,7.86 1.22,7.87 1.22,7.87 1.24,7.86 1.25,"
     "7.83 1.25,7.82 1.26,7.84 1.23,7.85 1.23)))"),
    (729, 729900, "MultiPolygon", 2, 1, 15,
     "MULTIPOLYGON(((7.91 1.21,7.91 1.29,7.99 1.29,7.99 1.21,7.91 1.21),"
     "(7.97 1.27,7.97 1.23,7.93 1.23,7.93 1.27,7.97 1.27)),"
     "((7.96 1.26,7.94 1.26,7.94 1.24,7.96 1.24,7.96 1.26)))"),
    (730, 730900, "Polygon", 1, 3, 21,
     "MULTIPOLYGON(((7.06 1.31,7.01 1.31,7.01 1.34,7.04 1.37,7.06 1.34,"
     "7.06 1.31),(7.02 1.33,7.03 1.33,7.03 1.32,7.02 1.32,7.02 1.33),"
     "(7.03 1.35,7.04 1.35,7.04 1.34,7.03 1.34,7.03 1.35),"
     "(7.05 1.33,7.04 1.33,7.04 1.32,7.05 1.32,7.05 1.33)))"),
    (731, 731900, "Polygon", 1, 2, 25,
     "MULTIPOLYGON(((7.18 1.33,7.17 1.31,7.12 1.31,7.11 1.33,7.11 1.38,"
     "7.18 1.38,7.18 1.33),(7.17 1.32,7.12 1.32,7.12 1.36,7.13 1.36,"
     "7.13 1.33,7.16 1.33,7.16 1.34,7.17 1.35,7.17 1.32),(7.16 1.36,"
     "7.16 1.35,7.15 1.34,7.14 1.34,7.14 1.35,7.15 1.36,7.15 1.37,"
     "7.16 1.37,7.16 1.36)))"),
    (732, 732900, "MultiPolygon", 2, 1, None,
     "MULTIPOLYGON(((7.21 1.36,7.22 1.37,7.23 1.36,7.22 1.35,7.21 1.36)),"
     "((7.21 1.33,7.21 1.31,7.26 1.31,7.26 1.34,7.24 1.36,7.21 1.33),"
     "(7.24 1.34,7.22 1.32,7.25 1.32,7.24 1.34)))"),
    (750, 750900, "Polygon", 1, 1, None,
     "MULTIPOLYGON(((7.01 1.51,7.01 1.57,7.06 1.57,7.06 1.51,7.01 1.51),"
     "(7.02 1.52,7.02 1.55,7.04 1.55,7.05 1.55,7.05 1.52,7.03 1.52,"
     "7.02 1.52)))"),
    (751, 751900, "Polygon", 1, 1, None,
     "MULTIPOLYGON(((7.12 1.51,7.15 1.51,7.16 1.57,7.13 1.57,7.11 1.54,"
     "7.12 1.51),(7.12 1.54,7.14 1.52,7.15 1.55,7.13 1.56,7.12 1.54)))"),
    (755, 755900, "Polygon", 1, 1, 11,
     "MULTIPOLYGON(((7.57 1.51,7.51 1.51,7.51 1.57,7.57 1.57,7.57 1.54,"
     "7.57 1.51),(7.55 1.56,7.57 1.54,7.55 1.52,7.53 1.54,7.55 1.56)))"),
    (763, 763900, "MultiPolygon", 4, 0, None,
     "MULTIPOLYGON(((7.35 1.65,7.33 1.64,7.32 1.63,7.32 1.62,7.33 1.62,"
     "7.34 1.63,7.35 1.65)),((7.35 1.65,7.36 1.63,7.37 1.62,7.38 1.62,"
     "7.38 1.63,7.37 1.64,7.35 1.65)),((7.35 1.65,7.33 1.66,7.32 1.67,"
     "7.32 1.68,7.33 1.68,7.34 1.67,7.35 1.65)),((7.35 1.65,7.36 1.67,"
     "7.37 1.68,7.38 1.68,7.38 1.67,7.37 1.66,7.35 1.65)))"),
    (764, 764900, "Polygon", 1, 4, None,
     "MULTIPOLYGON(((7.41 1.61,7.41 1.69,7.49 1.69,7.49 1.61,7.41 1.61),"
     "(7.45 1.65,7.43 1.64,7.42 1.63,7.42 1.62,7.43 1.62,7.44 1.63,"
     "7.45 1.65),(7.45 1.65,7.46 1.63,7.47 1.62,7.48 1.62,7.48 1.63,"
     "7.47 1.64,7.45 1.65),(7.45 1.65,7.43 1.66,7.42 1.67,7.42 1.68,"
     "7.43 1.68,7.44 1.67,7.45 1.65),(7.45 1.65,7.46 1.67,7.47 1.68,"
     "7.48 1.68,7.48 1.67,7.47 1.66,7.45 1.65)))"),
    (772, 772900, "Polygon", 1, 2, None,
     "MULTIPOLYGON(((7.21 1.71,7.21 1.79,7.29 1.79,7.29 1.71,7.21 1.71),"
     "(7.26 1.72,7.22 1.72,7.22 1.74,7.24 1.74,7.26 1.74,7.26 1.72),"
     "(7.24 1.74,7.26 1.76,7.24 1.78,7.22 1.76,7.24 1.74)))"),
    (774, 774900, "MultiPolygon", 2, 0, None,
     "MULTIPOLYGON(((7.42 1.73,7.42 1.75,7.44 1.75,7.44 1.73,7.42 1.73)),"
     "((7.44 1.75,7.44 1.76,7.47 1.76,7.47 1.72,7.44 1.72,7.44 1.73,"
     "7.45 1.73,7.45 1.75,7.44 1.75)))"),
    (779, 779900, "MultiPolygon", 2, 1, None,
     "MULTIPOLYGON(((7.91 1.71,7.98 1.71,7.98 1.77,7.91 1.77,7.91 1.71),"
     "(7.92 1.73,7.92 1.75,7.94 1.75,7.94 1.76,7.97 1.76,7.97 1.72,"
     "7.94 1.72,7.94 1.73,7.92 1.73)),((7.94 1.73,7.95 1.73,7.95 1.75,"
     "7.94 1.75,7.94 1.73)))"),
    (783, 783900, "Polygon", 1, 1, None,
     "MULTIPOLYGON(((7.32 1.81,7.35 1.81,7.36 1.87,7.33 1.87,7.31 1.84,"
     "7.32 1.81),(7.32 1.84,7.34 1.82,7.35 1.85,7.33 1.86,7.32 1.84)))"),
    (784, 784900, "Polygon", 1, 1, None,
     "MULTIPOLYGON(((7.41 1.81,7.46 1.81,7.46 1.86,7.41 1.86,7.41 1.81),"
     "(7.42 1.82,7.45 1.82,7.45 1.85,7.42 1.85,7.42 1.82)))"),
]


@pytest.mark.parametrize(
    "tid,rid,etype,ngeo,ninner,ncoords,wkt",
    VALID_MP_CASES,
    ids=[f"test{t[0]}" for t in VALID_MP_CASES],
)
def test_valid_multipolygons(tid, rid, etype, ngeo, ninner, ncoords, wkt):
    g = G.build_relation(rid)
    assert geom_type(g) == etype
    assert num_geometries(g) == ngeo
    if etype == "Polygon":
        assert num_interior(g) == ninner
    else:
        assert sum(num_interior_n(g, i) for i in range(ngeo)) == ninner
    if ncoords is not None:
        assert num_coords(g) == ncoords
    assert_region_equals(g, wkt)


# 777/785: inners forming extra rings — reference asserts Polygonal + region
AMBIGUOUS_CASES = [
    (777, 777900,
     "MULTIPOLYGON(((7.71 1.71,7.78 1.71,7.78 1.77,7.71 1.77,7.71 1.71),"
     "(7.72 1.73,7.72 1.75,7.74 1.75,7.74 1.76,7.77 1.76,7.77 1.72,"
     "7.74 1.72,7.74 1.73,7.72 1.73)),((7.74 1.73,7.75 1.73,7.75 1.75,"
     "7.74 1.75,7.74 1.73)))"),
    (785, 785900,
     "MULTIPOLYGON(((7.51 1.81,7.56 1.81,7.56 1.86,7.51 1.86,7.51 1.81),"
     "(7.52 1.82,7.55 1.82,7.55 1.85,7.52 1.85,7.52 1.82)),"
     "((7.53 1.83,7.54 1.83,7.54 1.84,7.53 1.84,7.53 1.83)))"),
]


@pytest.mark.parametrize(
    "tid,rid,wkt", AMBIGUOUS_CASES, ids=[f"test{t[0]}" for t in AMBIGUOUS_CASES]
)
def test_touching_inner_ring_networks(tid, rid, wkt):
    g = G.build_relation(rid)
    assert is_polygonal(g)
    assert_region_equals(g, wkt)


# invalid inputs: builder must degrade to GeometryCollection-or-polygonal,
# never throw; where the reference pins the part count we do too
INVALID_CASES = [
    (710, 710900, 2),   # overlapping outer rings
    (711, 711900, 2),   # duplicated segment
    (714, 714900, 1),   # open ring
    (715, 715900, 2),   # two open rings
    (740, 740900, None),  # outer ring crosses itself
    (741, 741900, None),  # line-only 'outer ring'
    (742, 742900, None),  # spike
    (744, 744900, 2),   # single outer ring not closed
    (745, 745900, 1),   # impossible multipolygon out of one way
    (746, 746900, None),  # impossible multipolygon out of two ways
    (747, 747900, None),  # duplicate-location nodes (relation)
    (752, 752900, None),  # touching inner without common nodes
    (753, 753900, None),  # touching inner, one common node missing
    (754, 754900, None),  # inner touches outer, not in node
    (756, 756900, None),  # inner touches outer in line, no common nodes
    (757, 757900, None),  # inner touches outer in line with common nodes
    (768, 768900, None),  # two overlapping ways
    (771, 771900, 2),   # outers touch in point without common node
    (773, 773900, None),  # inners touch in point without common node
    (778, 778900, None),  # overlapping inner rings
    (781, 781900, None),  # ring closed by location, not node id
    (782, 782900, None),  # inner from two ways matching by location only
    (790, 790900, None),  # same way twice
    (791, 791900, None),  # two ways, same nodes, same order
]


@pytest.mark.parametrize(
    "tid,rid,ngeo", INVALID_CASES, ids=[f"test{t[0]}" for t in INVALID_CASES]
)
def test_invalid_multipolygons_degrade(tid, rid, ngeo):
    g = G.build_relation(rid)
    assert geom_type(g) == "GeometryCollection" or is_polygonal(g)
    if ngeo is not None:
        assert num_geometries(g) == ngeo


def test_748_duplicate_location_way_stays_line():
    assert geom_type(G.build_way(748800)) == "LineString"


def test_749_figure8_way_stays_line():
    assert geom_type(G.build_way(749800)) == "LineString"


def test_780_way_closed_by_location_not_id():
    assert geom_type(G.build_way(780800)) == "LineString"


def test_792_same_nodes_different_order():
    assert G.build_relation(792900) is not None


def test_793_nearly_same_nodes():
    assert G.build_relation(793900) is not None


def test_795_duplicated_inner_ring():
    assert G.build_relation(795900) is not None
