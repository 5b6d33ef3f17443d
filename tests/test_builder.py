"""Geometry-builder tests: way/relation assembly, ring joining, figure-8
splitting, touching-ring merging.

Scenarios are re-creations of the reference's documented cases:
OSHDBGeometryBuilderInternal.java:203-230 (way), :556-570 (merge example),
:634-650 (pinch example), :852-920 (buildRings), and the relations/*.osm
semantic fixtures (SURVEY.md §5).
"""

import pytest

from oshdb_spark.geometry import area_of, is_empty
from oshdb_spark.geometry.builder import (
    build_multipolygon_geometry,
    build_node_geometry,
    build_relation_geometry,
    build_rings,
    build_way_geometry,
    merge_touching_rings,
    split_pinched_rings,
)
from oshdb_spark.geometry.taginterpreter import (
    TAG_AREA,
    TAG_BUILDING,
    TAG_HIGHWAY,
    default_tag_interpreter,
)

TI = default_tag_interpreter()


def N(nid, x, y):
    return (nid, float(x), float(y))


# --- nodes -------------------------------------------------------------------

def test_node_geometry():
    assert build_node_geometry(True, 8.5, 49.2) == {
        "type": "Point",
        "coordinates": [8.5, 49.2],
    }
    assert is_empty(build_node_geometry(False, 8.5, 49.2))


# --- ways (BuilderInternal:203-230) ---------------------------------------------

SQUARE_NODES = [N(1, 0, 0), N(2, 1, 0), N(3, 1, 1), N(4, 0, 1), N(1, 0, 0)]


def test_way_area_tag_closed_ring_is_polygon():
    refs = [1, 2, 3, 4, 1]
    assert TI.way_is_area(refs, {TAG_BUILDING: 1})
    g = build_way_geometry(True, True, SQUARE_NODES)
    assert g["type"] == "Polygon"
    assert area_of(g) > 0


def test_way_closed_ring_without_area_tag_is_linestring():
    refs = [1, 2, 3, 4, 1]
    assert not TI.way_is_area(refs, {TAG_HIGHWAY: 7})
    g = build_way_geometry(True, False, SQUARE_NODES)
    assert g["type"] == "LineString"


def test_way_area_no_tag_forces_linestring():
    refs = [1, 2, 3, 4, 1]
    assert not TI.way_is_area(refs, {TAG_BUILDING: 1, TAG_AREA: 0})


def test_way_unclosed_with_area_tag_falls_back_to_linestring():
    # "doesn't form a linear ring - falling back to linestring"
    refs = [1, 2, 3, 4]
    assert not TI.way_is_area(refs, {TAG_BUILDING: 1})
    g = build_way_geometry(True, False, SQUARE_NODES[:-1])
    assert g["type"] == "LineString"


def test_way_degenerate_fallbacks():
    assert build_way_geometry(True, False, [N(1, 2, 3)]) == {
        "type": "Point",
        "coordinates": [2.0, 3.0],
    }
    assert is_empty(build_way_geometry(True, False, []))
    assert is_empty(build_way_geometry(False, True, SQUARE_NODES))


# --- buildRings (BuilderInternal:852-920) ------------------------------------

def test_build_rings_joins_adjacent_ways():
    w1 = [N(1, 0, 0), N(2, 1, 0), N(3, 1, 1)]
    w2 = [N(3, 1, 1), N(4, 0, 1), N(1, 0, 0)]
    rings = build_rings([w1, w2])
    assert len(rings) == 1
    ids = [n[0] for n in rings[0]]
    assert ids[0] == ids[-1]
    assert set(ids) == {1, 2, 3, 4}


def test_build_rings_reversed_ways():
    w1 = [N(1, 0, 0), N(2, 1, 0), N(3, 1, 1)]
    w2_rev = [N(1, 0, 0), N(4, 0, 1), N(3, 1, 1)]  # end matches end
    rings = build_rings([w1, w2_rev])
    assert len(rings) == 1
    ids = [n[0] for n in rings[0]]
    assert ids[0] == ids[-1] and set(ids) == {1, 2, 3, 4}


def test_build_rings_drops_unclosed():
    dangling = [N(1, 0, 0), N(2, 1, 0)]
    assert build_rings([dangling]) == []


def test_build_rings_multiple_rings():
    r1a = [N(1, 0, 0), N(2, 1, 0), N(3, 1, 1), N(1, 0, 0)]
    r2a = [N(10, 5, 5), N(11, 6, 5)]
    r2b = [N(11, 6, 5), N(12, 6, 6), N(10, 5, 5)]
    rings = build_rings([r1a, r2a, r2b])
    assert len(rings) == 2


# --- splitPinchedRings (BuilderInternal:634-650) ------------------------------
#  A--B
#  |  |
#  G--C--D
#     |  |
#     F--E

def test_split_pinched_ring_side_by_side():
    ring = [
        N(1, 0, 1),  # A
        N(2, 1, 1),  # B
        N(3, 1, 0),  # C
        N(4, 2, 0),  # D
        N(5, 2, -1),  # E
        N(6, 1, -1),  # F
        N(3, 1, 0),  # C again (pinch point)
        N(7, 0, 0),  # G
        N(1, 0, 1),  # A close
    ]
    rings = [ring]
    holes: list = []
    split_pinched_rings(rings, holes)
    assert len(rings) == 2
    assert holes == []
    id_sets = sorted(({n[0] for n in r} for r in rings), key=len)
    assert {3, 4, 5, 6} in id_sets  # C,D,E,F square
    assert {1, 2, 3, 7} in id_sets  # A,B,C,G square


def test_split_pinched_ring_nested_becomes_hole():
    # outer square A-B-C-D pinched at A with an inner square A-E-F-G inside it
    ring = [
        N(1, 0, 0),   # A
        N(2, 4, 0),   # B
        N(3, 4, 4),   # C
        N(4, 0, 4),   # D
        N(1, 0, 0),   # A (pinch)
        N(5, 1, 1),   # E
        N(6, 2, 1),   # F
        N(7, 2, 2),   # G
        N(1, 0, 0),   # A close -- wait, inner must close at A
    ]
    rings = [ring]
    holes: list = []
    split_pinched_rings(rings, holes)
    assert len(rings) == 1
    assert len(holes) == 1
    assert {n[0] for n in holes[0]} == {1, 5, 6, 7}


# --- mergeTouchingRings (BuilderInternal:556-570) ------------------------------
# F--E----X       F--E----X
# |  |    |       |       |
# |  D-C  |  -->  |       |
# |    |  |       |       |
# A----B--Y       A----B--Y

def test_merge_touching_rings():
    A, B, C, D, E, F = N(1, 0, 0), N(2, 3, 0), N(3, 3, 1), N(4, 2, 1), N(5, 2, 3), N(6, 0, 3)
    X, Y = N(7, 4, 3), N(8, 4, 0)
    r1 = [A, B, C, D, E, F, A]
    r2 = [X, Y, B, C, D, E, X]
    rings = [r1, r2]
    merge_touching_rings(rings)
    assert len(rings) == 1
    ids = [n[0] for n in rings[0]]
    assert ids[0] == ids[-1]
    # merged boundary contains exactly A,B,E,F,X,Y (C,D shaved off)
    assert set(ids) == {1, 2, 5, 6, 7, 8}
    assert len(ids) == 7  # closed ring of 6 distinct nodes


def test_merge_non_touching_rings_untouched():
    r1 = [N(1, 0, 0), N(2, 1, 0), N(3, 1, 1), N(1, 0, 0)]
    r2 = [N(4, 5, 5), N(5, 6, 5), N(6, 6, 6), N(4, 5, 5)]
    rings = [r1, r2]
    merge_touching_rings(rings)
    assert len(rings) == 2


# --- multipolygon assembly ------------------------------------------------------

def test_multipolygon_single_outer_with_hole():
    outer = [[N(1, 0, 0), N(2, 4, 0), N(3, 4, 4)], [N(3, 4, 4), N(4, 0, 4), N(1, 0, 0)]]
    inner = [[N(5, 1, 1), N(6, 3, 1), N(7, 3, 3), N(8, 1, 3), N(5, 1, 1)]]
    g = build_multipolygon_geometry(outer, inner)
    assert g["type"] == "Polygon"
    assert len(g["coordinates"]) == 2
    full = area_of({"type": "Polygon", "coordinates": [g["coordinates"][0]]})
    assert area_of(g) < full


def test_multipolygon_two_outers_hole_assignment():
    o1 = [[N(1, 0, 0), N(2, 4, 0), N(3, 4, 4), N(4, 0, 4), N(1, 0, 0)]]
    o2 = [[N(11, 10, 0), N(12, 14, 0), N(13, 14, 4), N(14, 10, 4), N(11, 10, 0)]]
    hole_in_o2 = [[N(15, 11, 1), N(16, 13, 1), N(17, 13, 3), N(18, 11, 3), N(15, 11, 1)]]
    g = build_multipolygon_geometry(o1 + o2, hole_in_o2)
    assert g["type"] == "MultiPolygon"
    assert len(g["coordinates"]) == 2
    # the hole landed in the second outer
    by_holes = sorted(len(rings) for rings in g["coordinates"])
    assert by_holes == [1, 2]
    holed = next(r for r in g["coordinates"] if len(r) == 2)
    assert holed[0][0][0] == 10.0  # it's o2


def test_relation_fallback_geometry_collection():
    members = [
        {"kind": "other", "nodes": [N(1, 0, 0), N(2, 1, 1)]},
        {"kind": "other", "nodes": None},  # missing member -> skipped
    ]
    g = build_relation_geometry(True, False, members)
    assert g["type"] == "GeometryCollection"
    assert len(g["geometries"]) == 1


def test_relation_area_empty_mp_falls_back_to_collection():
    # unclosed outer ways -> no rings -> fallback to collection
    members = [{"kind": "outer", "nodes": [N(1, 0, 0), N(2, 1, 1)]}]
    g = build_relation_geometry(True, True, members)
    assert g["type"] == "GeometryCollection"


def test_relation_invisible_is_empty_collection():
    g = build_relation_geometry(False, True, [])
    assert g["type"] == "GeometryCollection" and is_empty(g)
