"""osm-testdata grade suite, 1xx (basic geometries) + 3xx (attributes).

1:1 port of OSHDBGeometryBuilderTestOsmTestData1xxTest.java /
OSHDBGeometryBuilderTestOsmTestData3xxTest.java (same entity ids, same
assertions, JTS predicates
re-expressed with the engine's own kernels).  Fixture provenance: see
tests/osmtestdata_harness.py.
"""

from __future__ import annotations

import pytest

from tests.osmtestdata_harness import (
    Grid,
    geom_type,
    lines_intersect,
    num_coords,
    segments_cross,
    shared_coords,
)

G = Grid()
DELTA = 1e-6


def test_100_single_node():
    g = G.build_node(100000)
    assert geom_type(g) == "Point"
    assert g["coordinates"][0] == pytest.approx(1.02, abs=DELTA)
    assert g["coordinates"][1] == pytest.approx(1.02, abs=DELTA)


def test_102_two_nodes_same_location():
    g1, g2 = G.build_node(102000), G.build_node(102001)
    assert geom_type(g1) == geom_type(g2) == "Point"
    assert g1["coordinates"] == pytest.approx(g2["coordinates"], abs=DELTA)


def test_110_way_two_nodes():
    g = G.build_way(110800)
    assert geom_type(g) == "LineString"
    assert num_coords(g) == 2


def test_112_closed_way_four_nodes():
    g = G.build_way(112800)
    # closed ring but NOT tagged area=yes -> stays a LineString
    assert geom_type(g) == "LineString"
    assert num_coords(g) == 5
    assert g["coordinates"][0] == g["coordinates"][-1]


def test_113_two_separate_ways():
    g1, g2 = G.build_way(113800), G.build_way(113801)
    assert geom_type(g1) == geom_type(g2) == "LineString"
    assert not lines_intersect(g1, g2)


def test_114_ways_connected_end_to_beginning():
    g1, g2 = G.build_way(114800), G.build_way(114801)
    assert g1["coordinates"][-1] == g2["coordinates"][0]


def test_115_ways_connected_end_to_end():
    g1, g2 = G.build_way(115800), G.build_way(115801)
    assert g1["coordinates"][-1] == g2["coordinates"][-1]


def test_116_three_ways_closed_loop():
    g1, g2, g3 = G.build_way(116800), G.build_way(116801), G.build_way(116802)
    assert g3["coordinates"][-1] == g1["coordinates"][0]
    assert g1["coordinates"][-1] == g2["coordinates"][0]
    assert g2["coordinates"][-1] == g3["coordinates"][0]


def test_120_way_without_nodes():
    assert G.build_way(120800) is not None


def test_121_way_single_node():
    assert G.build_way(121800) is not None


def test_122_same_node_twice():
    assert G.build_way(122800) is not None


def test_123_two_nodes_same_position():
    assert G.build_way(123800) is not None


def test_124_first_two_nodes_same_position():
    assert G.build_way(124800) is not None


def test_130_crossing_ways_no_common_node():
    g1, g2 = G.build_way(130800), G.build_way(130801)
    assert lines_intersect(g1, g2)
    assert not shared_coords(g1, g2)


def test_131_crossing_ways_common_node():
    g1, g2 = G.build_way(131800), G.build_way(131801)
    assert lines_intersect(g1, g2)
    assert shared_coords(g1, g2)


def test_132_crossing_node_same_position():
    g1, g2 = G.build_way(132800), G.build_way(132801)
    assert lines_intersect(g1, g2)
    assert shared_coords(g1, g2)


def test_133_self_crossing_way_no_common_node():
    g = G.build_way(133800)
    assert geom_type(g) == "LineString"
    c = g["coordinates"]
    assert len(c) == 4
    # segment (0,1) crosses segment (2,3): self-intersection (isSimple false)
    assert segments_cross(c[0], c[1], c[2], c[3])


def test_134_self_crossing_way_common_node():
    g = G.build_way(134800)
    assert geom_type(g) == "LineString"
    c = g["coordinates"]
    assert len(c) == 6
    assert segments_cross(c[0], c[2], c[3], c[5])


# -- 3xx: attribute handling (uids parse; geometry building never throws) --

G3_CASES = [
    (300, 200000, 1),     # normal node with uid
    (301, 201000, None),  # empty username
    (302, 202000, None),  # no uid (anonymous; reader default)
    (303, 203000, 0),     # uid 0 = anonymous
    (304, 204000, None),  # negative uid
    (305, 205000, None),  # uid < 0 + username
    (306, 206000, None),  # 250-char username
    (307, 207000, None),  # 260-char username
]


@pytest.mark.parametrize("case,nid,expect_uid", G3_CASES)
def test_3xx_attributes(case, nid, expect_uid):
    g = G.build_node(nid)  # must not throw
    assert geom_type(g) == "Point"
