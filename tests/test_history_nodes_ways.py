"""Versioned-entity geometry parity: nodes and ways.

1:1 ports of OSHDBGeometryBuilderTestOsmHistoryTestDataNodesTest.java and
OSHDBGeometryBuilderTestOsmHistoryTestDataWaysTest.java (reference
oshdb-util, data different-timestamps/{node,way}.osm): geometry built for
a specific entity VERSION at a specific timestamp, with member refs
resolved as-of that timestamp.
"""

from __future__ import annotations

import pytest

from oshdb_spark.geometry.model import is_empty

from tests.osmhistory_harness import HistoryData
from tests.osmtestdata_harness import geom_type, num_coords

N = HistoryData("history_node")
W = HistoryData("history_way")

DELTA = 1e-6


def _pt(g):
    assert g["type"] == "Point"
    return g["coordinates"]


def _assert_line(g, expected):
    assert geom_type(g) == "LineString"
    coords = g["coordinates"]
    assert len(coords) == len(expected)
    for (x, y), (ex, ey) in zip(coords, expected):
        assert x == pytest.approx(ex, abs=DELTA)
        assert y == pytest.approx(ey, abs=DELTA)


class TestHistoryNodes:
    def test_geometry_change(self):
        # a single node, lat/lon changed over time
        assert _pt(N.build_node(N.node(1, 0))) == pytest.approx([1.42, 1.22])
        assert _pt(N.build_node(N.node(1, 1))) == pytest.approx([1.42, 1.225])
        assert _pt(N.build_node(N.node(1, 2))) == pytest.approx([1.425, 1.23])
        # timestamp after newest timestamp
        g = N.build_node(N.node(1, 2), "2012-01-01T00:00:00Z")
        assert _pt(g) == pytest.approx([1.425, 1.23])

    def test_invalid_access(self):
        # timestamp before oldest timestamp
        with pytest.raises(AssertionError):
            N.build_node(N.node(1, 0), "2007-01-01T00:00:00Z")

    def test_tag_change(self):
        for idx in (0, 1, 2):
            g = N.build_node(N.node(2, idx))
            assert _pt(g) == pytest.approx([1.43, 1.24])

    def test_visible_change(self):
        expect = [False, True, False, True, False]  # empty per version
        for idx, empty in enumerate(expect):
            g = N.build_node(N.node(3, idx))
            assert g["type"] == "Point"
            assert is_empty(g) == empty
            if not empty:
                assert _pt(g) == pytest.approx([1.44, 1.24])

    def test_multiple_changes(self):
        cases = [
            (0, [1.42, 1.21]),
            (1, [1.425, 1.20]),
            (2, None),  # deleted
            (3, [1.42, 1.21]),
            (4, [1.42, 1.215]),
            (5, [1.42, 1.215]),
        ]
        for idx, exp in cases:
            g = N.build_node(N.node(4, idx))
            if exp is None:
                assert is_empty(g)
            else:
                assert _pt(g) == pytest.approx(exp)


class TestHistoryWays:
    def test_geometry_change(self):
        # way getting more nodes, one disappears
        _assert_line(
            W.build_way(W.way(100, 0)),
            [[1.42, 1.22], [1.42, 1.23], [1.42, 1.24], [1.42, 1.25]],
        )
        _assert_line(
            W.build_way(W.way(100, 1)),
            [[1.42, 1.22], [1.42, 1.23], [1.42, 1.24], [1.42, 1.25],
             [1.42, 1.26], [1.42, 1.27], [1.42, 1.28], [1.43, 1.29]],
        )
        last = [[1.42, 1.22], [1.42, 1.23], [1.42, 1.24], [1.42, 1.25],
                [1.42, 1.26], [1.42, 1.28], [1.43, 1.29], [1.43, 1.30],
                [1.43, 1.31]]
        _assert_line(W.build_way(W.way(100, 2)), last)
        # timestamp after last one
        _assert_line(W.build_way(W.way(100, 2), "2012-01-01T00:00:00Z"), last)

    def test_geometry_change_of_node_in_way(self):
        # way with two then three nodes, nodes changing lat/lon
        _assert_line(
            W.build_way(W.way(101, 0)), [[1.42, 1.22], [1.44, 1.22]]
        )
        _assert_line(
            W.build_way(W.way(101, 1)),
            [[1.425, 1.23], [1.44, 1.23], [1.43, 1.30]],
        )
        # timestamp in between: node versions newer than the way version
        _assert_line(
            W.build_way(W.way(101, 0), "2009-02-01T00:00:00Z"),
            [[1.42, 1.225], [1.445, 1.225]],
        )

    def test_visible_change(self):
        g = W.build_way(W.way(102, 0))
        assert geom_type(g) == "LineString" and num_coords(g) == 3
        assert is_empty(W.build_way(W.way(102, 1)))

    def test_tag_change(self):
        g = W.build_way(W.way(103, 0))
        assert geom_type(g) == "LineString" and num_coords(g) == 3
        g = W.build_way(W.way(103, 1))
        assert geom_type(g) == "LineString" and num_coords(g) == 5
        g = W.build_way(W.way(103, 2))
        assert geom_type(g) == "LineString" and num_coords(g) == 5

    def test_multiple_changes_on_nodes_of_way(self):
        g = W.build_way(W.way(104, 0))
        assert geom_type(g) == "LineString" and num_coords(g) == 2
        g = W.build_way(W.way(104, 1))
        assert geom_type(g) == "LineString" and num_coords(g) == 3

    def test_multiple_changes_on_nodes_and_ways(self):
        g = W.build_way(W.way(105, 0))
        assert geom_type(g) == "LineString" and num_coords(g) == 2
        g = W.build_way(W.way(105, 1))
        assert geom_type(g) == "LineString" and num_coords(g) == 2
        assert is_empty(W.build_way(W.way(105, 2)))
        g = W.build_way(W.way(105, 3))
        assert geom_type(g) == "LineString" and num_coords(g) == 4

    def test_polygon_area_yes_tag_disappears(self):
        g = W.build_way(W.way(106, 0))
        assert geom_type(g) == "Polygon" and num_coords(g) == 5
        g = W.build_way(W.way(106, 1))
        assert geom_type(g) == "LineString" and num_coords(g) == 5

    def test_polygon_area_yes_node_disappears(self):
        g = W.build_way(W.way(107, 0))
        assert geom_type(g) == "Polygon" and num_coords(g) == 5
        g = W.build_way(W.way(107, 1))
        assert geom_type(g) == "LineString" and num_coords(g) == 4

    def test_null_ref_entities(self):
        # broken way refs (partial redactions) must not throw
        w = W.way(177974941, 0)
        g = W.build_way(w)
        assert num_coords(g) < len(w["refs"])
