"""Incomplete-data geometry builder parity.

1:1 ports of OSHDBGeometryBuilderTestWayIncompleteDataTest.java and
OSHDBGeometryBuilderTestPolygonIncompleteDataTest.java (reference
oshdb-util, data incomplete-osm/{way,polygon}.osm): ways/relations whose
member refs point at missing nodes or ways (redacted/partial extracts)
must degrade gracefully, never throw.
"""

from __future__ import annotations

from oshdb_spark.geometry.model import is_empty

from tests.osmhistory_harness import HistoryData
from tests.osmtestdata_harness import (
    assert_region_equals,
    geom_type,
    num_coords,
    num_interior,
)

TS = "2014-01-01T00:00:00Z"

W = HistoryData("incomplete_way")
P = HistoryData("incomplete_polygon")


class TestWayIncompleteData:
    def test_one_of_nodes_not_existent(self):
        # way with four node references, one node missing
        g = W.build_way(W.way(100, 0), TS)
        assert geom_type(g) == "LineString"
        assert num_coords(g) >= 3

    def test_way_area_yes(self):
        # area=yes but not a closed ring -> linestring fallback
        g = W.build_way(W.way(101, 0), TS)
        assert geom_type(g) == "LineString"
        assert num_coords(g) >= 3

    def test_all_nodes_not_existent(self):
        # way with two nodes, both missing -> typed empty
        g = W.build_way(W.way(102, 0), TS)
        assert num_coords(g) == 0


class TestPolygonIncompleteData:
    def test_some_nodes_of_way_not_existent(self):
        # valid multipolygon relation, two outer ways; second way has 2
        # refs to missing nodes — ring still closes over what remains
        g = P.build_relation(P.relation(500, 0), TS)
        assert geom_type(g) == "Polygon"
        assert num_interior(g) == 0
        assert num_coords(g) == 7
        assert_region_equals(
            g,
            "MULTIPOLYGON(((7.34 1.01,7.31 1.01,7.33 1.04,7.32 1.04,"
            "7.32 1.05,7.34 1.05,7.34 1.01)))",
        )

    def test_way_not_existent(self):
        # valid multipolygon relation, one of two way refs missing
        g = P.build_relation(P.relation(501, 0), TS)
        assert geom_type(g) == "Polygon"
        assert num_coords(g) == 6
        assert_region_equals(
            g,
            "MULTIPOLYGON(((7.31 1.04, 7.33 1.05, 7.33 1.04, 7.32 1.04,"
            " 7.31 1.01,7.31 1.01,7.31 1.04)))",
        )

    def test_all_nodes_of_way_not_existent(self):
        # relation with one way whose two nodes are both missing
        g = P.build_relation(P.relation(502, 0), TS)
        assert g is not None

    def test_relation_member_way_without_nodes(self):
        # ways with no node refs (invalid old OSM data) must not throw
        g = P.build_relation(P.relation(503, 0), TS)
        assert g is not None
        assert geom_type(g) in (
            "Polygon", "MultiPolygon", "GeometryCollection"
        ) or is_empty(g)
