"""Versioned-entity geometry parity: relations.

1:1 ports of OSHDBGeometryBuilderTestOsmHistoryTestDataRelationTest.java
(multipolygon relations, data different-timestamps/polygon.osm) and
OSHDBGeometryBuilderTestOsmHistoryTestDataRelationNotMultipolygonTest.java
(other relation types, data different-timestamps/type-not-multipolygon.osm):
relation geometry at a timestamp with member ways/nodes resolved as-of,
member visibility flips, ring splits/merges across versions, and the
GeometryCollection fallback with member order preserved.
"""

from __future__ import annotations

import pytest

from oshdb_spark.geometry.model import is_empty

from tests.osmhistory_harness import HistoryData
from tests.osmtestdata_harness import (
    assert_region_covers,
    assert_region_equals,
    geom_type,
    is_polygonal,
    num_coords,
    num_geometries,
)

R = HistoryData("history_polygon")
T = HistoryData("history_not_mp")


class TestHistoryRelations:
    def test_geometry_change(self):
        # relation getting more ways, one disappears, last version invalid
        g = R.build_relation(R.relation(500, 0))
        assert geom_type(g) == "MultiPolygon"
        assert num_coords(g) == 9
        assert_region_equals(
            g,
            "MULTIPOLYGON(((7.31 1.01,7.34 1.01,7.34 1.05, 7.31 1.01)),"
            "((7.34 1.05, 7.32 1.05, 7.32 1.04, 7.33 1.04, 7.34 1.05)))",
        )
        g = R.build_relation(R.relation(500, 1))
        assert geom_type(g) == "MultiPolygon"
        assert num_coords(g) == 14
        assert_region_equals(
            g,
            "MULTIPOLYGON(((7.31 1.01,7.34 1.01,7.34 1.05, 7.31 1.01)),"
            "((7.34 1.05, 7.32 1.05, 7.32 1.04, 7.33 1.04, 7.34 1.05)),"
            "(( 7.32 1.05,7.32 1.07,7.31 1.07,7.31 1.05,7.32 1.05)))",
        )
        g = R.build_relation(R.relation(500, 2))
        assert geom_type(g) == "GeometryCollection" or is_polygonal(g)
        assert num_geometries(g) == 3

    def test_visible_change(self):
        g = R.build_relation(R.relation(501, 0))
        assert geom_type(g) == "MultiPolygon"
        assert num_coords(g) == 10
        expected = (
            "MULTIPOLYGON(((7.35 1.01, 7.34 1.01,7.34 1.02,7.35 1.02,"
            " 7.35 1.01)),"
            "((7.33 1.04,7.33 1.03, 7.31 1.02, 7.31 1.04, 7.33 1.04)))"
        )
        assert_region_equals(g, expected)
        assert is_empty(R.build_relation(R.relation(501, 1)))
        g = R.build_relation(R.relation(501, 2))
        assert geom_type(g) == "MultiPolygon"
        assert num_coords(g) == 10
        assert_region_equals(g, expected)

    def test_ways_not_existent(self):
        assert R.build_relation(R.relation(502, 0)) is not None

    def test_tag_change(self):
        expected = (
            "MULTIPOLYGON((( 7.33 1.05,7.33 1.06,7.32 1.06,7.32 1.05,"
            "7.33 1.05)))"
        )
        for idx in (0, 1, 2):
            g = R.build_relation(R.relation(503, idx))
            assert geom_type(g) == "Polygon"
            assert num_coords(g) == 5
            assert_region_equals(g, expected)

    def test_geometry_change_of_node_refs_in_ways(self):
        # way 109 (inner) and 110 (outer) changed node refs
        g = R.build_relation(R.relation(504, 0))
        assert geom_type(g) == "Polygon"
        assert num_coords(g) == 10
        assert_region_equals(
            g,
            "MULTIPOLYGON((( 7.24 1.04, 7.24 1.07, 7.30 1.07, 7.30 1.04,"
            " 7.24 1.04),"
            "(7.26 1.055, 7.265 1.06, 7.28 1.06,7.265 1.065, 7.26 1.055)))",
        )
        g = R.build_relation(R.relation(504, 1))
        assert geom_type(g) == "Polygon"
        assert num_coords(g) == 10
        assert_region_equals(
            g,
            "MULTIPOLYGON((( 7.24 1.04, 7.24 1.07, 7.30 1.07, 7.30 1.04,"
            " 7.24 1.04),"
            "( 7.26 1.05,7.265 1.06, 7.28 1.06, 7.265 1.05,7.26 1.05)))",
        )
        # timestamp in between versions
        g = R.build_relation(R.relation(504, 0), "2012-02-01T00:00:00Z")
        assert geom_type(g) == "Polygon"
        assert num_coords(g) == 10
        assert_region_equals(
            g,
            "MULTIPOLYGON(((7.24 1.04, 7.24 1.07, 7.31 1.07, 7.31 1.04 ,"
            " 7.24 1.04),"
            "(7.26 1.055, 7.265 1.06, 7.28 1.06,7.265 1.065, 7.26 1.055)))",
        )

    def test_geometry_change_of_node_coordinates_in_way(self):
        g = R.build_relation(R.relation(505, 0))
        assert geom_type(g) == "Polygon"
        assert num_coords(g) == 5
        assert_region_equals(
            g,
            "MULTIPOLYGON(((7.24 1.048, 7.245 1.072, 7.305 1.078,"
            " 7.303 1.042 , 7.24 1.048)))",
        )
        g = R.build_relation(R.relation(505, 0), "2012-02-01T00:00:00Z")
        assert geom_type(g) == "Polygon"
        assert num_coords(g) == 5
        assert_region_equals(
            g,
            "MULTIPOLYGON(((7.24 1.042, 7.242 1.07, 7.305 1.07,"
            " 7.295 1.039 , 7.24 1.042)))",
        )

    def test_geometry_change_of_node_coordinates_in_relation_and_way(self):
        g = R.build_relation(R.relation(506, 0))
        assert geom_type(g) == "Polygon"
        assert num_coords(g) == 4
        assert_region_equals(
            g,
            "MULTIPOLYGON(((7.24 1.048, 7.245 1.072,  7.303 1.042 ,"
            " 7.24 1.048)))",
        )
        g = R.build_relation(R.relation(506, 0), "2012-02-01T00:00:00Z")
        assert geom_type(g) == "Polygon"
        assert num_coords(g) == 4
        assert_region_equals(
            g,
            "MULTIPOLYGON(((7.24 1.042, 7.242 1.07, 7.295 1.039 ,"
            " 7.24 1.042)))",
        )

    def test_geometry_collection(self):
        # invalid multipolygon -> non-empty collection, not a MultiPolygon
        g = R.build_relation(R.relation(507, 0))
        assert geom_type(g) == "GeometryCollection"
        assert num_geometries(g) == 6

    def test_nodes_of_ways_not_existent(self):
        assert R.build_relation(R.relation(508, 0)) is not None

    def test_visible_change_of_node_in_way(self):
        # node 52 flips visible
        g = R.build_relation(R.relation(509, 0))
        assert geom_type(g) == "Polygon"
        assert num_coords(g) == 4
        assert_region_equals(
            g,
            "MULTIPOLYGON(((7.303 1.042, 7.32 1.07, 7.32 1.04,7.303 1.042)))",
        )
        # node 52 revived: the ring spans out to it, so the reference's
        # expected WKT is a subset witness (its assertion is exactly
        # intersection-area == expected-area, no total-area equality)
        g = R.build_relation(R.relation(509, 0), "2014-02-01T00:00:00Z")
        assert geom_type(g) == "Polygon"
        assert num_coords(g) == 5
        assert_region_covers(
            g,
            "MULTIPOLYGON(((7.303 1.042, 7.31 1.06, 7.32 1.07, 7.32 1.04,"
            " 7.303 1.042)))",
        )

    def test_tag_change_of_node_in_way(self):
        g = R.build_relation(R.relation(510, 0))
        assert geom_type(g) == "Polygon"
        assert num_coords(g) == 4
        assert_region_equals(
            g,
            "MULTIPOLYGON(((7.303 1.042,1.43 1.24,7.32 1.04,7.303 1.042)))",
        )
        g = R.build_relation(R.relation(510, 0), "2014-02-01T00:00:00Z")
        assert geom_type(g) == "Polygon"
        assert num_coords(g) == 4
        assert_region_equals(
            g,
            "MULTIPOLYGON(((7.295 1.039, 1.43 1.24, 7.32 1.04,"
            " 7.295 1.039)))",
        )

    def test_visible_change_of_way(self):
        g = R.build_relation(R.relation(511, 0))
        assert geom_type(g) == "Polygon"
        assert num_coords(g) == 4
        assert_region_equals(
            g, "MULTIPOLYGON(((7.29 1.01, 7.29 1.05, 7.30 1.01, 7.29 1.01)))"
        )
        # version after: member way invisible
        g = R.build_relation(R.relation(511, 0), "2017-02-01T00:00:00Z")
        assert is_empty(g)

    def test_visible_change_of_one_way_of_outer_ring(self):
        g = R.build_relation(R.relation(512, 0))
        assert geom_type(g) == "Polygon"
        assert num_coords(g) == 5
        assert_region_equals(
            g,
            "MULTIPOLYGON((( 7.5 1.04, 7.5 1.6, 7.4 1.6, 7.4 1.04,"
            "7.5 1.04)))",
        )
        # version after: way 120 gone -> ring can't close -> collection
        g = R.build_relation(R.relation(512, 0), "2018-02-01T00:00:00Z")
        assert geom_type(g) == "GeometryCollection"
        assert num_geometries(g) == 2

    def test_tag_change_of_way(self):
        expected = (
            "MULTIPOLYGON(((7.34 1.01, 7.34 1.05, 7.32 1.05, 7.32 1.04,"
            "7.34 1.01)))"
        )
        g = R.build_relation(R.relation(513, 0))
        assert geom_type(g) == "Polygon" and num_coords(g) == 5
        assert_region_equals(g, expected)
        for ts in ("2009-02-01T00:00:00Z", "2012-02-01T00:00:00Z"):
            g = R.build_relation(R.relation(513, 0), ts)
            assert geom_type(g) == "Polygon" and num_coords(g) == 5
            assert_region_equals(g, expected)

    def test_one_of_two_polygons_disappears(self):
        g = R.build_relation(R.relation(514, 0))
        assert geom_type(g) == "MultiPolygon"
        assert num_coords(g) == 9
        assert_region_equals(
            g,
            "MULTIPOLYGON(((7.31 1.01,7.34 1.01,7.34 1.05, 7.31 1.01)),"
            "((7.34 1.05, 7.32 1.05, 7.32 1.04, 7.33 1.04, 7.34 1.05)))",
        )
        g = R.build_relation(R.relation(514, 1))
        assert geom_type(g) == "Polygon"
        assert num_coords(g) == 5
        assert_region_equals(
            g,
            "MULTIPOLYGON(((7.34 1.05, 7.32 1.05, 7.32 1.04, 7.33 1.04,"
            " 7.34 1.05)))",
        )

    def test_way_split_up_in_two(self):
        expected = (
            "MULTIPOLYGON((( 7.0 1.04, 7.0 1.6, 7.2 1.6, 7.2 1.04,"
            "7.0 1.04)))"
        )
        for idx in (0, 1):
            g = R.build_relation(R.relation(515, idx))
            assert geom_type(g) == "Polygon" and num_coords(g) == 5
            assert_region_equals(g, expected)

    def test_null_ref_entities(self):
        # broken relation refs (partial redactions) must not throw
        r = R.relation(524, 0)
        g = R.build_relation(r)
        assert num_geometries(g) < len(r["members"])


class TestHistoryRelationsNotMultipolygon:
    def test_geometry_change(self):
        g = T.build_relation(T.relation(500, 0))
        assert geom_type(g) == "GeometryCollection"
        g = T.build_relation(T.relation(500, 1))
        assert geom_type(g) == "GeometryCollection"
        g = T.build_relation(T.relation(500, 2))
        assert geom_type(g) == "GeometryCollection" or is_polygonal(g)
        assert num_geometries(g) == 3

    def test_visible_change(self):
        g = T.build_relation(T.relation(501, 0))
        assert geom_type(g) == "GeometryCollection"
        assert num_geometries(g) == 2
        assert all(c["type"] == "LineString" for c in g["geometries"])
        assert is_empty(T.build_relation(T.relation(501, 1)))
        g = T.build_relation(T.relation(501, 2))
        assert geom_type(g) == "GeometryCollection"
        assert num_geometries(g) == 2
        assert all(c["type"] == "LineString" for c in g["geometries"])

    def test_ways_not_existent(self):
        g = T.build_relation(T.relation(502, 0))
        assert geom_type(g) == "GeometryCollection"
        assert is_empty(g)

    def test_tag_change(self):
        for idx in (0, 1, 2):
            g = T.build_relation(T.relation(503, idx))
            assert geom_type(g) == "GeometryCollection"
            assert num_geometries(g) == 1
            assert g["geometries"][0]["type"] == "LineString"

    def test_geometry_change_of_node_refs_in_ways(self):
        for args in ((504, 0, None), (504, 1, None),
                     (504, 0, "2012-02-01T00:00:00Z")):
            g = T.build_relation(T.relation(args[0], args[1]), args[2])
            assert geom_type(g) == "GeometryCollection"
            assert num_geometries(g) == 2
            assert all(c["type"] == "LineString" for c in g["geometries"])

    def test_geometry_change_of_node_coordinates_in_way(self):
        for ts in (None, "2012-02-01T00:00:00Z"):
            g = T.build_relation(T.relation(505, 0), ts)
            assert geom_type(g) == "GeometryCollection"
            assert num_geometries(g) == 1
            assert g["geometries"][0]["type"] == "LineString"

    def test_geometry_change_of_node_coordinates_in_relation_and_way(self):
        for ts in (None, "2012-02-01T00:00:00Z"):
            g = T.build_relation(T.relation(506, 0), ts)
            assert geom_type(g) == "GeometryCollection"
            assert num_geometries(g) == 3
            kinds = [c["type"] for c in g["geometries"]]
            assert kinds == ["Point", "Point", "LineString"]

    def test_geometry_collection(self):
        g = T.build_relation(T.relation(507, 0))
        assert geom_type(g) == "GeometryCollection"
        assert num_geometries(g) == 6

    def test_nodes_of_ways_not_existent(self):
        g = T.build_relation(T.relation(508, 0))
        assert geom_type(g) == "GeometryCollection"

    def test_visible_change_of_node_in_way(self):
        for ts in (None, "2014-02-01T00:00:00Z"):
            g = T.build_relation(T.relation(509, 0), ts)
            assert geom_type(g) == "GeometryCollection"
            assert num_geometries(g) == 1
            assert g["geometries"][0]["type"] == "LineString"

    def test_tag_change_of_node_in_way(self):
        for ts in (None, "2014-02-01T00:00:00Z"):
            g = T.build_relation(T.relation(510, 0), ts)
            assert geom_type(g) == "GeometryCollection"
            assert num_geometries(g) == 1
            assert g["geometries"][0]["type"] == "LineString"

    def test_visible_change_of_way(self):
        g = T.build_relation(T.relation(511, 0))
        assert geom_type(g) == "GeometryCollection"
        assert num_geometries(g) == 1
        assert g["geometries"][0]["type"] == "LineString"
        # version after: member way invisible -> empty collection content
        g = T.build_relation(T.relation(511, 0), "2017-02-01T00:00:00Z")
        assert geom_type(g) == "GeometryCollection"
        assert is_empty(g)

    def test_visible_change_of_one_way_of_outer_ring(self):
        g = T.build_relation(T.relation(512, 0))
        assert geom_type(g) == "GeometryCollection"
        assert num_geometries(g) == 2
        assert all(c["type"] == "LineString" for c in g["geometries"])
        g = T.build_relation(T.relation(512, 0), "2018-02-01T00:00:00Z")
        assert geom_type(g) == "GeometryCollection"
        assert num_geometries(g) == 2
        assert any(c["type"] == "LineString" for c in g["geometries"])

    def test_tag_change_of_way(self):
        for ts in (None, "2009-02-01T00:00:00Z", "2012-02-01T00:00:00Z"):
            g = T.build_relation(T.relation(513, 0), ts)
            assert geom_type(g) == "GeometryCollection"
            assert num_geometries(g) == 1
            assert g["geometries"][0]["type"] == "LineString"

    def test_one_of_two_polygons_disappears(self):
        g = T.build_relation(T.relation(514, 0))
        assert geom_type(g) == "GeometryCollection"
        assert num_geometries(g) == 2
        assert all(c["type"] == "LineString" for c in g["geometries"])
        g = T.build_relation(T.relation(514, 1))
        assert geom_type(g) == "GeometryCollection"
        assert num_geometries(g) == 1
        assert g["geometries"][0]["type"] == "LineString"

    def test_way_split_up_in_two(self):
        g = T.build_relation(T.relation(515, 0))
        assert geom_type(g) == "GeometryCollection"
        assert num_geometries(g) == 1
        assert g["geometries"][0]["type"] == "LineString"
        g = T.build_relation(T.relation(515, 1))
        assert geom_type(g) == "GeometryCollection"
        assert num_geometries(g) == 2
        assert all(c["type"] == "LineString" for c in g["geometries"])

    def test_restriction_roles(self):
        g = T.build_relation(T.relation(518, 0))
        assert geom_type(g) == "GeometryCollection"
        assert num_geometries(g) == 3
        kinds = [c["type"] for c in g["geometries"]]
        assert kinds == ["LineString", "Point", "LineString"]

    def test_roles_are_part_and_outline(self):
        g = T.build_relation(T.relation(519, 0))
        assert geom_type(g) == "GeometryCollection"
        assert num_geometries(g) == 2
        assert all(c["type"] == "LineString" for c in g["geometries"])
        g = T.build_relation(T.relation(519, 1))
        assert geom_type(g) == "GeometryCollection"
        assert num_geometries(g) == 3
        assert all(c["type"] == "LineString" for c in g["geometries"])
