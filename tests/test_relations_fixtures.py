"""Relation-builder edge-case suites, ported 1:1 from the reference:

  OSHDBGeometryBuilderMultipolygonInvalidInnersTest  (invalid-inner-rings.osm)
  OSHDBGeometryBuilderMultipolygonInvalidOutersTest  (invalid-outer-ring.osm)
  OSHDBGeometryBuilderRelationOuterDirectionsTest    (outer-directions.osm)
  OSHDBGeometryBuilderRelationTypeNotMultipolygonTest(relationTypeNotMultipolygon.osm)

Fixtures converted to JSON (tests/fixtures/osm_relations_fixtures.json)
from the reference's test resources (hand-written scenario files).
"""

from __future__ import annotations

import json
import os

import pytest

from tests.osmtestdata_harness import (
    Grid,
    assert_region_equals,
    geom_type,
    num_geometries,
    num_interior,
)

FIXTURES = os.path.join(
    os.path.dirname(__file__), "fixtures", "osm_relations_fixtures.json"
)
with open(FIXTURES) as f:
    _ALL = json.load(f)


class _FGrid(Grid):
    def __init__(self, name: str):
        d = _ALL[name]
        self.nodes = {e["id"]: e for e in d["nodes"]}
        self.ways = {e["id"]: e for e in d["ways"]}
        self.relations = {e["id"]: e for e in d["relations"]}


OUTER_RING_WKT = (
    "MULTIPOLYGON(((7.16 1.36,7.16 1.35,7.15 1.34,7.14 1.34,7.14 1.35,"
    "7.14 1.36,7.15 1.36,7.15 1.37,7.16 1.37,7.16 1.36)))"
)


class TestInvalidInners:
    G = _FGrid("invalid-inner-rings")

    def test_duplicate_inner_rings(self):
        g = self.G.build_relation(1)
        assert geom_type(g) == "Polygon"

    def test_touching_incomplete_inner_rings(self):
        g = self.G.build_relation(2)
        assert geom_type(g) == "Polygon"


class TestInvalidOuters:
    def test_self_intersecting_outer(self):
        g = _FGrid("invalid-outer-ring").build_relation(1)
        assert geom_type(g) == "MultiPolygon"


class TestOuterDirections:
    """Ways joined into one ring regardless of their directions — the four
    start/end matching permutations of buildRings
    (OSHDBGeometryBuilderInternal.java:852-920)."""

    G = _FGrid("outer-directions")

    @pytest.mark.parametrize("rid", [1, 2, 3, 4])
    def test_all_direction_permutations(self, rid):
        g = self.G.build_relation(rid)
        assert geom_type(g) == "Polygon"
        assert num_interior(g) == 0
        assert_region_equals(g, OUTER_RING_WKT)


class TestTypeNotMultipolygon:
    """Non-multipolygon relations -> GeometryCollection of member
    geometries in member order."""

    G = _FGrid("relationTypeNotMultipolygon")

    @pytest.mark.parametrize(
        "rid,expected_types",
        [
            (710900, ["LineString", "Point", "LineString"]),   # restriction
            (710901, ["Point", "Point", "Point"]),             # associatedStreet
            (710902, ["LineString", "Point", "LineString", "Point"]),  # public_transport
            (710903, ["LineString", "LineString", "LineString"]),      # building
        ],
    )
    def test_collection_member_types(self, rid, expected_types):
        g = self.G.build_relation(rid)
        assert geom_type(g) == "GeometryCollection"
        assert num_geometries(g) == len(expected_types)
        assert [m["type"] for m in g["geometries"]] == expected_types
