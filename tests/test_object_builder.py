"""1:1 port of OSHDBGeometryBuilderInternalTest.java
(/root/reference/oshdb-util/src/test/java/org/heigit/ohsome/oshdb/util/
geometry/OSHDBGeometryBuilderInternalTest.java) over the osm_types object
layer + geometry/object_builder facade.

The reference's timestamp variants (`ways(2L, 0)` / `relations(1L, 0)`)
resolve members through OSH containers loaded from geometryBuilder.osh;
here the same data (node/way/relation ids, coords, versions, timestamps —
see that fixture) is constructed directly with OSM/OSH builders, and the
FakeTagInterpreter* test deciders are mirrored as 3-line fakes.
"""

import pytest

from oshdb_spark.geometry.model import is_empty
from oshdb_spark.geometry.object_builder import (
    AuxiliaryData,
    GeometryBuilder,
    InterpreterAreaDecider,
)
from oshdb_spark.osm_types import (
    OSHNode,
    OSHRelation,
    OSHWay,
    OSM,
    OSMMember,
    OSMType,
)

DELTA = 1e-6
P = 10_000_000  # GEOM_PRECISION_TO_LONG
T1 = 946_684_800  # 2000-01-01T00:00:00Z
T2002 = 1_009_843_200  # 2002-01-01T00:00:00Z

n1 = OSM.node(1, 1, T1, 1, 0, [], int(100 * P), int(80 * P))
n2 = OSM.node(2, 1, T1, 1, 0, [], int(110 * P), int(80.1 * P))
n3 = OSM.node(3, 1, T1, 1, 0, [], int(110 * P), int(81.1 * P))
n4 = OSM.node(4, 1, T1, 1, 0, [], int(100 * P), int(81.1 * P))
w2 = OSM.way(1, 1, T1, 1, 0, [], [
    OSMMember(1, OSMType.NODE, -1),
    OSMMember(2, OSMType.NODE, -1),
    OSMMember(3, OSMType.NODE, -1),
    OSMMember(4, OSMType.NODE, -1),
    OSMMember(1, OSMType.NODE, -1),
])
r1 = OSM.relation(1, 1, T1, 1, 0, [], [OSMMember(2, OSMType.WAY, 1)])


# FakeTagInterpreterAreaNever / AreaAlways / AreaMultipolygonAllOuters
# (reference oshdb-util test helpers.fake*)
class FakeAreaNever:
    def is_area(self, entity):
        return False

    def is_outer(self, member):
        return False

    def is_inner(self, member):
        return False


class FakeAreaAlways(FakeAreaNever):
    def is_area(self, entity):
        return True


class FakeAreaMpAllOuters(FakeAreaAlways):
    def is_outer(self, member):
        return member.get_type() == OSMType.WAY

    def is_inner(self, member):
        return False


def coords_of(geom):
    if geom["type"] == "Polygon":
        return [c for ring in geom["coordinates"] for c in ring]
    return geom["coordinates"]


def num_points(geom):
    return len(coords_of(geom))


# --------------------------------------------------------------------- node


class TestNode:
    builder = GeometryBuilder(FakeAreaNever())

    def test_node_get_geometry_auxiliary(self):
        result = self.builder.get_geometry(n1, AuxiliaryData([], []))
        assert result["type"] == "Point"
        assert result["coordinates"][0] == pytest.approx(100, abs=DELTA)
        assert result["coordinates"][1] == pytest.approx(80, abs=DELTA)

    def test_node_invisible_empty(self):
        gone = OSM.node(1, -2, T1, 1, 0, [], int(100 * P), int(80 * P))
        assert is_empty(self.builder.get_node_geometry(gone))


# ---------------------------------------------------------------------- way


class TestWay:
    lines = GeometryBuilder(FakeAreaNever())
    areas = GeometryBuilder(FakeAreaAlways())
    aux = AuxiliaryData([n1, n2, n3, n4, n1], None)

    def test_way_get_geometry_line_string(self):
        result = self.lines.get_geometry(w2, self.aux)
        assert result["type"] == "LineString"
        assert num_points(result) == 5
        cs = coords_of(result)
        assert cs[0][0] == pytest.approx(100, abs=DELTA)
        assert cs[0][1] == pytest.approx(80, abs=DELTA)
        assert cs[2][0] == pytest.approx(110, abs=DELTA)
        assert cs[2][1] == pytest.approx(81.1, abs=DELTA)

    def test_way_get_geometry_polygon(self):
        result = self.areas.get_geometry(w2, self.aux)
        assert result["type"] == "Polygon"
        assert num_points(result) == 5
        cs = coords_of(result)
        assert cs[0][0] == pytest.approx(cs[4][0], abs=DELTA)
        assert cs[0][1] == pytest.approx(cs[4][1], abs=DELTA)

    def test_way_get_way_geometry_auxiliary_line_string(self):
        result = self.lines.get_way_geometry(w2, self.aux)
        assert result["type"] == "LineString"
        assert num_points(result) == 5
        cs = coords_of(result)
        assert cs[0] == pytest.approx([100, 80], abs=DELTA)
        assert cs[2] == pytest.approx([110, 81.1], abs=DELTA)

    def test_way_get_way_geometry_auxiliary_polygon(self):
        result = self.areas.get_way_geometry(w2, self.aux)
        assert result["type"] == "Polygon"
        assert num_points(result) == 5


def _fixture_way2():
    """geometryBuilder.osh way/2 with wired OSH node members (node 1 has a
    second version at 2002 whose lat moves to 80.2 — resolution at T1 must
    pick v1)."""
    osh_nodes = [
        OSHNode.build([
            n1, OSM.node(1, 2, T2002, 2, 0, [], int(100 * P), int(80.2 * P)),
        ]),
        OSHNode.build([n2]),
        OSHNode.build([n3]),
        OSHNode.build([n4]),
    ]
    way = OSM.way(2, 1, T1, 1, 0, [], [
        OSMMember(1, OSMType.NODE, -1),
        OSMMember(2, OSMType.NODE, -1),
        OSMMember(3, OSMType.NODE, -1),
        OSMMember(4, OSMType.NODE, -1),
        OSMMember(1, OSMType.NODE, -1),
    ])
    return OSHWay.build([way], osh_nodes)


class TestWayTimestamp:
    lines = GeometryBuilder(FakeAreaNever())
    areas = GeometryBuilder(FakeAreaAlways())

    def test_way_get_way_geometry_default_line_string(self):
        way = _fixture_way2().get_by_timestamp(T1)
        result = self.lines.get_way_geometry(way, T1)
        assert result["type"] == "LineString"
        assert num_points(result) == 5
        cs = coords_of(result)
        assert cs[0] == pytest.approx([100, 80], abs=DELTA)
        assert cs[2] == pytest.approx([110, 81.1], abs=DELTA)

    def test_way_get_way_geometry_default_polygon(self):
        way = _fixture_way2().get_by_timestamp(T1)
        result = self.areas.get_way_geometry(way, T1)
        assert result["type"] == "Polygon"
        assert num_points(result) == 5
        cs = coords_of(result)
        assert cs[0] == pytest.approx(cs[4], abs=DELTA)

    def test_timestamp_before_version_raises(self):
        # getGeometry(entity, ts < entity.ts) -> AssertionError (java:84-88)
        way = _fixture_way2().get_by_timestamp(T1)
        with pytest.raises(AssertionError):
            GeometryBuilder(FakeAreaNever()).get_geometry(way, T1 - 1)


# ----------------------------------------------------------------- relation


def _fixture_relation1():
    """geometryBuilder.osh relation/1 -> way/2 (role outer=1)."""
    return OSHRelation.build(
        [OSM.relation(1, 1, T1, 1, 0, [], [OSMMember(2, OSMType.WAY, 1)])],
        [],
        [_fixture_way2()],
    )


class TestRelation:
    mp = GeometryBuilder(FakeAreaMpAllOuters())
    gc = GeometryBuilder(FakeAreaNever())
    aux = AuxiliaryData([w2], [[n1, n2, n3, n4, n1]])

    def test_relation_get_geometry_polygon(self):
        result = self.mp.get_geometry(r1, self.aux)
        assert result["type"] == "Polygon"
        assert num_points(result) == 5

    def test_relation_get_geometry_other(self):
        result = self.gc.get_geometry(r1, self.aux)
        assert result["type"] == "GeometryCollection"
        assert len(result["geometries"]) == 1
        assert num_points(result["geometries"][0]) == 5

    def test_relation_get_multipolygon_geometry_auxiliary(self):
        result = self.mp.get_multipolygon_geometry(r1, self.aux)
        assert result["type"] == "Polygon"
        assert num_points(result) == 5

    def test_relation_get_multipolygon_geometry_timestamp(self):
        relation = _fixture_relation1().get_by_timestamp(T1)
        result = self.mp.get_multipolygon_geometry(relation, T1)
        assert result["type"] == "Polygon"
        assert num_points(result) == 5

    def test_relation_get_geometry_collection_geometry_auxiliary(self):
        result = self.gc.get_geometry_collection_geometry(r1, self.aux)
        assert result["type"] == "GeometryCollection"
        assert len(result["geometries"]) == 1
        assert num_points(result["geometries"][0]) == 5

    def test_relation_get_geometry_collection_geometry_timestamp(self):
        relation = _fixture_relation1().get_by_timestamp(T1)
        result = self.gc.get_geometry_collection_geometry(relation, T1)
        assert result["type"] == "GeometryCollection"
        assert len(result["geometries"]) == 1
        assert num_points(result["geometries"][0]) == 5

    def test_relation_missing_member_skipped(self):
        # redacted-member comment block (java:313-340): missing member ->
        # dropped from the collection, assembly continues
        rel = OSHRelation.build(
            [OSM.relation(9, 1, T1, 1, 0, [], [
                OSMMember(2, OSMType.WAY, 1),
                OSMMember(777, OSMType.WAY, 1),
            ])],
            [],
            [_fixture_way2()],
        ).get_by_timestamp(T1)
        result = self.gc.get_geometry_collection_geometry(rel, T1)
        assert len(result["geometries"]) == 1


# -------------------------------------------- engine-interpreter area decider


def test_interpreter_area_decider_matches_columnar_rules():
    """InterpreterAreaDecider routes through the SAME TagInterpreter the
    columnar path uses (default_tag_interpreter): a closed way tagged
    building is an area; tagged highway is a line."""
    from oshdb_spark.geometry.taginterpreter import (
        TAG_BUILDING,
        TAG_HIGHWAY,
        default_tag_interpreter,
    )

    decider = InterpreterAreaDecider(default_tag_interpreter())
    builder = GeometryBuilder(decider)
    aux = AuxiliaryData([n1, n2, n3, n4, n1], None)
    ring = [OSMMember(i, OSMType.NODE, -1) for i in (1, 2, 3, 4, 1)]
    building = OSM.way(7, 1, T1, 1, 0, [TAG_BUILDING, 0], ring)
    highway = OSM.way(8, 1, T1, 1, 0, [TAG_HIGHWAY, 0], ring)
    assert builder.get_geometry(building, aux)["type"] == "Polygon"
    assert builder.get_geometry(highway, aux)["type"] == "LineString"
