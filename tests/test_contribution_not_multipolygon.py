"""Contribution view over non-multipolygon relations, end to end in Spark.

1:1 port of IterateByContributionTypeNotMultipolygonTest.java (reference
oshdb-util celliterator; data different-timestamps/type-not-multipolygon.osm
via tests/fixtures/osm_history.json) plus the semantic parts of
IterateByContribution/TimestampNotOsmTypeSpecificTest.java: versioned
relations whose geometry is a GeometryCollection, driven through the FULL
Spark contribution/snapshot views — member-driven events, visibility
flips, tag changes, AOI bbox/polygon participation in aliveness, and
GEOMETRY_CHANGE computed on the CLIPPED geometry (CellIterator.java:
685-697), so member changes entirely outside the box yield
empty-activity contributions.

The reference tests' grid-cell-prefilter aspects (a GridOSH cell whose
bbox misses the query AOI is skipped wholesale) are storage-layer
behavior; the engine's analogue — cell-range pruning before the view —
is covered by the tiling/pruned-scan tests.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oshdb_spark.api import OSHDB, ContributionView
from oshdb_spark.geometry.model import _iter_coords, from_wkt
from oshdb_spark.timestamps import parse_iso

from tests.osmhistory_harness import spark_fixture

WORLD = (-180.0, -90.0, 180.0, 90.0)


def _t(iso: str) -> int:
    return parse_iso(iso) // 1_000_000


@pytest.fixture(scope="module")
def db(spark):
    rows, schema, tr = spark_fixture("history_not_mp")
    return OSHDB(spark, spark.createDataFrame(rows, schema), translator=tr)


def _result(db, rid, t0="2000-01-01", t1="2020-01-01", bbox=WORLD,
            polygon=None):
    v = (
        ContributionView.on(db)
        .timestamps([_t(t0), _t(t1)])
        .osm_type("relation")
        .filter(F.col("id") == rid)
    )
    if polygon is not None:
        v = v.area_of_interest(polygon=polygon)
    else:
        v = v.area_of_interest(bbox=bbox)
    return v.dataframe().orderBy("ts").collect()


def _acts(rows):
    return [sorted(r["contrib_types"]) for r in rows]


def _rect(minx, miny, maxx, maxy):
    return {
        "type": "Polygon",
        "coordinates": [[[minx, miny], [maxx, miny], [maxx, maxy],
                         [minx, maxy], [minx, miny]]],
    }


def _is_collection(r):
    return (r["wkt"] or "").startswith("GEOMETRYCOLLECTION")


def test_geometry_change(db):
    # relation 500: creation + 2 member-driven geometry changes
    rows = _result(db, 500)
    assert len(rows) == 3
    assert _acts(rows) == [
        ["CREATION"], ["GEOMETRY_CHANGE"], ["GEOMETRY_CHANGE"]]
    assert rows[0]["changeset"] == 300
    assert all(_is_collection(r) for r in rows)


def test_visible_change(db):
    # relation 501: creation, deletion, re-creation
    rows = _result(db, 501)
    assert len(rows) == 3
    assert _acts(rows) == [["CREATION"], ["DELETION"], ["CREATION"]]
    assert rows[0]["changeset"] == 303


def test_ways_not_existent(db):
    # relation 502: both member ways missing -> must not throw
    _result(db, 502)


def test_tag_change(db):
    rows = _result(db, 503)
    assert len(rows) == 3
    assert _acts(rows) == [["CREATION"], ["TAG_CHANGE"], ["TAG_CHANGE"]]
    assert rows[0]["changeset"] == 307


def test_geometry_change_of_node_refs_in_ways(db):
    # relation 504: 8 member-driven events; the later ones don't change
    # the geometry (equal before/after) -> empty activities
    rows = _result(db, 504)
    assert len(rows) == 8
    assert _acts(rows)[0] == ["CREATION"]
    assert _acts(rows)[1] == ["GEOMETRY_CHANGE"]
    assert rows[0]["changeset"] == 310
    assert rows[0]["prev_wkt"] is None
    assert _is_collection(rows[0]) and _is_collection(rows[1])
    assert rows[1]["wkt"] != rows[1]["prev_wkt"]
    assert rows[2]["wkt"] == rows[2]["prev_wkt"]


def test_geometry_change_of_node_coordinates_in_way(db):
    rows = _result(db, 505)
    assert len(rows) == 3
    assert _acts(rows)[0] == ["CREATION"]
    assert _acts(rows)[1] == ["GEOMETRY_CHANGE"]
    assert rows[0]["changeset"] == 312
    assert rows[0]["prev_wkt"] is None
    assert _is_collection(rows[0]) and _is_collection(rows[1])
    assert rows[1]["wkt"] != rows[1]["prev_wkt"]
    assert rows[2]["wkt"] != rows[2]["prev_wkt"]


def test_geometry_change_of_node_coordinates_in_relation_and_way(db):
    rows = _result(db, 506)
    assert len(rows) == 3
    assert _acts(rows)[0] == ["CREATION"]
    assert _acts(rows)[1] == ["GEOMETRY_CHANGE"]
    assert rows[0]["changeset"] == 313
    assert rows[0]["prev_wkt"] is None
    assert rows[1]["wkt"] != rows[1]["prev_wkt"]
    assert rows[2]["wkt"] != rows[2]["prev_wkt"]


def test_geometry_collection(db):
    rows = _result(db, 507)
    assert len(rows) == 3
    assert _acts(rows)[0] == ["CREATION"]
    assert rows[0]["changeset"] == 314
    assert rows[0]["prev_wkt"] is None
    assert all(_is_collection(r) for r in rows)


def test_nodes_of_ways_not_existent(db):
    # relation 508: member ways' nodes missing -> must not throw
    _result(db, 508)


def test_visible_change_of_node_in_way(db):
    rows = _result(db, 509)
    assert len(rows) == 5
    assert _acts(rows) == [["CREATION"]] + [["GEOMETRY_CHANGE"]] * 4
    assert rows[0]["changeset"] == 316
    assert rows[0]["prev_wkt"] is None
    assert all(_is_collection(r) for r in rows)
    assert rows[1]["wkt"] != rows[1]["prev_wkt"]
    assert rows[2]["wkt"] != rows[2]["prev_wkt"]


def test_tag_change_of_node_in_way(db):
    rows = _result(db, 510)
    assert len(rows) == 4
    assert _acts(rows)[0] == ["CREATION"]
    assert rows[0]["changeset"] == 317
    assert rows[0]["prev_wkt"] is None


def test_visible_change_of_way(db):
    rows = _result(db, 511)
    assert len(rows) == 3
    assert _acts(rows)[0] == ["CREATION"]
    assert rows[0]["changeset"] == 318
    assert rows[0]["prev_wkt"] is None


def test_visible_change_of_one_way_of_outer_ring(db):
    rows = _result(db, 512)
    assert len(rows) == 2
    assert _acts(rows) == [["CREATION"], ["GEOMETRY_CHANGE"]]
    assert rows[0]["changeset"] == 319
    assert rows[0]["prev_wkt"] is None
    assert all(_is_collection(r) for r in rows)


def test_tag_change_of_way(db):
    rows = _result(db, 513)
    assert len(rows) == 3
    assert _acts(rows)[0] == ["CREATION"]
    assert rows[0]["changeset"] == 320
    assert rows[0]["prev_wkt"] is None
    assert _is_collection(rows[0]) and _is_collection(rows[1])


def test_one_of_two_polygons_disappears(db):
    rows = _result(db, 514)
    assert len(rows) == 2
    assert _acts(rows) == [["CREATION"], ["GEOMETRY_CHANGE"]]
    assert rows[0]["changeset"] == 321
    assert rows[0]["prev_wkt"] is None
    assert _is_collection(rows[0]) and _is_collection(rows[1])


def test_way_split_up_in_two(db):
    rows = _result(db, 515)
    assert len(rows) == 3
    assert _acts(rows) == [
        ["CREATION"], ["GEOMETRY_CHANGE"], ["GEOMETRY_CHANGE"]]
    assert rows[0]["changeset"] == 323
    assert rows[0]["prev_wkt"] is None
    assert all(_is_collection(r) for r in rows)


def test_polygon_intersecting_data_partly(db):
    rows = _result(db, 516, t1="2018-01-01",
                   polygon=_rect(10.8, 10.3, 22.7, 22.7), bbox=None)
    assert len(rows) == 3


def test_polygon_intersecting_data_completely(db):
    rows = _result(db, 516, t1="2018-01-01",
                   polygon=_rect(10.8, 10.3, 52.7, 52.7), bbox=None)
    assert len(rows) == 3


def test_polygon_not_intersecting_data(db):
    rows = _result(db, 516, t1="2018-01-01",
                   polygon=_rect(48, 49, 49, 50), bbox=None)
    assert rows == []


def test_node_change_outside_bbox(db):
    # relation 516: two 5-point ways make a polygonal outline; member
    # nodes OUTSIDE the bbox move in 2009 and 2011, only the 2011 move
    # changes the part inside the bbox -> the 2009 event has EMPTY
    # activities (GEOMETRY_CHANGE compares clipped geometries)
    rows = _result(db, 516, t1="2019-08-01", bbox=(10.8, 10.3, 22.7, 22.7))
    assert _acts(rows)[0] == ["CREATION"]
    assert _acts(rows)[1] == []
    assert _acts(rows)[2] == ["GEOMETRY_CHANGE"]
    n_pts = sum(1 for _ in _iter_coords(from_wkt(rows[1]["clipped_wkt"])))
    assert n_pts == 7


def test_node_change_outside_polygon(db):
    # the POLYGON-AOI twin of test_node_change_outside_bbox: with a
    # polygon areaOfInterest, GEOMETRY_CHANGE must also compare the
    # geometries CLIPPED to the AOI (CellIterator.java:685-697) — the
    # 2009 member move entirely outside the polygon yields an
    # empty-activity contribution, not GEOMETRY_CHANGE
    rows = _result(db, 516, t1="2019-08-01",
                   polygon=_rect(10.8, 10.3, 22.7, 22.7), bbox=None)
    assert _acts(rows)[0] == ["CREATION"]
    assert _acts(rows)[1] == []
    assert _acts(rows)[2] == ["GEOMETRY_CHANGE"]
    n_pts = sum(1 for _ in _iter_coords(from_wkt(rows[1]["clipped_wkt"])))
    assert n_pts == 7


def test_node_change_outside_nonconvex_polygon(db):
    # same scenario through the general (PreparedPolygon) clipper: an
    # L-shaped AOI covering the same data region — still empty activities
    # for the outside move, still GEOMETRY_CHANGE for the inside one
    l_shape = {
        "type": "Polygon",
        "coordinates": [[[10.8, 10.3], [22.7, 10.3], [22.7, 22.7],
                         [16.0, 22.7], [16.0, 16.0], [10.8, 16.0],
                         [10.8, 10.3]]],
    }
    rows = _result(db, 516, t1="2019-08-01", polygon=l_shape, bbox=None)
    assert _acts(rows)[0] == ["CREATION"]
    assert _acts(rows)[1] == []
    assert _acts(rows)[2] == ["GEOMETRY_CHANGE"]


def test_polygon_completely_time_interval_after_changes(db):
    rows = _result(db, 517, t0="2016-01-01", t1="2018-01-01",
                   polygon=_rect(10.8, 10.3, 52.7, 52.7), bbox=None)
    assert rows == []


def test_time_interval_after_changes(db):
    rows = _result(db, 517, t0="2016-01-01", t1="2018-01-01",
                   bbox=(10.8, 10.3, 52.7, 52.7))
    assert rows == []


def test_bbox_outside_polygon(db):
    rows = _result(db, 516, t1="2018-01-01", bbox=(50.0, 50.0, 52.0, 52.0))
    assert rows == []


def test_self_intersecting_polygon_clipped(db):
    # relation 520: self-crossing way; must produce one contribution with
    # a collection geometry, not crash the clipper
    rows = _result(db, 520, t1="2018-01-01",
                   polygon=_rect(7.31, 1.0, 7.335, 2.0), bbox=None)
    assert len(rows) == 1
    assert _is_collection(rows[0])


def test_members_disappear(db):
    rows = _result(db, 521, bbox=(10.8, 10.3, 22.7, 22.7))
    assert len(rows) == 4
    assert _acts(rows)[0] == ["CREATION"]


def test_members_disappear_and_previous_is_null(db):
    # relation 522: last version has no members, previous invisible;
    # interval covers only the last version -> nothing to report
    rows = _result(db, 522, t0="2012-01-01", bbox=(10.8, 10.3, 22.7, 22.7))
    assert rows == []


def test_time_interval_after_deletion_in_current_version_clipped(db):
    # relation 523: invisible in v1 and v3; interval covers v3 -> DELETION
    rows = _result(db, 523, t0="2016-01-01",
                   polygon=_rect(10.8, 10.3, 22.7, 22.7), bbox=None)
    assert len(rows) == 1
    assert _acts(rows) == [["DELETION"]]


# -- NotOsmTypeSpecific semantic parts (node-member relation 80 over
#    not-osm-type-specific.osm is folded into history_polygon's sibling
#    dataset; here: the polygon-AOI semantics with the tiny dataset) ------


@pytest.fixture(scope="module")
def db_polygon(spark):
    rows, schema, tr = spark_fixture("history_polygon")
    return OSHDB(spark, spark.createDataFrame(rows, schema), translator=tr)


def test_triangle_aoi_id_filter(db_polygon):
    # IterateByContributionNotOsmTypeSpecificTest.testCellCoveringPolygon:
    # triangle AOI + id filter 80 — no relation 80 exists in polygon.osm,
    # so the result is empty (1:1 with the reference's assertion)
    tri = {"type": "Polygon", "coordinates": [[[10.8, 10.3], [12.7, 12.7],
                                               [12.7, 10.3], [10.8, 10.3]]]}
    rows = _result(db_polygon, 80, t1="2018-01-01", polygon=tri, bbox=None)
    assert rows == []
    # complementary: relation 516's collection geometry DOES cross the
    # triangle — polygon refinement keeps (and clips) collection rows
    rows = _result(db_polygon, 516, t1="2018-01-01", polygon=tri, bbox=None)
    assert len(rows) == 3
    assert all(_is_collection(r) for r in rows)


def test_world_polygon_keeps_everything(db_polygon):
    # testCellFullyInsidePolygon: whole-world polygon -> non-empty
    world = _rect(-180, -90, 180, 90)
    rows = _result(db_polygon, 500, t1="2018-01-01", polygon=world,
                   bbox=None)
    assert rows != []
