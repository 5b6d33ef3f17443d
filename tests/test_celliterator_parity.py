"""Reference CellIterator contribution scenarios, ported node fixture.

Fixture data transcribed from
/root/reference/oshdb-util/src/test/resources/different-timestamps/node.osm
(nodes 1-8, 14); expected results from
/root/reference/oshdb-util/src/test/java/org/heigit/ohsome/oshdb/util/celliterator/IterateByContributionNodesTest.java
(testGeometryChange :46, testTagChange :86, testVisibleChange :122,
testMultipleChanges :164, testTagChangeTagFilterWithSuccess :299,
testTagChangeTagFilterDisused :336, testMoreComplicatedFilter :368,
testTagChangeTagFilterWithoutSuccess :400).
"""

import pytest
from pyspark.sql import functions as F

from oshdb_spark.api import OSHDB, ContributionView
from oshdb_spark.filters.dsl import TagTranslator
from oshdb_spark.geometry.model import from_wkt
from oshdb_spark.timestamps import parse_iso

# key/value dictionary for the fixture (keytables)
K = {"created_by": 1, "highway": 2, "shop": 3, "disused:shop": 4,
     "leaf_cycle": 5, "leaf_type": 6, "natural": 7, "amenity": 8}
V = {("created_by", "test"): 1,
     ("highway", "traffic_signals"): 1, ("highway", "street_lamp"): 2,
     ("shop", "supermarket"): 1, ("disused:shop", "supermarket"): 1,
     ("leaf_cycle", "deciduous"): 1, ("leaf_type", "broadleaved"): 1,
     ("natural", "tree"): 1}
TR = TagTranslator(keys=K, values=V)


def _t(iso: str) -> int:
    return parse_iso(iso) // 1_000_000  # fixture works in epoch seconds


def _tags(*pairs):
    return {K[k]: V[(k, v)] for k, v in pairs}


def _node(nid, version, visible, ts, cs, uid, lon, lat, tags):
    return (
        f"n{nid}v{version}", nid, "node", version, visible, _t(ts), cs, uid,
        tags, int(lon * 1e7) if lon is not None else 0,
        int(lat * 1e7) if lat is not None else 0, None, None,
    )


ROWS = [
    # node 1: creation + two geometry changes (no tag changes)
    _node(1, 1, True, "2008-01-01", 1, 1, 1.42, 1.22, _tags(("created_by", "test"))),
    _node(1, 2, True, "2009-02-01", 2, 2, 1.42, 1.225, _tags(("created_by", "test"))),
    _node(1, 3, True, "2010-02-03", 3, 1, 1.425, 1.23, _tags(("created_by", "test"))),
    # node 2: creation + two tag changes (no geometry changes)
    _node(2, 1, True, "2007-01-01", 3, 11, 1.43, 1.24, _tags(("created_by", "test"))),
    _node(2, 2, True, "2008-01-01", 4, 12, 1.43, 1.24,
          _tags(("created_by", "test"), ("highway", "traffic_signals"))),
    _node(2, 3, True, "2014-01-01", 5, 13, 1.43, 1.24, _tags(("highway", "street_lamp"))),
    # node 3: visibility flips
    _node(3, 1, True, "2007-01-01", 6, 11, 1.44, 1.24,
          _tags(("created_by", "test"), ("highway", "traffic_signals"))),
    _node(3, 2, False, "2008-01-01", 7, 11, None, None, {}),
    _node(3, 3, True, "2014-01-01", 8, 11, 1.44, 1.24,
          _tags(("created_by", "test"), ("highway", "traffic_signals"))),
    _node(3, 5, False, "2015-01-01", 9, 11, None, None, {}),
    _node(3, 6, True, "2016-01-01", 10, 11, 1.44, 1.24,
          _tags(("created_by", "test"), ("highway", "traffic_signals"))),
    # node 4: many kinds of changes
    _node(4, 1, True, "2007-01-01", 11, 1, 1.42, 1.21, _tags(("created_by", "test"))),
    _node(4, 2, True, "2008-01-01", 12, 1, 1.425, 1.20,
          _tags(("created_by", "test"), ("highway", "traffic_signals"))),
    _node(4, 3, False, "2010-01-01", 13, 11, None, None, {}),
    _node(4, 4, True, "2011-01-01", 14, 11, 1.42, 1.21, _tags(("highway", "traffic_signals"))),
    _node(4, 5, True, "2014-01-01", 15, 1, 1.42, 1.215, _tags(("highway", "traffic_signals"))),
    _node(4, 7, True, "2017-01-01", 16, 11, 1.42, 1.215,
          _tags(("leaf_cycle", "deciduous"), ("leaf_type", "broadleaved"), ("natural", "tree"))),
    # node 5: shop <-> disused:shop flips
    _node(5, 1, True, "2007-01-01", 17, 11, 3.43, 1.24, _tags(("shop", "supermarket"))),
    _node(5, 2, True, "2008-01-01", 18, 12, 3.43, 1.24, _tags(("disused:shop", "supermarket"))),
    _node(5, 3, True, "2010-01-01", 19, 13, 3.43, 1.24, _tags(("shop", "supermarket"))),
    _node(5, 4, True, "2016-01-01", 20, 12, 3.43, 1.24, _tags(("disused:shop", "supermarket"))),
    # node 6: moves out of the query polygon in v2
    _node(6, 1, True, "2007-01-01", 21, 11, 10.9, 12.1, _tags(("shop", "supermarket"))),
    _node(6, 2, True, "2008-01-01", 22, 12, 8.1, 8.4, _tags(("disused:shop", "supermarket"))),
    # nodes 10-14: positions relative to a query polygon
    _node(10, 1, True, "2007-01-01", 32, 11, -1.0, -1.0, {}),
    _node(11, 1, True, "2007-01-01", 33, 11, 2.0, 2.0, {}),
    _node(12, 1, True, "2007-01-01", 34, 11, 1.0, 1.0, {}),
    _node(13, 1, True, "2007-01-01", 35, 11, 0.5, 0.5, {}),
    _node(14, 1, True, "2007-01-01", 36, 11, 1.0, 1.0, {}),
    _node(14, 2, True, "2008-01-01", 37, 11, 0.5, 0.5, {}),
    # node 7: disused:shop focus
    _node(7, 1, True, "2007-01-01", 23, 11, 3.43, 1.24, _tags(("shop", "supermarket"))),
    _node(7, 2, True, "2008-01-01", 24, 12, 3.4, 1.24, _tags(("disused:shop", "supermarket"))),
    _node(7, 3, True, "2014-01-01", 25, 13, 3.43, 1.24, _tags(("shop", "supermarket"))),
    _node(7, 4, True, "2015-01-01", 26, 12, 3.43, 1.24, _tags(("disused:shop", "supermarket"))),
    # node 8: shop + moves out of the query bbox in v2
    _node(8, 1, True, "2007-01-01", 27, 11, 3.43, 1.24, _tags(("shop", "supermarket"))),
    _node(8, 2, True, "2008-01-01", 28, 12, -10.0, 1.24, _tags(("shop", "supermarket"))),
    _node(8, 3, True, "2008-01-02", 29, 12, 3.4, 1.24, _tags(("disused:shop", "supermarket"))),
    _node(8, 4, True, "2014-01-01", 30, 13, 3.43, 1.24, _tags(("shop", "supermarket"))),
    _node(8, 5, True, "2015-01-01", 31, 12, 3.43, 1.24, _tags(("disused:shop", "supermarket"))),
]

ENT_SCHEMA = (
    "doc_id string, id long, type string, version int, visible boolean, "
    "ts long, changeset long, uid int, tags map<int,int>, lon long, lat long, "
    "refs array<long>, members array<struct<type:string,ref:long,role:string>>"
)

T2000, T2007, T2018 = _t("2000-01-01"), _t("2007-01-01"), _t("2018-01-01")


@pytest.fixture(scope="module")
def db(spark):
    return OSHDB(spark, spark.createDataFrame(ROWS, ENT_SCHEMA), translator=TR)


def _contribs(db, nid, t0=T2000, t1=T2018, flt=None, bbox=None):
    v = ContributionView.on(db).timestamps([t0, t1]).filter(F.col("id") == nid)
    if flt:
        v = v.filter(flt)
    if bbox:
        v = v.area_of_interest(bbox=bbox)
    rows = v.dataframe().orderBy("ts").collect()
    return [(sorted(r["contrib_types"]), r["changeset"]) for r in rows]


def test_geometry_change(db):  # IterateByContributionNodesTest:46-84
    res = _contribs(db, 1)
    assert [t for t, _ in res] == [
        ["CREATION"], ["GEOMETRY_CHANGE"], ["GEOMETRY_CHANGE"]
    ]
    assert res[0][1] == 1


def test_tag_change(db):  # :86-120
    res = _contribs(db, 2)
    assert [t for t, _ in res] == [["CREATION"], ["TAG_CHANGE"], ["TAG_CHANGE"]]
    assert res[0][1] == 3


def test_visible_change(db):  # :122-161
    res = _contribs(db, 3)
    assert [t for t, _ in res] == [
        ["CREATION"], ["DELETION"], ["CREATION"], ["DELETION"], ["CREATION"]
    ]
    assert res[0][1] == 6


def test_multiple_changes(db):  # :164-216
    res = _contribs(db, 4)
    assert [t for t, _ in res] == [
        ["CREATION"],
        ["GEOMETRY_CHANGE", "TAG_CHANGE"],
        ["DELETION"],
        ["CREATION"],
        ["GEOMETRY_CHANGE"],
        ["TAG_CHANGE"],
    ]
    assert res[0][1] == 11


def test_tag_filter_with_success(db):  # :299-334 (filtered contributions)
    res = _contribs(db, 5, flt="shop=*")
    assert [t for t, _ in res] == [
        ["CREATION"], ["DELETION"], ["CREATION"], ["DELETION"]
    ]


def test_tag_filter_disused(db):  # :336-366
    res = _contribs(db, 7, t0=T2007, flt='"disused:shop"=*')
    assert [t for t, _ in res] == [["CREATION"], ["DELETION"], ["CREATION"]]


def test_filter_and_bbox(db):  # :368-398 testMoreComplicatedFilter
    res = _contribs(db, 8, t0=T2007, flt="shop=*", bbox=(0.0, 0.0, 180.0, 90.0))
    assert len(res) == 4
    assert [t for t, _ in res][:3] == [["CREATION"], ["DELETION"], ["CREATION"]]


def test_tag_filter_without_success(db):  # :400-419
    res = _contribs(db, 5, flt="amenity=*")
    assert res == []


# ---------------------------------------------------------------------------
# snapshot view scenarios (IterateByTimestampsNodesTest.java:44-146)
# ---------------------------------------------------------------------------

from oshdb_spark.api import SnapshotView  # noqa: E402
from oshdb_spark.timestamps import timestamps as make_ts  # noqa: E402

YEARLY = [t // 1_000_000 for t in make_ts("2000-01-01", "2018-01-01", "P1Y")]


def _snaps(db, nid):
    rows = (
        SnapshotView.on(db)
        .timestamps(YEARLY)
        .filter(F.col("id") == nid)
        .dataframe()
        .orderBy("snap_ts")
        .collect()
    )
    return rows


def test_snapshot_geometry_change(db):  # IterateByTimestampsNodesTest:44-67
    rows = _snaps(db, 1)
    assert len(rows) == 11  # 2008..2018
    # v1 at 2008+2009, v2 at 2010, v3 from 2011 on
    assert rows[0]["wkt"] == rows[1]["wkt"]
    assert rows[1]["wkt"] != rows[2]["wkt"]
    assert rows[2]["wkt"] != rows[3]["wkt"]
    assert rows[3]["wkt"] == rows[10]["wkt"]


def test_snapshot_tag_change(db):  # :69-101
    rows = _snaps(db, 2)
    assert len(rows) == 12  # 2007..2018
    assert rows[0]["tags"] != rows[1]["tags"]      # v2 @ 2008-01-01 exactly
    assert rows[1]["tags"] == rows[6]["tags"]      # unchanged through 2013
    assert rows[6]["tags"] != rows[7]["tags"]      # v3 @ 2014-01-01
    assert rows[7]["tags"] == rows[11]["tags"]


def test_snapshot_visible_change(db):  # :103-120
    rows = _snaps(db, 3)
    assert len(rows) == 5  # 2007, 2014, 2016, 2017, 2018
    years = [r["snap_ts"] for r in rows]
    assert years == [
        _t("2007-01-01"), _t("2014-01-01"),
        _t("2016-01-01"), _t("2017-01-01"), _t("2018-01-01"),
    ]


def test_snapshot_multiple_changes(db):  # :121-168
    rows = _snaps(db, 4)
    assert len(rows) == 11  # 2007-2009 + 2011-2018
    assert rows[0]["wkt"] != rows[1]["wkt"]        # v2 geometry @ 2008
    assert rows[1]["wkt"] == rows[2]["wkt"]
    assert rows[2]["wkt"] != rows[3]["wkt"]        # recreated @ 2011
    assert rows[0]["tags"] != rows[1]["tags"]
    assert rows[2]["tags"] != rows[3]["tags"]


# ---------------------------------------------------------------------------
# way scenarios with member resolution
# (IterateByContributionWaysTest.java:43-141; fixture
#  different-timestamps/way.osm nodes 1-15, ways 100-101)
# ---------------------------------------------------------------------------


def _way(wid, version, visible, ts, cs, uid, refs, tags):
    return (
        f"w{wid}v{version}", wid, "way", version, visible, _t(ts), cs, uid,
        tags, None, None, refs, None,
    )


WAY_ROWS = [
    # static nodes 1-10 (lat 1.22 + k/100 at lon 1.42/1.43)
    *[
        _node(k, 1, True, "2007-01-01", k, 1, 1.42 + (0.01 if k >= 8 else 0),
              1.21 + k / 100.0, _tags(("created_by", "test")))
        for k in range(1, 11)
    ],
    # node 11: three positions over time
    _node(11, 1, True, "2008-01-01", 11, 1, 1.42, 1.22, _tags(("created_by", "test"))),
    _node(11, 2, True, "2009-02-01", 12, 2, 1.42, 1.225, _tags(("created_by", "test"))),
    _node(11, 3, True, "2010-02-03", 13, 1, 1.425, 1.23, _tags(("created_by", "test"))),
    # node 15: three positions over time
    _node(15, 1, True, "2007-01-01", 28, 1, 1.44, 1.22, _tags(("created_by", "test"))),
    _node(15, 2, True, "2009-02-01", 29, 2, 1.445, 1.225, _tags(("created_by", "test"))),
    _node(15, 3, True, "2010-02-03", 30, 1, 1.44, 1.23, _tags(("created_by", "test"))),
    # way 100: grows 4 -> 8 -> 9 nodes
    _way(100, 1, True, "2009-01-01", 31, 1, [1, 2, 3, 4], {}),
    _way(100, 2, True, "2010-01-01", 32, 2, [1, 2, 3, 4, 5, 6, 7, 8], {}),
    _way(100, 3, True, "2011-01-01", 33, 1, [1, 2, 3, 4, 5, 7, 8, 9, 10], {}),
    # way 101: 2 nodes whose positions change, then a third node added
    _way(101, 1, True, "2008-02-01", 34, 1, [11, 15], {}),
    _way(101, 2, True, "2016-01-01", 35, 1, [11, 15, 9], {}),
]


@pytest.fixture(scope="module")
def way_db(spark):
    return OSHDB(spark, spark.createDataFrame(WAY_ROWS, ENT_SCHEMA), translator=TR)


def _n_points(wkt: str) -> int:
    return wkt.count(",") + 1


def test_way_geometry_change(way_db):  # IterateByContributionWaysTest:43-90
    v = (
        ContributionView.on(way_db)
        .timestamps([T2000, T2018])
        .filter(F.col("id") == 100)
    )
    rows = v.dataframe().orderBy("ts").collect()
    assert [sorted(r["contrib_types"]) for r in rows] == [
        ["CREATION"], ["GEOMETRY_CHANGE"], ["GEOMETRY_CHANGE"]
    ]
    assert rows[0]["changeset"] == 31
    assert [_n_points(r["wkt"]) for r in rows] == [4, 8, 9]
    assert all(r["wkt"].startswith("LINESTRING") for r in rows)
    assert rows[0]["prev_wkt"] is None
    assert rows[1]["wkt"] != rows[1]["prev_wkt"]
    assert rows[2]["wkt"] != rows[2]["prev_wkt"]


def test_way_member_node_geometry_change(way_db):  # :92-141
    """The way itself has 2 versions, but its member nodes move — member
    modifications become way contributions (OSHEntityTimeUtils member
    timestamp recursion)."""
    v = (
        ContributionView.on(way_db)
        .timestamps([T2000, T2018])
        .filter(F.col("id") == 101)
    )
    rows = v.dataframe().orderBy("ts").collect()
    assert [sorted(r["contrib_types"]) for r in rows] == [
        ["CREATION"], ["GEOMETRY_CHANGE"], ["GEOMETRY_CHANGE"], ["GEOMETRY_CHANGE"]
    ]
    assert [r["ts"] for r in rows] == [
        _t("2008-02-01"), _t("2009-02-01"), _t("2010-02-03"), _t("2016-01-01")
    ]
    assert [_n_points(r["wkt"]) for r in rows] == [2, 2, 2, 3]


# ---------------------------------------------------------------------------
# relation (multipolygon) scenarios
# (IterateByContributionRelationsTest.java:53-133; fixture
#  different-timestamps/polygon.osm nodes 11-35, ways 102-108, rels 500-501)
# ---------------------------------------------------------------------------


def _rel(rid, version, visible, ts, cs, uid, way_refs, tags):
    members = (
        [{"type": "way", "ref": r, "role": "outer"} for r in way_refs]
        if way_refs
        else None
    )
    return (
        f"r{rid}v{version}", rid, "relation", version, visible, _t(ts), cs, uid,
        tags, None, None, None, members,
    )


# default interpreter tag codes: 4=type (1=multipolygon), 5=landuse
MP_TAGS = {4: 1, 5: 1}

REL_NODES = {
    11: (7.31, 1.01), 12: (7.34, 1.01), 13: (7.34, 1.05), 14: (7.32, 1.05),
    15: (7.32, 1.04), 16: (7.33, 1.04), 17: (7.33, 1.05), 18: (7.33, 1.06),
    19: (7.32, 1.06), 20: (7.32, 1.05), 24: (7.33, 1.04), 25: (7.33, 1.03),
    26: (7.31, 1.02), 27: (7.31, 1.04), 28: (7.34, 1.01), 29: (7.34, 1.02),
    30: (7.35, 1.02), 31: (7.35, 1.01), 32: (7.32, 1.05), 33: (7.32, 1.07),
    34: (7.31, 1.07), 35: (7.31, 1.05),
}

REL_WAYS = {
    102: ("2007-01-01", 201, [11, 12, 13, 11]),
    103: ("2007-01-01", 202, [13, 14, 15, 16, 13]),
    104: ("2008-01-01", 203, [28, 29, 30, 31, 28]),
    105: ("2008-01-01", 204, [24, 25, 26, 27, 24]),
    107: ("2007-01-01", 206, [32, 33, 34, 35, 32]),
    108: ("2007-01-01", 207, [17, 18, 19, 20, 17]),
}

REL_ROWS = [
    *[
        _node(nid, 1, True, "2007-01-01", nid, 1, lon, lat, {})
        for nid, (lon, lat) in REL_NODES.items()
    ],
    *[
        _way(wid, 1, True, ts, cs, 1, refs, {})
        for wid, (ts, cs, refs) in REL_WAYS.items()
    ],
    # relation 500: member set grows, one way swapped out
    _rel(500, 1, True, "2009-01-01", 300, 1, [102, 103], MP_TAGS),
    _rel(500, 2, True, "2010-01-01", 301, 2, [102, 103, 107], MP_TAGS),
    _rel(500, 3, True, "2012-01-01", 302, 2, [102, 107, 108], MP_TAGS),
    # relation 501: visibility flips
    _rel(501, 1, True, "2010-01-01", 303, 1, [104, 105], MP_TAGS),
    _rel(501, 2, False, "2016-01-01", 304, 1, None, {}),
    _rel(501, 3, True, "2018-01-01", 305, 3, [104, 105], MP_TAGS),
]


@pytest.fixture(scope="module")
def rel_db(spark):
    return OSHDB(spark, spark.createDataFrame(REL_ROWS, ENT_SCHEMA))


def test_relation_geometry_change(rel_db):  # IterateByContributionRelationsTest:53-98
    rows = (
        ContributionView.on(rel_db)
        .timestamps([T2000, _t("2020-01-01")])
        .filter(F.col("id") == 500)
        .dataframe()
        .orderBy("ts")
        .collect()
    )
    assert [sorted(r["contrib_types"]) for r in rows] == [
        ["CREATION"], ["GEOMETRY_CHANGE"], ["GEOMETRY_CHANGE"]
    ]
    assert rows[0]["changeset"] == 300
    # two outers touching only at one node -> MultiPolygon throughout
    assert all(r["wkt"].startswith("MULTIPOLYGON") for r in rows)


def test_relation_visible_change(rel_db):  # :100-133
    rows = (
        ContributionView.on(rel_db)
        .timestamps([T2000, _t("2020-01-01")])
        .filter(F.col("id") == 501)
        .dataframe()
        .orderBy("ts")
        .collect()
    )
    assert [sorted(r["contrib_types"]) for r in rows] == [
        ["CREATION"], ["DELETION"], ["CREATION"]
    ]
    assert rows[0]["changeset"] == 303
    assert rows[0]["wkt"].startswith("MULTIPOLYGON")


# ---------------------------------------------------------------------------
# polygon area-of-interest scenarios
# (IterateByContributionNodesTest.java:421-508)
# ---------------------------------------------------------------------------

POLY_BIG = {
    "type": "Polygon",
    "coordinates": [[[10.8, 10.3], [10.8, 22.7], [22.7, 22.7], [22.7, 10.3],
                     [10.8, 10.3]]],
}
POLY_TRI = {
    "type": "Polygon",
    "coordinates": [[[0.0, 0.0], [1.5, 0.0], [0.0, 1.5], [0.0, 0.0]]],
}


def test_polygon_intersecting_partly(db):  # :421-446
    """node 6 moves out of the query polygon in v2 -> CREATION + DELETION."""
    rows = (
        ContributionView.on(db)
        .timestamps([T2000, T2018])
        .filter(F.col("id") == 6)
        .area_of_interest(polygon=POLY_BIG)
        .dataframe()
        .orderBy("ts")
        .collect()
    )
    assert [sorted(r["contrib_types"]) for r in rows] == [["CREATION"], ["DELETION"]]


def test_tag_filter_and_polygon(db):  # :448-477
    rows = (
        ContributionView.on(db)
        .timestamps([T2000, T2018])
        .filter(F.col("id") == 6)
        .filter("shop=*")
        .area_of_interest(polygon=POLY_BIG)
        .dataframe()
        .orderBy("ts")
        .collect()
    )
    assert [sorted(r["contrib_types"]) for r in rows] == [["CREATION"], ["DELETION"]]


def test_coordinates_relative_to_polygon(db):  # :480-508
    rows = (
        ContributionView.on(db)
        .timestamps([T2007, _t("2009-01-01")])
        .filter((F.col("id") >= 10) & (F.col("id") < 20))
        .area_of_interest(polygon=POLY_TRI)
        .dataframe()
        .orderBy("ts")
        .collect()
    )
    assert [(r["id"], sorted(r["contrib_types"])) for r in rows] == [
        (13, ["CREATION"]), (14, ["CREATION"])
    ]


# ---------------------------------------------------------------------------
# snapshot view over ways (IterateByTimestampsWaysTest.java:44-150)
# ---------------------------------------------------------------------------


def test_snapshot_way_geometry_growth(way_db):  # :44-92 (10 rows, 4/8/9 pts)
    rows = (
        SnapshotView.on(way_db)
        .timestamps(YEARLY)
        .filter(F.col("id") == 100)
        .dataframe()
        .orderBy("snap_ts")
        .collect()
    )
    assert len(rows) == 10  # 2009..2018
    assert [_n_points(r["wkt"]) for r in rows[:3]] == [4, 8, 9]
    assert all(r["wkt"].startswith("LINESTRING") for r in rows)


def test_snapshot_way_member_motion(way_db):  # :94-126 member node moves
    rows = (
        SnapshotView.on(way_db)
        .timestamps(YEARLY)
        .filter(F.col("id") == 101)
        .dataframe()
        .orderBy("snap_ts")
        .collect()
    )
    assert len(rows) == 10  # 2009..2018 (created 2008-02-01, after 2008-01-01)
    # nodes moved in feb 2009 and feb 2010: snapshot geometries change at
    # 2010 and 2011 snapshots; way v2 (3 nodes) from 2016
    assert rows[0]["wkt"] != rows[1]["wkt"]
    assert rows[1]["wkt"] != rows[2]["wkt"]
    assert rows[2]["wkt"] == rows[3]["wkt"]
    assert [_n_points(r["wkt"]) for r in rows] == [2] * 7 + [3] * 3


def test_snapshot_relation_multipolygon(rel_db):
    """Relation 500 snapshots: member growth reflected per year
    (IterateByTimestampsRelationsTest geometry-change analogue)."""
    rows = (
        SnapshotView.on(rel_db)
        .timestamps(YEARLY)
        .filter(F.col("id") == 500)
        .dataframe()
        .orderBy("snap_ts")
        .collect()
    )
    assert len(rows) == 10  # 2009..2018
    assert all(r["wkt"].startswith("MULTIPOLYGON") for r in rows)
    assert rows[0]["wkt"] != rows[1]["wkt"]  # member added 2010
    assert rows[1]["wkt"] != rows[3]["wkt"]  # member swap 2012
    assert rows[3]["wkt"] == rows[9]["wkt"]  # stable afterwards


# ---------------------------------------------------------------------------
# further relation (multipolygon) contribution scenarios
# (IterateByContributionRelationsTest.java:134-340, 896-921; fixture
#  different-timestamps/polygon.osm rels 502-507, 521)
# ---------------------------------------------------------------------------

# default-interpreter codes: 2=building(1=yes), 4=type(1=multipolygon),
# 5=landuse (values arbitrary), 7=leisure-analog (uninterpreted key)
MP = {4: 1}


def _rel_m(rid, version, visible, ts, cs, uid, members, tags):
    ms = (
        [{"type": t, "ref": r, "role": role} for t, r, role in members]
        if members
        else None
    )
    return (
        f"r{rid}v{version}", rid, "relation", version, visible, _t(ts), cs, uid,
        tags, None, None, None, ms,
    )


REL2_ROWS = [
    # nodes (polygon.osm 17-20, 36-51; node 48/49/50/51 move over time)
    *[
        _node(nid, 1, True, "2007-01-01", 100 + nid, 1, lon, lat, {})
        for nid, (lon, lat) in {
            17: (7.33, 1.05), 18: (7.33, 1.06), 19: (7.32, 1.06), 20: (7.32, 1.05),
            36: (7.26, 1.05), 37: (7.265, 1.06), 38: (7.28, 1.06), 39: (7.265, 1.05),
            40: (7.24, 1.04), 41: (7.24, 1.07), 42: (7.30, 1.07), 43: (7.30, 1.04),
            44: (7.26, 1.055), 45: (7.265, 1.065), 46: (7.31, 1.07), 47: (7.31, 1.04),
            48: (7.24, 1.045), 49: (7.245, 1.072), 50: (7.305, 1.078),
            51: (7.303, 1.042),
        }.items()
    ],
    _node(48, 2, True, "2010-01-01", 148, 1, 7.24, 1.048, {}),
    _node(48, 3, True, "2012-01-01", 149, 1, 7.24, 1.042, {}),
    _node(49, 2, True, "2012-01-01", 150, 1, 7.242, 1.07, {}),
    _node(50, 2, True, "2012-01-01", 151, 1, 7.305, 1.07, {}),
    _node(50, 3, True, "2017-01-01", 152, 1, 7.301, 1.072, {}),
    _node(51, 2, True, "2012-01-01", 153, 1, 7.295, 1.039, {}),
    # ways
    _way(108, 1, True, "2007-01-01", 207, 1, [17, 18, 19, 20, 17], {}),
    _way(109, 1, True, "2010-05-01T22:10:52", 208, 1, [44, 37, 38, 45, 44], {}),
    _way(109, 2, True, "2016-11-23T22:10:52", 209, 1, [36, 37, 38, 39, 36], {}),
    _way(110, 1, True, "2010-03-25T20:53:28", 210, 1, [40, 41, 42, 43, 40], {2: 1}),
    _way(110, 2, True, "2011-06-10T22:31:19", 211, 1, [40, 41, 46, 47, 40], {2: 2}),
    _way(110, 3, True, "2012-10-13T20:00:31", 212, 1, [40, 41, 46, 47, 40], {2: 2}),
    _way(110, 4, True, "2012-10-23T20:43:35", 213, 1, [40, 41, 42, 43, 40], {2: 2}),
    _way(110, 5, True, "2016-03-06T22:08:47", 214, 1, [40, 41, 42, 43, 40], {2: 3}),
    _way(110, 6, True, "2016-11-23T23:02:10", 215, 1, [40, 41, 42, 43, 40], {}),
    _way(112, 1, True, "2007-03-06T22:08:47", 218, 1, [48, 49, 50, 51, 48], {2: 2}),
    _way(113, 1, True, "2007-03-06T22:08:47", 219, 1, [48, 49, 51, 48], {}),
    _way(114, 1, True, "2007-03-06T22:08:47", 220, 1, [48, 51], {}),
    # rel 502: all three member ways missing from the extract
    _rel_m(502, 1, True, "2010-01-01", 306, 1,
           [("way", 206, "outer"), ("way", 207, "outer"), ("way", 208, "outer")],
           {**MP, 5: 1}),
    # rel 503: creation + two tag changes
    _rel_m(503, 1, True, "2007-01-01", 307, 1, [("way", 108, "outer")], {**MP, 5: 1}),
    _rel_m(503, 2, True, "2009-01-01", 308, 1, [("way", 108, "outer")], {**MP, 5: 2}),
    _rel_m(503, 3, True, "2011-01-01", 309, 1, [("way", 108, "outer")],
           {**MP, 5: 3, 7: 1}),
    # rel 504: member ways change node refs
    _rel_m(504, 1, True, "2010-07-01T22:10:54", 310, 1,
           [("way", 109, "inner"), ("way", 110, "outer")], {**MP, 2: 1}),
    _rel_m(504, 2, True, "2016-11-26T23:02:16", 311, 1,
           [("way", 109, "inner"), ("way", 110, "outer")], {**MP, 2: 1}),
    # rel 505: single outer way whose nodes move
    _rel_m(505, 1, True, "2010-05-01T22:10:54", 312, 1,
           [("way", 112, "outer")], {**MP, 2: 1}),
    # rel 506: node members + outer way (node motion outside the way)
    _rel_m(506, 1, True, "2010-05-01T22:10:54", 313, 1,
           [("node", 47, ""), ("node", 50, ""), ("way", 113, "outer")],
           {**MP, 2: 1}),
    # rel 507: label/platform roles only -> GeometryCollection
    _rel_m(507, 1, True, "2010-05-01T22:10:54", 314, 1,
           [("node", 47, "label"), ("node", 49, "label"), ("node", 50, "label"),
            ("node", 51, "label"), ("node", 48, "label"),
            ("way", 114, "platform")], {**MP, 2: 1}),
]


@pytest.fixture(scope="module")
def rel2_db(spark):
    return OSHDB(spark, spark.createDataFrame(REL2_ROWS, ENT_SCHEMA))


def _rel_contribs(db, rid):
    rows = (
        ContributionView.on(db)
        .timestamps([T2000, _t("2020-01-01")])
        .filter(F.col("id") == rid)
        .dataframe()
        .orderBy("ts")
        .collect()
    )
    return rows


def test_relation_ways_not_existent(rel2_db):  # :134-152
    # reference asserts only that iteration does not throw on a relation
    # whose member ways are all missing from the extract
    rows = _rel_contribs(rel2_db, 502)
    assert isinstance(rows, list)


def test_relation_tag_change(rel2_db):  # :154-185
    rows = _rel_contribs(rel2_db, 503)
    assert len(rows) == 3
    assert list(rows[0]["contrib_types"]) == ["CREATION"]
    assert list(rows[1]["contrib_types"]) == ["TAG_CHANGE"]
    assert list(rows[2]["contrib_types"]) == ["TAG_CHANGE"]
    assert rows[0]["changeset"] == 307


def test_relation_geometry_change_of_node_refs_in_ways(rel2_db):  # :187-225
    rows = _rel_contribs(rel2_db, 504)
    assert len(rows) == 8
    assert list(rows[0]["contrib_types"]) == ["CREATION"]
    assert list(rows[1]["contrib_types"]) == ["GEOMETRY_CHANGE"]
    assert rows[0]["changeset"] == 310
    assert rows[0]["prev_wkt"] is None
    assert from_wkt(rows[0]["wkt"])["type"] == "Polygon"
    assert from_wkt(rows[1]["wkt"])["type"] == "Polygon"
    assert rows[1]["wkt"] != rows[1]["prev_wkt"]
    assert rows[2]["wkt"] == rows[2]["prev_wkt"]  # version bump, same refs


def test_relation_geometry_change_of_node_coords_in_way(rel2_db):  # :227-264
    rows = _rel_contribs(rel2_db, 505)
    assert len(rows) == 3
    assert list(rows[0]["contrib_types"]) == ["CREATION"]
    assert list(rows[1]["contrib_types"]) == ["GEOMETRY_CHANGE"]
    assert rows[0]["changeset"] == 312
    assert from_wkt(rows[0]["wkt"])["type"] == "Polygon"
    assert rows[1]["wkt"] != rows[1]["prev_wkt"]
    assert rows[2]["wkt"] != rows[2]["prev_wkt"]


def test_relation_node_coords_in_relation_and_way(rel2_db):  # :266-304
    rows = _rel_contribs(rel2_db, 506)
    assert len(rows) == 3
    assert list(rows[0]["contrib_types"]) == ["CREATION"]
    assert list(rows[1]["contrib_types"]) == ["GEOMETRY_CHANGE"]
    assert rows[0]["changeset"] == 313
    assert from_wkt(rows[0]["wkt"])["type"] == "Polygon"
    assert rows[1]["wkt"] != rows[1]["prev_wkt"]
    # node 50 moves in 2017 but is not part of the outer way: geometry same
    assert rows[2]["wkt"] == rows[2]["prev_wkt"]


def test_relation_geometry_collection(rel2_db):  # :306-337
    rows = _rel_contribs(rel2_db, 507)
    assert len(rows) == 3
    assert list(rows[0]["contrib_types"]) == ["CREATION"]
    assert rows[0]["changeset"] == 314
    assert rows[0]["prev_wkt"] is None
    for r in rows:
        assert from_wkt(r["wkt"])["type"] == "GeometryCollection"


# ---------------------------------------------------------------------------
# snapshot-side relation scenarios
# (IterateByTimestampsRelationsTest.java:121-258; same fixture rels 503-507,
#  yearly timestamps 2000..2020)
# ---------------------------------------------------------------------------

YEARLY_TS = [_t(f"{y}-01-01") for y in range(2000, 2021)]


def _rel_snaps(db, rid):
    return (
        SnapshotView.on(db)
        .timestamps(YEARLY_TS)
        .filter(F.col("id") == rid)
        .dataframe()
        .orderBy("snap_ts")
        .collect()
    )


def test_snapshot_relation_tag_change(rel2_db):  # :121-140
    rows = _rel_snaps(rel2_db, 503)
    assert len(rows) == 14  # snapshots 2007..2020
    assert rows[0]["changeset"] == 307


def test_snapshot_relation_node_refs_in_ways(rel2_db):  # :143-173
    rows = _rel_snaps(rel2_db, 504)
    assert len(rows) == 10  # snapshots 2011..2020
    assert rows[0]["changeset"] == 310
    assert from_wkt(rows[0]["wkt"])["type"] == "Polygon"
    assert from_wkt(rows[1]["wkt"])["type"] == "Polygon"
    assert rows[1]["wkt"] != rows[0]["wkt"]  # way 110 v1 -> v2 refs
    assert rows[2]["wkt"] != rows[1]["wkt"]  # way 110 v2 -> v4 refs
    assert rows[3]["wkt"] == rows[2]["wkt"]  # unchanged year


def test_snapshot_relation_node_coords_in_way(rel2_db):  # :175-204
    rows = _rel_snaps(rel2_db, 505)
    assert len(rows) == 10
    assert rows[0]["changeset"] == 312
    assert from_wkt(rows[0]["wkt"])["type"] == "Polygon"
    assert rows[1]["wkt"] != rows[0]["wkt"]  # nodes moved 2012
    assert rows[6]["wkt"] != rows[1]["wkt"]  # node 50 moved 2017


def test_snapshot_relation_node_coords_in_relation_and_way(rel2_db):  # :206-230
    rows = _rel_snaps(rel2_db, 506)
    assert len(rows) == 10
    assert rows[0]["changeset"] == 313
    assert rows[1]["wkt"] != rows[0]["wkt"]
    assert rows[6]["wkt"] == rows[5]["wkt"]


def test_snapshot_relation_geometry_collection(rel2_db):  # :232-258
    rows = _rel_snaps(rel2_db, 507)
    assert len(rows) == 10
    assert rows[0]["changeset"] == 314
    assert from_wkt(rows[0]["wkt"])["type"] == "GeometryCollection"
    assert from_wkt(rows[9]["wkt"])["type"] == "GeometryCollection"
