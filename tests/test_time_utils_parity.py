"""1:1 port of the reference's TestOSHEntityTimeUtils
(oshdb-util/src/test/java/.../osh/TestOSHEntityTimeUtils.java): the
per-entity modification-timestamp semantics — own version changes plus
member changes CLIPPED to each referencing version's validity window,
recursively through relation -> way -> node — that drive the
contribution view.

Engine analog: operators/contribution.modification_events (the
columnar OSHEntityTimeUtils.getModificationTimestamps); the
``withFilter`` variants go through contribution_view(osm_filter=...),
whose filtered-aliveness classification (CellIterator.java:642-659)
subsumes the reference's filtered time-utils contract.

Fixture translation from the Java builders: OSM.node/way/relation
(id, version, ts, changeset, uid, tags[k1,v1,...], ...) with NEGATIVE
version == deleted (visible=false, empty refs/members, as the
reference data encodes deletions).  Timestamps are the same small
epoch-second integers.  Coordinates are synthesized distinct-per-
(id, version) so geometries are non-empty and move on every node
version — the expected timestamp sets do not depend on coordinates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oshdb_spark.operators.contribution import (
    contribution_view,
    modification_events,
)

ENT_SCHEMA = (
    "doc_id string, id long, type string, version int, visible boolean, "
    "ts long, changeset long, uid int, tags map<int,int>, lon long, lat long, "
    "refs array<long>, members array<struct<type:string,ref:long,role:string>>"
)


def node(nid, version, ts, changeset=0, uid=1, tags=None):
    visible = version > 0
    v = abs(version)
    # distinct, per-version coordinates (see module docstring)
    lon = nid * 1_000_000 + v * 1000
    lat = nid * 500_000 + v * 1000
    return (
        f"n{nid}", nid, "node", v, visible, ts, changeset, uid,
        tags or {}, lon, lat, None, None,
    )


def way(wid, version, ts, changeset=0, uid=1, tags=None, refs=None):
    visible = version > 0
    return (
        f"w{wid}", wid, "way", abs(version), visible, ts, changeset, uid,
        tags or {}, None, None, list(refs or []), None,
    )


def relation(rid, version, ts, changeset=0, uid=1, tags=None, members=None):
    visible = version > 0
    ms = [("node" if k == "n" else "way" if k == "w" else "relation",
           ref, role) for k, ref, role in (members or [])]
    return (
        f"r{rid}", rid, "relation", abs(version), visible, ts, changeset,
        uid, tags or {}, None, None, None, ms,
    )


def _mod_ts(spark, rows, etype, eid, own_only=False):
    ents = spark.createDataFrame(rows, ENT_SCHEMA)
    ev = modification_events(ents)
    if own_only:
        ev = ev.filter("own_change")
    out = (
        ev.filter((F.col("type") == etype) & (F.col("id") == eid))
        .select("event_ts").distinct().orderBy("event_ts").collect()
    )
    return [r["event_ts"] for r in out]


def _filtered_ts(spark, rows, etype, eid, osm_filter):
    ents = spark.createDataFrame(rows, ENT_SCHEMA)
    cv = contribution_view(ents, 0, 10_000, osm_filter=osm_filter,
                           squash=False)
    out = (
        cv.filter((F.col("type") == etype) & (F.col("id") == eid))
        .select("ts").distinct().orderBy("ts").collect()
    )
    return [r["ts"] for r in out]


def test_modification_timestamps_node(spark):
    """testGetModificationTimestampsNode: a node's modification
    timestamps are its version timestamps."""
    rows = [
        node(123, 1, 1, changeset=0, tags={1: 1}),
        node(123, 2, 2, changeset=0, tags={1: 1}),
    ]
    assert _mod_ts(spark, rows, "node", 123) == [1, 2]
    # recurse variant identical for nodes
    assert _mod_ts(spark, rows, "node", 123, own_only=True) == [1, 2]


def test_modification_timestamps_node_with_filter(spark):
    """testGetModificationTimestampsNodeWithFilter: v1 matches
    hasTag(1,1), v2/v3 don't -> [1 (creation), 2 (stops matching)]."""
    rows = [
        node(123, 1, 1, changeset=1, tags={1: 1}),
        node(123, 2, 2, changeset=2, tags={1: 2}),
        node(123, 3, 3, changeset=3, tags={1: 2}),
    ]
    match = F.col("tags").getItem(1) == F.lit(1)
    assert _filtered_ts(spark, rows, "node", 123, match) == [1, 2]
    # no filter -> the full list
    assert _mod_ts(spark, rows, "node", 123) == [1, 2, 3]


WAY_NODES = [
    node(123, 1, 1, changeset=11), node(123, 2, 2, changeset=12),
    node(123, -3, 14, changeset=13),
    node(124, 1, 3, changeset=21), node(124, 2, 4, changeset=22),
    node(124, 3, 8, changeset=23), node(124, 4, 12, changeset=24),
    node(124, 5, 14, changeset=25),
    node(125, 1, 1, changeset=31), node(125, 2, 6, changeset=32),
    node(125, 3, 9, changeset=33),
]


def test_modification_timestamps_way(spark):
    """testGetModificationTimestampsWay: own = version ts; recurse adds
    member-node changes inside each version's validity window and stops
    at the way's deletion (node changes at 14 don't count: the way died
    at 13 / node 125 left the way at 7)."""
    rows = WAY_NODES + [
        way(123, 1, 5, changeset=4444, tags={1: 1, 2: 1},
            refs=[123, 124, 125]),
        way(123, 2, 7, changeset=4445, tags={1: 1, 2: 2},
            refs=[123, 124]),
        way(123, -3, 13, changeset=4446),
    ]
    assert _mod_ts(spark, rows, "way", 123, own_only=True) == [5, 7, 13]
    assert _mod_ts(spark, rows, "way", 123) == [5, 6, 7, 8, 12, 13]


def test_modification_timestamps_way_with_filter(spark):
    """testGetModificationTimestampsWayWithFilter: member changes count
    only while the CURRENT way version matches the filter; leaving the
    filter is a deletion, re-entering a creation."""
    nodes = [
        node(123, 1, 1, changeset=11), node(123, 2, 2, changeset=12),
        node(124, 1, 3, changeset=21), node(124, 2, 4, changeset=22),
        node(124, 3, 8, changeset=23), node(124, 4, 12, changeset=24),
        node(124, 5, 16, changeset=25),
        node(125, 1, 1, changeset=31), node(125, 2, 6, changeset=32),
        node(125, 3, 9, changeset=33), node(125, 4, 15, changeset=34),
    ]
    rows = nodes + [
        way(123, 1, 5, changeset=4444, tags={1: 1, 2: 1},
            refs=[123, 124, 125]),
        way(123, 2, 7, changeset=4445, tags={1: 1, 2: 2},
            refs=[123, 124]),
        way(123, 3, 13, changeset=4446, tags={1: 1, 2: 2},
            refs=[123, 124]),
        way(123, 4, 14, changeset=4447, tags={1: 1, 2: 1},
            refs=[123, 124]),
    ]
    assert _mod_ts(spark, rows, "way", 123) == [5, 6, 7, 8, 12, 13, 14, 16]
    match = F.col("tags").getItem(2) == F.lit(1)
    assert _filtered_ts(spark, rows, "way", 123, match) == [5, 6, 7, 14, 16]


def test_modification_timestamps_relation(spark):
    """testGetModificationTimestampsRelation: recursion through
    relation -> way -> node, each hop clipped to the referencing
    version's validity window.  ts 9 missing (way not a member then),
    ts 11 missing (node not part of the member way then)."""
    rows = [
        node(123, 1, 1, changeset=11), node(123, 2, 2, changeset=12),
        node(124, 1, 3, changeset=21), node(124, 2, 4, changeset=22),
        node(124, 3, 9, changeset=23), node(124, 4, 12, changeset=24),
        node(125, 1, 1, changeset=31), node(125, 2, 6, changeset=32),
        node(125, 3, 11, changeset=34),
        way(1, 1, 4, changeset=4443, refs=[123, 124, 125]),
        way(1, 2, 5, changeset=4444, refs=[123, 124, 125]),
        way(1, 3, 7, changeset=4445, refs=[123, 124]),
        relation(1, 1, 5, changeset=10001, tags={1: 1, 2: 2},
                 members=[("w", 1, "0")]),
        relation(1, 2, 8, changeset=10002, tags={1: 1, 2: 2},
                 members=[("n", 123, "1")]),
        relation(1, 3, 10, changeset=10003, tags={1: 1, 2: 2},
                 members=[("w", 1, "0")]),
        relation(1, -4, 20, changeset=10004),
    ]
    assert _mod_ts(spark, rows, "relation", 1, own_only=True) == [5, 8, 10, 20]
    assert _mod_ts(spark, rows, "relation", 1) == [5, 6, 7, 8, 10, 12, 20]


def test_modification_timestamps_relation_with_filter(spark):
    """testGetModificationTimestampsRelationWithFilter: the entity
    filter (version != 2) participates in aliveness — ts 4 missing
    because the then-current version doesn't match."""
    rows = [
        node(123, v, t, changeset=10 + v)
        for v, t in [(1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (6, 6), (7, 17)]
    ] + [
        relation(1, 1, 1, changeset=10001, members=[("n", 123, "0")]),
        relation(1, 2, 3, changeset=10002, members=[("n", 123, "1")]),
        relation(1, 3, 5, changeset=10003, members=[("n", 123, "0")]),
        relation(1, -4, 6, changeset=10004),
    ]
    match = F.col("version") != F.lit(2)
    assert _filtered_ts(spark, rows, "relation", 1, match) == [1, 2, 3, 5, 6]


def test_issue_325_redacted_member_way(spark):
    """testIssue325: a relation referencing a redacted way (single
    invisible version, no refs) must not crash the timestamp
    computation — and the deleted member version still counts as a
    member change inside its validity window."""
    rows = [
        node(123, 1, 1), node(123, 2, 2),
        node(124, 1, 1), node(124, 2, 2),
        way(1, 1, 1, changeset=1, refs=[123, 124]),
        way(2, -4, 9, changeset=9, uid=9),
        relation(1, 1, 1, changeset=1, tags={1: 1, 2: 2},
                 members=[("w", 1, "0")]),
        relation(1, 2, 8, changeset=8, uid=8, tags={1: 1, 2: 2},
                 members=[("w", 1, "0"), ("w", 2, "0")]),
    ]
    tss = _mod_ts(spark, rows, "relation", 1)
    assert tss == [1, 2, 8, 9]


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
