"""Contribution view vs an independent pandas oracle.

Oracle re-derives CellIterator.iterateByContribution semantics (events incl.
member edits, changeset squashing, lag classification) directly from the
ground-truth world tables.
"""

import pandas as pd
import pytest

from oshdb_spark.geometry.taginterpreter import default_tag_interpreter
from oshdb_spark.operators.contribution import contribution_view
from oshdb_spark.sources.entities import extract_entities

TI = default_tag_interpreter()
T0 = 1262304000
T1 = T0 + 11 * 365 * 86400  # beyond history end


@pytest.fixture(scope="module")
def entities(spark, docs_parquet):
    path, _, _ = docs_parquet
    return extract_entities(spark.read.parquet(path)).cache()


@pytest.fixture(scope="module")
def contributions(spark, entities):
    return contribution_view(entities, T0, T1).cache()


# ---------------------------------------------------------------------------
# oracle
# ---------------------------------------------------------------------------


def _version_at(df, eid, t):
    sub = df[(df["id"] == eid) & (df["ts"] <= t)]
    if sub.empty:
        return None
    return sub.sort_values(["ts", "version"]).iloc[-1]


def _node_alive(world, nid, t):
    v = _version_at(world.nodes, nid, t)
    return v is not None and bool(v["visible"])


def _node_pos(world, nid, t):
    v = _version_at(world.nodes, nid, t)
    if v is None or not v["visible"]:
        return None
    return (int(v["lon"]), int(v["lat"]))


def _way_state(world, wid, t):
    """(visible, tags, line) at t; line = visible resolved member coords."""
    v = _version_at(world.ways, wid, t)
    if v is None:
        return None
    line = []
    for ref in v["refs"]:
        p = _node_pos(world, ref, t)
        if p is not None:
            line.append((ref, p))
    return bool(v["visible"]), dict(v["tags"]), line


def _events_for_way(world, wid):
    """[(ts, changeset, uid, own)] events incl. member node edits."""
    versions = world.ways[world.ways["id"] == wid].sort_values(["ts", "version"])
    events = {}
    for r in versions.itertuples(index=False):
        events[int(r.ts)] = (int(r.changeset), int(r.uid), True)
    vlist = list(versions.itertuples(index=False))
    for i, r in enumerate(vlist):
        start = int(r.ts)
        end = int(vlist[i + 1].ts) if i + 1 < len(vlist) else None
        for ref in r.refs:
            nvs = world.nodes[world.nodes["id"] == ref]
            for n in nvs.itertuples(index=False):
                nts = int(n.ts)
                if nts > start and (end is None or nts < end):
                    if nts not in events:  # own events win
                        events[nts] = (int(n.changeset), int(n.uid), False)
    return sorted((t, cs, uid, own) for t, (cs, uid, own) in events.items())


def _squash(events):
    out = []
    for i, e in enumerate(events):
        nxt_cs = events[i + 1][1] if i + 1 < len(events) else None
        if nxt_cs is None or e[1] != nxt_cs:
            out.append(e)
    return out


def oracle_way_contributions(world):
    rows = {}
    for wid in world.ways["id"].unique():
        events = _squash(_events_for_way(world, wid))
        prev_alive = False
        prev_state = None
        for ts, cs, uid, own in events:
            vis, tags, line = _way_state(world, wid, ts)
            alive = vis and len(line) > 0
            types = []
            if alive and not prev_alive:
                types = ["CREATION"]
            elif not alive and prev_alive:
                types = ["DELETION"]
            elif alive and prev_alive:
                if tags != prev_state[0]:
                    types.append("TAG_CHANGE")
                if line != prev_state[1]:
                    types.append("GEOMETRY_CHANGE")
            if alive or prev_alive:
                if T0 <= ts <= T1:
                    rows[(wid, ts)] = (tuple(sorted(types)), cs, uid)
            prev_alive = alive
            prev_state = (tags, line)
    return rows


def oracle_node_contributions(world):
    rows = {}
    for nid, grp in world.nodes.groupby("id"):
        events = _squash(
            [
                (int(r.ts), int(r.changeset), int(r.uid), True)
                for r in grp.sort_values(["ts", "version"]).itertuples(index=False)
            ]
        )
        prev_alive = False
        prev = None
        for ts, cs, uid, _ in events:
            v = _version_at(world.nodes, nid, ts)
            alive = bool(v["visible"])
            types = []
            if alive and not prev_alive:
                types = ["CREATION"]
            elif not alive and prev_alive:
                types = ["DELETION"]
            elif alive and prev_alive:
                if dict(v["tags"]) != prev[0]:
                    types.append("TAG_CHANGE")
                if (int(v["lon"]), int(v["lat"])) != prev[1]:
                    types.append("GEOMETRY_CHANGE")
            if alive or prev_alive:
                if T0 <= ts <= T1:
                    rows[(nid, ts)] = (tuple(sorted(types)), cs, uid)
            prev_alive = alive
            prev = (dict(v["tags"]), (int(v["lon"]), int(v["lat"])))
    return rows


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_node_contributions_match_oracle(contributions, docs_parquet):
    _, _, world = docs_parquet
    expected = oracle_node_contributions(world)
    got = {
        (r["id"], r["ts"]): (
            tuple(sorted(r["contrib_types"])),
            r["changeset"],
            r["contrib_uid"],
        )
        for r in contributions.filter("type = 'node'").collect()
    }
    assert got == expected


def test_way_contributions_match_oracle(contributions, docs_parquet):
    _, _, world = docs_parquet
    expected = oracle_way_contributions(world)
    got = {
        (r["id"], r["ts"]): (
            tuple(sorted(r["contrib_types"])),
            r["changeset"],
            r["contrib_uid"],
        )
        for r in contributions.filter("type = 'way'").collect()
    }
    assert got == expected


def test_member_edit_produces_geometry_change(contributions, docs_parquet):
    """A node move inside a way's validity window must surface as a
    GEOMETRY_CHANGE contribution on the way, attributed to the node editor."""
    _, _, world = docs_parquet
    expected = oracle_way_contributions(world)
    member_geom_changes = {
        k: v for k, v in expected.items() if v[0] == ("GEOMETRY_CHANGE",)
    }
    assert member_geom_changes, "fixture must contain member-induced changes"
    got = {
        (r["id"], r["ts"]): tuple(sorted(r["contrib_types"]))
        for r in contributions.filter("type = 'way'").collect()
    }
    for k, (types, _, _) in member_geom_changes.items():
        assert got.get(k) == types


def test_every_living_entity_has_creation(contributions, docs_parquet):
    _, _, world = docs_parquet
    creations = {
        (r["type"], r["id"])
        for r in contributions.filter(
            "array_contains(contrib_types, 'CREATION')"
        ).collect()
    }
    # every way that ever had geometry must have a CREATION
    expected = oracle_way_contributions(world)
    for (wid, ts), (types, _, _) in expected.items():
        if types == ("CREATION",):
            assert ("way", wid) in creations


def test_relation_contributions_exist(contributions, docs_parquet):
    _, _, world = docs_parquet
    rel = contributions.filter("type = 'relation'").collect()
    rel_ids = {r["id"] for r in rel}
    assert rel_ids == set(world.relations["id"].unique())
    for r in rel:
        if r["version"] == 1 and r["contrib_types"]:
            pass
    creations = [r for r in rel if "CREATION" in r["contrib_types"]]
    assert len(creations) == len(world.relations["id"].unique())


def test_nested_relation_members_in_contributions(spark):
    """Contribution view resolves relation->relation members one level
    deep: the super-relation's geometry collection contains the child
    relation's geometry as-of each contribution timestamp."""
    from oshdb_spark.geometry.model import from_wkt

    t0 = 100
    schema = (
        "doc_id string, id long, type string, version int, visible boolean, "
        "ts long, changeset long, uid int, tags map<int,int>, lon long, "
        "lat long, refs array<long>, "
        "members array<struct<type:string,ref:long,role:string>>"
    )

    def mk(doc, id_, typ, ver, vis, ts, lon=None, lat=None, refs=None,
           members=None, tags=None):
        return (doc, id_, typ, ver, vis, ts, ts, 1, tags or {}, lon, lat,
                refs, members)

    rows = [
        mk("d", 1, "node", 1, True, t0, 10_0000000, 10_0000000),
        mk("d", 2, "node", 1, True, t0, 20_0000000, 10_0000000),
        mk("d", 3, "node", 1, True, t0, 30_0000000, 30_0000000),
        mk("d", 50, "relation", 1, True, t0,
           members=[("node", 1, ""), ("node", 2, "")]),
        mk("d", 60, "relation", 1, True, t0 + 10,
           members=[("relation", 50, ""), ("node", 3, "")]),
        # super-relation's own v2 at t0+20 (tag change)
        mk("d", 60, "relation", 2, True, t0 + 20,
           members=[("relation", 50, ""), ("node", 3, "")], tags={1: 1}),
    ]
    ents = spark.createDataFrame(rows, schema)
    out = (
        contribution_view(ents, 0, 1 << 40, types={"relation"})
        .filter("id = 60")
        .orderBy("ts")
        .collect()
    )
    assert len(out) == 2
    assert list(out[0]["contrib_types"]) == ["CREATION"]
    g = from_wkt(out[0]["wkt"])
    assert g["type"] == "GeometryCollection"
    assert len(g["geometries"]) == 2
    assert any(x["type"] == "GeometryCollection" for x in g["geometries"])
    assert list(out[1]["contrib_types"]) == ["TAG_CHANGE"]


def test_old_style_multipolygons_in_contributions(spark):
    """includeOldStyleMultipolygons on the contribution view: each event
    state of an old-style relation (one outer way, no interesting tags)
    gets the holes-only geometry + outer-way tag substitution
    (CellIterator.java:92-97,330-380 semantics).  The reference's own
    iterateByContribution throws UnsupportedOperationException here
    (CellIterator.java:523-526); we complete the documented intent."""
    from oshdb_spark.geometry.model import from_wkt

    t0 = 100
    schema = (
        "doc_id string, id long, type string, version int, visible boolean, "
        "ts long, changeset long, uid int, tags map<int,int>, lon long, "
        "lat long, refs array<long>, "
        "members array<struct<type:string,ref:long,role:string>>"
    )

    def mk(doc, id_, typ, ver, vis, ts, lon=None, lat=None, refs=None,
           members=None, tags=None):
        return (doc, id_, typ, ver, vis, ts, ts, 1, tags or {}, lon, lat,
                refs, members)

    sq = [(1, 0, 0), (2, 10, 0), (3, 10, 10), (4, 0, 10)]
    hole = [(5, 4, 4), (6, 6, 4), (7, 6, 6), (8, 4, 6)]
    rows = []
    for nid, x, y in sq + hole:
        rows.append(mk("d", nid, "node", 1, True, t0,
                       x * 10_000_000, y * 10_000_000))
    # outer way carries the semantic tag (key 2)
    rows.append(mk("d", 20, "way", 1, True, t0, refs=[1, 2, 3, 4, 1],
                   tags={2: 1}))
    rows.append(mk("d", 21, "way", 1, True, t0, refs=[5, 6, 7, 8, 5]))
    # old-style relation: ONLY type=multipolygon (key 4), created at t0+5
    rows.append(mk("d", 30, "relation", 1, True, t0 + 5,
                   members=[("way", 20, "outer"), ("way", 21, "inner")],
                   tags={4: 1}))
    # hole corner node moves at t0+10 -> member-driven GEOMETRY_CHANGE
    rows.append(mk("d", 5, "node", 2, True, t0 + 10,
                   int(3.5 * 10_000_000), 4 * 10_000_000))
    ents = spark.createDataFrame(rows, schema)

    out = (
        contribution_view(ents, 0, 1 << 40, types={"relation"},
                          include_old_style_multipolygons=True)
        .filter("id = 30")
        .orderBy("ts")
        .collect()
    )
    assert len(out) == 2
    creation, geomchange = out
    assert list(creation["contrib_types"]) == ["CREATION"]
    g = from_wkt(creation["wkt"])
    assert g["type"] == "MultiPolygon"      # holes-only fix-up geometry
    assert len(g["coordinates"]) == 1
    xs = [p[0] for p in g["coordinates"][0][0]]
    assert min(xs) == 4.0 and max(xs) == 6.0  # it IS the hole ring
    assert dict(creation["tags"]) == {2: 1}   # outer way's tags substituted

    assert "GEOMETRY_CHANGE" in list(geomchange["contrib_types"])
    g2 = from_wkt(geomchange["wkt"])
    xs2 = [p[0] for p in g2["coordinates"][0][0]]
    assert min(xs2) == 3.5                    # moved hole corner visible

    # without the flag, the same relation builds normally (Polygon+hole)
    out2 = (
        contribution_view(ents, 0, 1 << 40, types={"relation"})
        .filter("id = 30")
        .orderBy("ts")
        .collect()
    )
    gplain = from_wkt(out2[0]["wkt"])
    assert gplain["type"] == "Polygon" and len(gplain["coordinates"]) == 2
    assert dict(out2[0]["tags"]) == {4: 1}
