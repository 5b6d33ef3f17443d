"""Grid-cell container round-trip: GridOSH{Nodes,Ways,Relations}Test ported
onto the columnar store.

The reference packs OSH entity histories into per-cell blob containers and
asserts the container hands back exactly the entities put in:
GridOSHNodesTest.testRebaseEntities (oshdb/src/test/java/.../grid/
GridOSHNodesTest.java:18-34), GridOSHWaysTest.testGrid
(GridOSHWaysTest.java:35-50), GridOSHRelationsTest.test
(GridOSHRelationsTest.java:26-60).  The columnar store's cell container is
the bucket-sorted parquet slice keyed by cell_id; "rebase"/"compact"
(delta-encoding versions against cell base coords/timestamps,
GridOSHNodes.rebase / GridOSHWays.compact / GridOSHRelations.compact) is
shed by design — parquet's own dictionary/delta encodings fill that role
(SURVEY.md §1.3) — so the equivalent, stronger claim is EXACT round-trip:
every history written into the cell table comes back with versions,
coordinates, refs, members, and roles bit-identical, and co-located under
one (cell_zoom, cell_id).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oshdb_spark.sources.store import read_entities_table, write_entities_table

# NEST_SCHEMA twin (tests/test_snapshot.py) — one row per entity version
SCHEMA = (
    "doc_id string, id long, type string, version int, visible boolean, "
    "ts long, changeset long, uid int, tags map<int,int>, lon long, lat long, "
    "refs array<long>, members array<struct<type:string,ref:long,role:string>>"
)


def _node(id_, ver, ts, lon, lat, tags=None):
    return (
        f"d{id_}.{ver}", id_, "node", ver, True, ts, 0, 123,
        tags or {}, lon, lat, None, None,
    )


def _way(id_, ver, ts, refs, tags=None):
    return (
        f"d{id_}.{ver}", id_, "way", ver, True, ts, 4444, 23,
        tags or {}, None, None, refs, None,
    )


def _rel(id_, ver, ts, members, tags=None):
    return (
        f"d{id_}.{ver}", id_, "relation", ver, True, ts, 4444, 23,
        tags or {}, None, None, None,
        [(t, r, role) for (t, r, role) in members],
    )


def _store(spark, rows, tmp_path):
    ents = spark.createDataFrame(rows, SCHEMA)
    out = str(tmp_path / "cells")
    write_entities_table(ents, out, n_buckets=2)
    return read_entities_table(spark, out)


def test_rebase_nodes_roundtrip(spark, tmp_path):
    """GridOSHNodesTest.testRebaseEntities: 3 two-version node histories
    into one container; the container iterates 3 entities.  Columnar twin:
    3 distinct (type,id) histories, every version's exact coordinates and
    timestamps back out, all co-located in cells."""
    rows = []
    for i in range(3):
        for ver in (1, 2):
            rows.append(_node(
                123 + 10 * i, ver, 123000 + ver + 10 * i,
                86809727 - 1000000 * i, 494094984 - 1000000 * i,
            ))
    back = _store(spark, rows, tmp_path)
    assert back.select("id").distinct().count() == 3  # Iterables.size == 3
    got = {
        (r["id"], r["version"]): (r["lon"], r["lat"], r["ts"])
        for r in back.collect()
    }
    assert len(got) == 6
    for i in range(3):
        for ver in (1, 2):
            assert got[(123 + 10 * i, ver)] == (
                86809727 - 1000000 * i,
                494094984 - 1000000 * i,
                123000 + ver + 10 * i,
            )
    # rebase invariant: every version carries a cell assignment, and one
    # entity's versions land in ONE cell (the insert rule keys on the
    # lifetime bbox, not per-version coords)
    assert back.filter(F.col("cell_id").isNull()).count() == 0
    assert (
        back.groupBy("id")
        .agg(F.countDistinct("cell_zoom", "cell_id").alias("n"))
        .filter("n > 1")
        .count()
        == 0
    )


def test_compact_ways_roundtrip(spark, tmp_path):
    """GridOSHWaysTest.testGrid: way histories whose versions swap a member
    (v1 refs 102,104 -> v3 refs 100,104) compacted with their member nodes;
    container iterates all ways.  Columnar twin: the refs arrays round-trip
    per version in order, alongside the member-node histories."""
    rows = [
        _node(100, 1, 1, 494094984, 86809727, {1: 2}),
        _node(102, 1, 1, 494094984, 86809727, {2: 1}),
        _node(104, 1, 1, 494094984, 86809727, {2: 4}),
    ]
    for i in range(3):
        wid = 123 + i  # distinct ids: the store keys histories by (type,id)
        rows.append(_way(wid, 1, 3333, [102, 104], {1: 1, 2: 1}))
        rows.append(_way(wid, 3, 3333, [100, 104], {1: 1, 2: 2}))
    back = _store(spark, rows, tmp_path)
    ways = back.filter("type = 'way'")
    assert ways.select("id").distinct().count() == 3
    got = {(r["id"], r["version"]): list(r["refs"]) for r in ways.collect()}
    for i in range(3):
        assert got[(123 + i, 1)] == [102, 104]
        assert got[(123 + i, 3)] == [100, 104]
    assert back.filter("type = 'node'").count() == 3


def test_compact_relations_roundtrip(spark, tmp_path):
    """GridOSHRelationsTest.test: relation300 (node members) and relation301
    (way members, role index 1), two versions each, compacted together with
    their member entities; getEntities() iterates exactly [300, 301] with
    per-version equality.  Columnar twin: member (type, ref, role) triples
    round-trip in order; id-ordered iteration matches."""
    rows = [
        _node(100, 1, 1, 494094984, 86809727, {1: 2}),
        _node(102, 1, 1, 494094984, 86809727, {2: 1}),
        _node(104, 1, 1, 494094984, 86809727, {2: 4}),
        _way(200, 1, 3333, [100, 104], {1: 2}),
        _way(202, 1, 3333, [100, 102], {1: 2}),
        _rel(300, 1, 3333, [("node", 100, "r0"), ("node", 102, "r0")]),
        _rel(300, 2, 3333, [("node", 100, "r0"), ("node", 102, "r0")],
             {1: 2}),
        _rel(301, 1, 3333, [("way", 200, "r1"), ("way", 202, "r1")]),
        _rel(301, 2, 3333, [("way", 200, "r1"), ("way", 202, "r1")],
             {1: 2}),
    ]
    back = _store(spark, rows, tmp_path)
    rels = back.filter("type = 'relation'")
    assert sorted(
        r["id"] for r in rels.select("id").distinct().collect()
    ) == [300, 301]  # Iterables.size == 2, iteration order 300, 301
    got = {
        (r["id"], r["version"]): (
            [(m["type"], m["ref"], m["role"]) for m in r["members"]],
            dict(r["tags"] or {}),
        )
        for r in rels.collect()
    }
    assert got[(300, 1)] == ([("node", 100, "r0"), ("node", 102, "r0")], {})
    assert got[(300, 2)] == (
        [("node", 100, "r0"), ("node", 102, "r0")], {1: 2}
    )
    assert got[(301, 1)] == ([("way", 200, "r1"), ("way", 202, "r1")], {})
    assert got[(301, 2)] == (
        [("way", 200, "r1"), ("way", 202, "r1")], {1: 2}
    )
    # the container holds the members too (compact() stores them adjacent)
    assert back.filter("type = 'way'").select("id").distinct().count() == 2
    assert back.filter("type = 'node'").select("id").distinct().count() == 3
