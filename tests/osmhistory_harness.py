"""Harness for the versioned-entity geometry-builder parity suites.

Fixture: tests/fixtures/osm_history.json — re-encoded from the reference's
public .osm test data (oshdb-util/src/test/resources/
{different-timestamps,incomplete-osm}/*.osm; converter:
tests/fixtures/convert_history_osm.py).

Mirrors the reference's OSHDBGeometryTest.buildGeometry semantics
(OSHDBGeometryTest.java:47-60 + OSHDBGeometryBuilderInternal.java):

  * an entity version built WITHOUT a timestamp uses its own timestamp;
    a timestamp BEFORE the version's timestamp raises AssertionError
    (OSHDBGeometryBuilderInternal.java:84-88);
  * member refs resolve as-of the timestamp: the newest version with
    ts <= query ts, else missing (OSHEntities.getByTimestamp:65-72);
  * way geometry: missing/unresolved/invisible nodes are dropped
    (getWayGeometry:203-208), then area/linestring/point/empty fallbacks;
  * relation multipolygon path: missing/invisible member WAYS are skipped
    (getMultiPolygonGeometry + waysToLines:535-546); the collection
    fallback instead KEEPS resolved-but-invisible members as typed empty
    geometries and drops only missing ones, preserving member order
    (getGeometryCollectionGeometry:305-359);
  * area rules are the XML-reader test interpreter's: way area iff closed
    ring of >= 4 refs AND area=yes; relation area iff type=multipolygon
    (OSMXmlReaderTagInterpreter.java:37-47).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from oshdb_spark.geometry.builder import (
    build_relation_geometry,
    build_way_geometry,
)
from oshdb_spark.geometry.model import Geometry, point

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "osm_history.json")


def _parse_ts(s: str) -> int:
    return int(
        datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
        .replace(tzinfo=timezone.utc)
        .timestamp()
    )


def _by_id(entities: list[dict]) -> dict[int, list[dict]]:
    out: dict[int, list[dict]] = {}
    for e in entities:  # file order == version order (oldest first)
        out.setdefault(e["id"], []).append(e)
    return out


def _resolve(versions: list[dict] | None, ts: int) -> dict | None:
    """OSHEntities.getByTimestamp: newest version with ts <= query ts."""
    if not versions:
        return None
    for v in reversed(versions):
        if v["ts"] <= ts:
            return v
    return None


def spark_fixture(dataset: str, path: str = FIXTURE):
    """Convert a fixture dataset into engine entity-table rows.

    Returns (rows, ENT_SCHEMA, TagTranslator) ready for
    ``OSHDB(spark, spark.createDataFrame(rows, ENT_SCHEMA), translator=tr)``
    — the bridge that runs the reference's versioned .osm scenario data
    through the FULL Spark views (contribution/snapshot), not just the
    Python geometry kernels.  Tag strings are int-coded through a
    generated dictionary exactly like production keytables.
    """
    with open(path) as f:
        data = json.load(f)[dataset]
    keys: dict[str, int] = {}
    values: dict[tuple[str, str], int] = {}
    per_key_next: dict[str, int] = {}
    for group in ("nodes", "ways", "relations"):
        for e in data[group]:
            for k, v in e["tags"].items():
                if k not in keys:
                    keys[k] = len(keys) + 1
                    per_key_next[k] = 1
                if (k, v) not in values:
                    values[(k, v)] = per_key_next[k]
                    per_key_next[k] += 1

    def _tags(e):
        return {keys[k]: values[(k, v)] for k, v in e["tags"].items()}

    rows = []
    for e in data["nodes"]:
        rows.append((
            f"n{e['id']}v{e['version']}", e["id"], "node", e["version"],
            e["visible"], e["ts"], e["changeset"], e["uid"], _tags(e),
            int(round(e["lon"] * 1e7)) if e.get("lon") is not None else 0,
            int(round(e["lat"] * 1e7)) if e.get("lat") is not None else 0,
            None, None,
        ))
    for e in data["ways"]:
        rows.append((
            f"w{e['id']}v{e['version']}", e["id"], "way", e["version"],
            e["visible"], e["ts"], e["changeset"], e["uid"], _tags(e),
            None, None, e["refs"], None,
        ))
    for e in data["relations"]:
        rows.append((
            f"r{e['id']}v{e['version']}", e["id"], "relation", e["version"],
            e["visible"], e["ts"], e["changeset"], e["uid"], _tags(e),
            None, None, None,
            [(m["type"], m["ref"], m["role"]) for m in e["members"]],
        ))

    from oshdb_spark.filters.dsl import TagTranslator

    return rows, ENT_SCHEMA, TagTranslator(keys=keys, values=values)


ENT_SCHEMA = (
    "doc_id string, id long, type string, version int, visible boolean, "
    "ts long, changeset long, uid int, tags map<int,int>, lon long, lat long, "
    "refs array<long>, members array<struct<type:string,ref:long,role:string>>"
)


class HistoryData:
    def __init__(self, dataset: str, path: str = FIXTURE):
        with open(path) as f:
            data = json.load(f)[dataset]
        self.nodes = _by_id(data["nodes"])
        self.ways = _by_id(data["ways"])
        self.relations = _by_id(data["relations"])

    # -- version pickers (index in file order, like ListMultimap.get) ------

    def node(self, nid: int, idx: int) -> dict:
        return self.nodes[nid][idx]

    def way(self, wid: int, idx: int) -> dict:
        return self.ways[wid][idx]

    def relation(self, rid: int, idx: int) -> dict:
        return self.relations[rid][idx]

    # -- geometry build at a timestamp -------------------------------------

    def _ts_of(self, entity: dict, ts: int | str | None) -> int:
        if ts is None:
            return entity["ts"]
        if isinstance(ts, str):
            ts = _parse_ts(ts)
        if ts < entity["ts"]:
            raise AssertionError(
                "timestamp before this entity version's timestamp"
            )
        return ts

    def build_node(self, n: dict, ts=None) -> Geometry:
        self._ts_of(n, ts)
        return point(n["lon"], n["lat"]) if n["visible"] else point()

    def _way_nodes(self, w: dict, ts: int) -> list[tuple[int, float, float]]:
        out = []
        for ref in w["refs"]:
            v = _resolve(self.nodes.get(ref), ts)
            if v is not None and v["visible"]:
                out.append((ref, v["lon"], v["lat"]))
        return out

    def _way_is_area(self, w: dict) -> bool:
        refs = w["refs"]
        return (
            len(refs) >= 4
            and refs[0] == refs[-1]
            and w["tags"].get("area") == "yes"
        )

    def build_way(self, w: dict, ts=None) -> Geometry:
        at = self._ts_of(w, ts)
        if not w["visible"]:
            return {"type": "LineString", "coordinates": []}
        return build_way_geometry(
            True, self._way_is_area(w), self._way_nodes(w, at)
        )

    def build_relation(self, r: dict, ts=None) -> Geometry:
        at = self._ts_of(r, ts)
        is_area = r["tags"].get("type") == "multipolygon"
        member_lines = []
        for m in r["members"]:
            kind = "other"
            nodes = None
            geom = None
            if m["type"] == "way":
                if m["role"] in ("outer", ""):
                    kind = "outer"
                elif m["role"] == "inner":
                    kind = "inner"
                w = _resolve(self.ways.get(m["ref"]), at)
                if w is not None:
                    # multipolygon path input: visible ways only
                    # (waysToLines skips invisible); collection fallback
                    # input: the fully built geometry, empty if invisible
                    nodes = self._way_nodes(w, at) if w["visible"] else None
                    geom = self.build_way(w, at)
            elif m["type"] == "node":
                n = _resolve(self.nodes.get(m["ref"]), at)
                if n is not None:
                    geom = (
                        point(n["lon"], n["lat"]) if n["visible"] else point()
                    )
            elif m["type"] == "relation":
                child = _resolve(self.relations.get(m["ref"]), at)
                if child is not None:
                    geom = self.build_relation(child, at)
            member_lines.append({"kind": kind, "nodes": nodes, "geom": geom})
        return build_relation_geometry(r["visible"], is_area, member_lines)
