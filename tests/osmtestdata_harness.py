"""Harness for the osm-testdata grade-suite ports.

Fixture: tests/fixtures/osm_testdata.json — a JSON conversion of the
public-domain osm-testdata project's grid fixture (`all.osm`, see
https://github.com/osmcode/osm-testdata; the reference bundles it as
oshdb-util/src/test/resources/osm-testdata/all.osm and drives the grade
suites OSHDBGeometryBuilderTestOsmTestData{1xx,3xx,7xx}Test from it).

The tag-interpreter semantics mirror the reference's test interpreter
(OSMXmlReaderTagInterpreter.java): a way is an area iff it is a closed
ring of >= 4 refs AND has area=yes; a relation is an area iff
type=multipolygon; outer members are ways with role outer/"" and inner
members ways with role inner.
"""

from __future__ import annotations

import json
import os

import numpy as np

from oshdb_spark.geometry.builder import (
    build_relation_geometry,
    build_way_geometry,
)
from oshdb_spark.geometry.model import (
    Geometry,
    from_wkt,
    is_empty,
    point,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "osm_testdata.json")


class Grid:
    def __init__(self, path: str = FIXTURE):
        with open(path) as f:
            data = json.load(f)
        self.nodes = {e["id"]: e for e in data["nodes"]}
        self.ways = {e["id"]: e for e in data["ways"]}
        self.relations = {e["id"]: e for e in data["relations"]}

    # -- entity resolution -------------------------------------------------

    def _way_nodes(self, way) -> list[tuple[int, float, float]]:
        out = []
        for ref in way["refs"]:
            n = self.nodes.get(ref)
            if n is not None and n["visible"]:
                out.append((ref, n["lon"], n["lat"]))
        return out

    def _way_is_area(self, way) -> bool:
        refs = way["refs"]
        return (
            len(refs) >= 4
            and refs[0] == refs[-1]
            and way["tags"].get("area") == "yes"
        )

    def build_node(self, nid: int) -> Geometry:
        n = self.nodes[nid]
        return point(n["lon"], n["lat"]) if n["visible"] else point()

    def build_way(self, wid: int) -> Geometry:
        w = self.ways[wid]
        return build_way_geometry(
            w["visible"], self._way_is_area(w), self._way_nodes(w)
        )

    def build_relation(self, rid: int) -> Geometry:
        r = self.relations[rid]
        is_area = r["tags"].get("type") == "multipolygon"
        member_lines = []
        for m in r["members"]:
            if m["type"] == "way":
                w = self.ways.get(m["ref"])
                nodes = self._way_nodes(w) if w and w["visible"] else None
                if m["role"] in ("outer", ""):
                    kind = "outer"
                elif m["role"] == "inner":
                    kind = "inner"
                else:
                    kind = "other"
                member_lines.append({"kind": kind, "nodes": nodes, "geom": None})
            elif m["type"] == "node":
                n = self.nodes.get(m["ref"])
                g = point(n["lon"], n["lat"]) if n and n["visible"] else None
                member_lines.append({"kind": "other", "nodes": None, "geom": g})
            else:
                member_lines.append({"kind": "other", "nodes": None, "geom": None})
        return build_relation_geometry(r["visible"], is_area, member_lines)


# -- JTS-free geometry assertions ------------------------------------------


def geom_type(g: Geometry) -> str:
    return g["type"]


def num_geometries(g: Geometry) -> int:
    t = g["type"]
    if t == "GeometryCollection":
        return len(g["geometries"])
    if t.startswith("Multi"):
        return len(g["coordinates"])
    return 1


def num_coords(g: Geometry) -> int:
    from oshdb_spark.geometry.model import _iter_coords

    return sum(1 for _ in _iter_coords(g))


def num_interior(g: Geometry) -> int:
    assert g["type"] == "Polygon"
    return len(g["coordinates"]) - 1


def num_interior_n(g: Geometry, i: int) -> int:
    if g["type"] == "Polygon":
        assert i == 0
        return num_interior(g)
    return len(g["coordinates"][i]) - 1


def is_polygonal(g: Geometry) -> bool:
    return g["type"] in ("Polygon", "MultiPolygon")


def planar_area(g: Geometry) -> float:
    if is_empty(g):
        return 0.0
    t = g["type"]
    if t not in ("Polygon", "MultiPolygon"):
        return 0.0
    polys = g["coordinates"] if t == "MultiPolygon" else [g["coordinates"]]
    total = 0.0
    for rings in polys:
        for k, ring in enumerate(rings):
            s = 0.0
            for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
                s += x1 * y2 - x2 * y1
            total += abs(s) / 2 * (1 if k == 0 else -1)
    return total


def assert_region_equals(result: Geometry, expected_wkt: str, rel=1e-6):
    """The reference's area-based equality: expected.area equals
    area(result ∩ expected) — i.e. expected ⊆ result — plus equal total
    areas, which together pin region equality (up to measure zero)."""
    from oshdb_spark.geometry.polyclip import PreparedPolygon, clip_to_polygon

    expected = from_wkt(expected_wkt)
    ea = planar_area(expected)
    ra = planar_area(result)
    assert ra == pytest_approx(ea, rel), f"total area {ra} != {ea}"
    inter = clip_to_polygon(result, PreparedPolygon(expected))
    ia = planar_area(inter)
    assert ia == pytest_approx(ea, rel), f"intersection area {ia} != {ea}"


def assert_region_covers(result: Geometry, expected_wkt: str, rel=1e-6):
    """The reference's EXACT assertion shape — expected.area equals
    area(result ∩ expected), i.e. expected ⊆ result — WITHOUT the
    total-area equality that assert_region_equals adds.  Used for tests
    whose expected WKT is a subset witness of a larger built geometry
    (e.g. history relation 509, where a revived far-away node makes the
    ring a sliver the witness polygon sits inside)."""
    from oshdb_spark.geometry.polyclip import PreparedPolygon, clip_to_polygon

    expected = from_wkt(expected_wkt)
    ea = planar_area(expected)
    inter = clip_to_polygon(result, PreparedPolygon(expected))
    ia = planar_area(inter)
    assert ia == pytest_approx(ea, rel), f"intersection area {ia} != {ea}"


def pytest_approx(v, rel):
    import pytest

    return pytest.approx(v, rel=rel, abs=1e-12)


# -- line relations (for the 1xx ported crosses/intersects asserts) ---------


def _line_segments(g: Geometry):
    lines = (
        g["coordinates"] if g["type"] == "MultiLineString" else [g["coordinates"]]
    )
    xs1, ys1, xs2, ys2 = [], [], [], []
    for l in lines:
        a = np.asarray(l, dtype=np.float64)
        xs1.append(a[:-1, 0])
        ys1.append(a[:-1, 1])
        xs2.append(a[1:, 0])
        ys2.append(a[1:, 1])
    return (
        np.concatenate(xs1),
        np.concatenate(ys1),
        np.concatenate(xs2),
        np.concatenate(ys2),
    )


def lines_intersect(a: Geometry, b: Geometry) -> bool:
    from oshdb_spark.geometry.polyclip import _segments_cross

    return _segments_cross(_line_segments(a), _line_segments(b))


def shared_coords(a: Geometry, b: Geometry) -> set:
    from oshdb_spark.geometry.model import _iter_coords

    ca = {tuple(c) for c in _iter_coords(a)}
    return {tuple(c) for c in _iter_coords(b)} & ca


def segments_cross(p1, p2, q1, q2) -> bool:
    """Single segment pair proper/touching intersection."""
    from oshdb_spark.geometry.polyclip import _segments_cross

    a = tuple(np.array([v], dtype=np.float64) for v in (p1[0], p1[1], p2[0], p2[1]))
    b = tuple(np.array([v], dtype=np.float64) for v in (q1[0], q1[1], q2[0], q2[1]))
    return _segments_cross(a, b)
