"""Geometry assembly for nodes, ways and relations.

Re-expresses (not copies) the assembly semantics of the reference builder
(/root/reference/oshdb-util/src/main/java/org/heigit/ohsome/oshdb/util/geometry/OSHDBGeometryBuilderInternal.java):

  * node -> Point; deleted -> empty                       (:133-141)
  * way  -> Polygon if TagInterpreter says area AND the resolved, visible
    member nodes form a closed ring of >= 4 coords; else LineString (>=2),
    Point fallback (1), typed empty (0) — degrades, never throws  (:203-230)
  * relation (isArea) -> (Multi)Polygon via ring assembly:
      - buildRings: join adjacent ways end-to-end into closed rings (:852-920)
      - splitPinchedRings: split figure-8 rings at repeated node ids; nested
        split-offs become holes                            (:652-745)
      - mergeTouchingRings: rings sharing >= 1 segment merge into one (:573-626)
      - rings with >= 4 nodes only; 1 outer -> Polygon with all holes,
        N outers -> each hole assigned to the outer that contains it (:483-533)
  * relation (not area) -> GeometryCollection of member geometries; missing
    (redacted/incomplete) members are skipped with a partial result (:305-358)

Nodes are (id:int, lon:float, lat:float) tuples; "lines" are lists of nodes.
"""

from __future__ import annotations

import numpy as np

from oshdb_spark.geometry.model import (
    Geometry,
    geometry_collection,
    line_string,
    point,
)
from oshdb_spark.geometry.pip import points_in_polygon
from oshdb_spark.geometry.taginterpreter import TagInterpreter

Node = tuple[int, float, float]


# ---------------------------------------------------------------------------
# node / way
# ---------------------------------------------------------------------------


def build_node_geometry(visible: bool, lon: float, lat: float) -> Geometry:
    if not visible:
        return point()
    return point(lon, lat)


def build_way_geometry(
    visible: bool,
    is_area: bool,
    nodes: list[Node],
) -> Geometry:
    """`nodes` = the way's member nodes resolved at the query timestamp,
    already filtered to visible/non-missing ones (BuilderInternal:203-230)."""
    if not visible:
        return line_string([])
    coords = [[lon, lat] for _, lon, lat in nodes]
    if is_area and len(coords) >= 4 and coords[0] == coords[-1]:
        return {"type": "Polygon", "coordinates": [coords]}
    if len(coords) >= 2:
        return line_string(coords)
    if len(coords) == 1:
        return point(*coords[0])
    return point()


# ---------------------------------------------------------------------------
# ring assembly (relations)
# ---------------------------------------------------------------------------


def build_rings(ways: list[list[Node]]) -> list[list[Node]]:
    """Join adjacent way node-lists into closed rings (BuilderInternal:852-920).

    Ways may need reversing; unclosed leftovers (invalid data) are dropped,
    matching the reference (joinable==false path discards the partial ring).
    """
    ways = [list(w) for w in ways]
    joined: list[list[Node]] = []
    while ways:
        current = ways.pop(0)
        if not current:
            continue
        while True:
            first_id = current[0][0]
            last_id = current[-1][0]
            if first_id == last_id:
                joined.append(current)
                break
            joinable = False
            i = 0
            while i < len(ways):
                what = ways[i]
                if not what:
                    i += 1
                    continue
                if last_id == what[0][0]:
                    current.extend(what[1:])
                    ways.pop(i)
                    last_id = current[-1][0]
                    joinable = True
                elif first_id == what[-1][0]:
                    current[0:0] = what[:-1]
                    ways.pop(i)
                    first_id = current[0][0]
                    joinable = True
                elif last_id == what[-1][0]:
                    current.extend(reversed(what[:-1]))
                    ways.pop(i)
                    last_id = current[-1][0]
                    joinable = True
                elif first_id == what[0][0]:
                    current[0:0] = list(reversed(what[1:]))
                    ways.pop(i)
                    first_id = current[0][0]
                    joinable = True
                else:
                    i += 1
                if first_id == last_id:
                    break
            if not joinable:
                # dangling way / unclosed ring: invalid geometry, dropped
                break
        # unclosed `current` is discarded (reference keeps only closed rings)
    return joined


def split_pinched_rings(
    rings: list[list[Node]], holes: list[list[Node]]
) -> None:
    """Split figure-8 rings at repeated node ids (BuilderInternal:652-745).

    Mutates `rings`; split-off parts nested inside an odd number of the other
    parts become holes (appended to `holes`), the rest stay outer rings.
    """
    additional: list[list[Node]] = []
    for idx in range(len(rings)):
        ring = rings[idx]
        split_parts = _split_pinched_ring(ring)
        if split_parts is None:
            continue
        split_parts.append(list(ring))
        rings[idx] = []
        geoms = [
            {"type": "Polygon", "coordinates": [[[n[1], n[2]] for n in part]]}
            if len(part) >= 4
            else None
            for part in split_parts
        ]
        nesting = [0] * len(split_parts)
        for i in range(len(split_parts)):
            for j in range(len(split_parts)):
                if i == j or geoms[i] is None or geoms[j] is None:
                    continue
                if _covered_by(split_parts[i], geoms[j]):
                    nesting[i] += 1
        for i, part in enumerate(split_parts):
            if nesting[i] % 2 == 0:
                additional.append(part)
            else:
                holes.append(part)
    rings[:] = [r for r in rings if r] + additional


def _split_pinched_ring(ring: list[Node]) -> list[list[Node]] | None:
    """One ring's figure-8 split (BuilderInternal:707-745); mutates `ring`."""
    result: list[list[Node]] | None = None
    was_splittable = True
    while was_splittable:
        was_splittable = False
        node_pos: dict[int, int] = {}
        for cur, node in enumerate(ring):
            nid = node[0]
            if nid in node_pos:
                pos = node_pos[nid]
                additional = list(ring[pos : cur + 1])
                remaining = list(ring[:pos]) + list(ring[cur:])
                ring[:] = remaining
                if result is None:
                    result = []
                result.append(additional)
                was_splittable = True
                break
            if cur > 0:  # start node repeats at the end by construction
                node_pos[nid] = cur
    return result


def _covered_by(part: list[Node], poly: Geometry) -> bool:
    """Approximate JTS coveredBy for split-off ring parts: every vertex is
    inside or on the candidate polygon (edge midpoints break ties)."""
    ring_ids = {n[0] for n in part}
    poly_pts = {(p[0], p[1]) for p in poly["coordinates"][0]}
    xs, ys = [], []
    for _, lon, lat in part:
        if (lon, lat) not in poly_pts:
            xs.append(lon)
            ys.append(lat)
    if not xs:
        # all vertices shared -> use edge midpoints
        for k in range(len(part) - 1):
            xs.append((part[k][1] + part[k + 1][1]) / 2)
            ys.append((part[k][2] + part[k + 1][2]) / 2)
    inside = points_in_polygon(np.asarray(xs), np.asarray(ys), poly)
    return bool(inside.all())


def merge_touching_rings(rings: list[list[Node]]) -> None:
    """Merge rings sharing >= 1 segment into one (BuilderInternal:573-626).

    A segment is an unordered pair of consecutive node ids.  Mutates `rings`.
    """
    # segment -> owning ring object (identity semantics, as the reference's
    # HashMap<Segment, LinkedList> keyed by object reference)
    ring_segments: dict[frozenset, list] = {}
    i = 0
    while i < len(rings):
        ring = rings[i]
        merged_segments: list[frozenset] = []
        owner = ring
        merged = False
        prev = ring[0][0]
        for node in ring[1:]:
            seg = frozenset((prev, node[0]))
            prev = node[0]
            if seg not in ring_segments:
                merged_segments.append(seg)
                continue
            # merge `ring` into the previously seen target ring
            target = ring_segments[seg]
            ring_segments = {
                s: r for s, r in ring_segments.items() if r is not target
            }
            _cut_at_segment(target, seg)
            _cut_at_segment(ring, seg)
            _merge_segments_to_ring(target, ring)
            merged_segments = [
                frozenset((a[0], b[0])) for a, b in zip(target, target[1:])
            ]
            owner = target
            merged = True
            break
        for seg in merged_segments:
            ring_segments[seg] = owner
        if merged:
            rings.pop(i)  # current ring was absorbed into `target`
        else:
            i += 1


def _cut_at_segment(ring: list[Node], seg: frozenset) -> None:
    """Open the ring so its two ends are exactly the cut segment's nodes
    (BuilderInternal:765-783).  (A,B,C,D,E,F,A) cut at (B,C) -> (C,D,E,F,A,B)."""
    ring.pop(0)
    for _ in range(len(ring)):
        if frozenset((ring[0][0], ring[-1][0])) == seg:
            return
        ring.append(ring.pop(0))
    raise ValueError("cut segment not found in ring")


def _merge_segments_to_ring(target: list[Node], source: list[Node]) -> None:
    """Join two cut-open rings, shaving shared back-tracking segments
    (BuilderInternal:805-830).  Result left in `target`."""
    if target[0][0] == source[0][0]:
        source.reverse()
    while (
        len(source) > 1
        and len(target) > 1
        and source[0][0] == target[-1][0]
        and source[1][0] == target[-2][0]
    ):
        source.pop(0)
        target.pop()
    while (
        len(source) > 1
        and len(target) > 1
        and source[-1][0] == target[0][0]
        and source[-2][0] == target[1][0]
    ):
        source.pop()
        target.pop(0)
    source.pop(0)
    target.extend(source)


# ---------------------------------------------------------------------------
# multipolygon + relation assembly
# ---------------------------------------------------------------------------


def build_multipolygon_geometry(
    outer_lines: list[list[Node]], inner_lines: list[list[Node]]
) -> Geometry:
    """BuilderInternal:483-533: rings from lines, pinch-split, touch-merge,
    then hole-to-shell assignment by containment."""
    outer_rings = build_rings(outer_lines)
    inner_rings = build_rings(inner_lines)
    split_pinched_rings(outer_rings, inner_rings)
    merge_touching_rings(inner_rings)

    def ring_coords(ring: list[Node]) -> list[list[float]]:
        return [[lon, lat] for _, lon, lat in ring]

    outers = [ring_coords(r) for r in outer_rings if len(r) >= 4]
    inners = [ring_coords(r) for r in inner_rings if len(r) >= 4]

    if len(outers) == 1:
        return {"type": "Polygon", "coordinates": [outers[0]] + inners}
    if not outers:
        return {"type": "MultiPolygon", "coordinates": []}
    # assign each inner to the outer that contains it (STRtree candidate
    # lookup + PreparedPolygon.contains in the reference; vectorized PIP here)
    polys: list[list[list[list[float]]]] = [[o] for o in outers]
    for inner in inners:
        arr = np.asarray(inner, dtype=np.float64)
        for k, outer in enumerate(outers):
            shell = {"type": "Polygon", "coordinates": [outer]}
            # envelope quick-reject
            o = np.asarray(outer, dtype=np.float64)
            if (
                arr[:, 0].min() < o[:, 0].min()
                or arr[:, 0].max() > o[:, 0].max()
                or arr[:, 1].min() < o[:, 1].min()
                or arr[:, 1].max() > o[:, 1].max()
            ):
                continue
            mid = (arr[:-1] + arr[1:]) / 2  # interior probe points
            if points_in_polygon(mid[:, 0], mid[:, 1], shell).all():
                polys[k].append(inner)
                break
        # unmatched inner rings are dropped (reference todo:, same behavior)
    return {"type": "MultiPolygon", "coordinates": polys}


def build_relation_geometry(
    visible: bool,
    is_area: bool,
    member_lines: list[dict],
) -> Geometry:
    """Assemble a relation's geometry.

    `member_lines`: one dict per member, with keys
        kind:    'outer' | 'inner' | 'other'
        nodes:   list[Node] (resolved + visible-filtered way nodes), or None
                 if the member is missing (redacted/incomplete)
        geom:    prebuilt member geometry for the collection fallback (opt.)

    Dispatch: BuilderInternal:243-265 — area relations try the multipolygon
    builder, empty result falls back to GeometryCollection.
    """
    if not visible:
        return geometry_collection([])
    if is_area:
        outers = [
            m["nodes"]
            for m in member_lines
            if m["kind"] == "outer" and m.get("nodes")
        ]
        inners = [
            m["nodes"]
            for m in member_lines
            if m["kind"] == "inner" and m.get("nodes")
        ]
        mp = build_multipolygon_geometry(outers, inners)
        if mp["coordinates"]:
            return mp
    # fallback: collection of member geometries, missing members skipped
    geoms = []
    for m in member_lines:
        g = m.get("geom")
        if g is None and m.get("nodes"):
            coords = [[lon, lat] for _, lon, lat in m["nodes"]]
            if len(coords) >= 2:
                g = line_string(coords)
            elif coords:
                g = point(*coords[0])
        if g is not None:
            geoms.append(g)
    return geometry_collection(geoms)


def resolve_way_area(
    interpreter: TagInterpreter, refs: list[int], tags: dict[int, int]
) -> bool:
    return interpreter.way_is_area(refs, tags)
