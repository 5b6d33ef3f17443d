"""Geometry clipping to a bounding box (and convex polygons).

Reproduces the semantics of the reference's clipped-geometry construction:
  * CellIterator.constructClippedGeometry
    (/root/reference/oshdb-util/.../celliterator/CellIterator.java:417-459):
    fully-inside -> identity; fully-outside -> typed EMPTY geometry; else clip.
  * Geo.clip (Geo.java:509-515) delegates to JTS intersection; we implement
    the bbox case directly: Sutherland-Hodgman for rings (exact for the
    convex bbox clipper), Liang-Barsky for line strings, containment test
    for points.

Known divergence from JTS: if a ring's intersection with the bbox is
disconnected, Sutherland-Hodgman returns one ring with degenerate bridging
edges instead of a MultiPolygon (zero-width slivers; area/length unaffected
to first order).  OSM-scale features clipped by cell-sized boxes rarely hit
this; test fixtures avoid it.
"""

from __future__ import annotations

import numpy as np

from oshdb_spark.geometry.model import (
    Geometry,
    geometry_collection,
    is_empty,
    line_string,
    multi_line_string,
    point,
)


def _empty_like(geom: Geometry) -> Geometry:
    """Typed empty geometry (CellIterator.java:448-459 emits typed empties)."""
    t = geom["type"]
    if t == "GeometryCollection":
        return geometry_collection([])
    return {"type": t, "coordinates": []}


def _clip_points(coords: np.ndarray, bbox) -> np.ndarray:
    minx, miny, maxx, maxy = bbox
    keep = (
        (coords[:, 0] >= minx)
        & (coords[:, 0] <= maxx)
        & (coords[:, 1] >= miny)
        & (coords[:, 1] <= maxy)
    )
    return coords[keep]


def _clip_segment(x1, y1, x2, y2, bbox):
    """Liang-Barsky: returns clipped segment or None."""
    minx, miny, maxx, maxy = bbox
    dx = x2 - x1
    dy = y2 - y1
    t0, t1 = 0.0, 1.0
    for p, q in ((-dx, x1 - minx), (dx, maxx - x1), (-dy, y1 - miny), (dy, maxy - y1)):
        if p == 0:
            if q < 0:
                return None
        else:
            r = q / p
            if p < 0:
                if r > t1:
                    return None
                if r > t0:
                    t0 = r
            else:
                if r < t0:
                    return None
                if r < t1:
                    t1 = r
    return (x1 + t0 * dx, y1 + t0 * dy, x1 + t1 * dx, y1 + t1 * dy)


def _clip_line(coords: list, bbox) -> list[list[list[float]]]:
    """Clip a linestring; may return multiple parts."""
    parts: list[list[list[float]]] = []
    current: list[list[float]] = []
    for i in range(1, len(coords)):
        x1, y1 = coords[i - 1]
        x2, y2 = coords[i]
        seg = _clip_segment(x1, y1, x2, y2, bbox)
        if seg is None:
            if len(current) > 1:
                parts.append(current)
            current = []
            continue
        cx1, cy1, cx2, cy2 = seg
        if current and current[-1] == [cx1, cy1]:
            current.append([cx2, cy2])
        else:
            if len(current) > 1:
                parts.append(current)
            current = [[cx1, cy1], [cx2, cy2]]
    if len(current) > 1:
        parts.append(current)
    return parts


def _clip_ring_sh(ring: list, bbox) -> list[list[float]]:
    """Sutherland-Hodgman ring clip against the bbox (exact: bbox is convex)."""
    minx, miny, maxx, maxy = bbox

    def clip_edge(pts, inside, intersect):
        if not pts:
            return []
        out = []
        prev = pts[-1]
        prev_in = inside(prev)
        for cur in pts:
            cur_in = inside(cur)
            if cur_in:
                if not prev_in:
                    out.append(intersect(prev, cur))
                out.append(cur)
            elif prev_in:
                out.append(intersect(prev, cur))
            prev, prev_in = cur, cur_in
        return out

    def ix_x(xc):
        def f(p, q):
            t = (xc - p[0]) / (q[0] - p[0])
            return [xc, p[1] + t * (q[1] - p[1])]
        return f

    def ix_y(yc):
        def f(p, q):
            t = (yc - p[1]) / (q[1] - p[1])
            return [p[0] + t * (q[0] - p[0]), yc]
        return f

    pts = [list(p) for p in ring[:-1]] if ring and ring[0] == ring[-1] else [
        list(p) for p in ring
    ]
    pts = clip_edge(pts, lambda p: p[0] >= minx, ix_x(minx))
    pts = clip_edge(pts, lambda p: p[0] <= maxx, ix_x(maxx))
    pts = clip_edge(pts, lambda p: p[1] >= miny, ix_y(miny))
    pts = clip_edge(pts, lambda p: p[1] <= maxy, ix_y(maxy))
    if len(pts) < 3:
        return []
    pts.append(list(pts[0]))
    return pts


def clip_to_bbox(geom: Geometry | None, bbox) -> Geometry:
    """Clip any geometry to (minx, miny, maxx, maxy)."""
    if geom is None or is_empty(geom):
        return _empty_like(geom or point())
    t = geom["type"]
    if t == "Point":
        x, y = geom["coordinates"]
        minx, miny, maxx, maxy = bbox
        if minx <= x <= maxx and miny <= y <= maxy:
            return geom
        return point()
    if t == "LineString":
        parts = _clip_line(geom["coordinates"], bbox)
        if not parts:
            return line_string([])
        if len(parts) == 1:
            return line_string(parts[0])
        return multi_line_string(parts)
    if t == "MultiLineString":
        parts = []
        for line in geom["coordinates"]:
            parts.extend(_clip_line(line, bbox))
        if not parts:
            return line_string([])
        if len(parts) == 1:
            return line_string(parts[0])
        return multi_line_string(parts)
    if t == "Polygon":
        rings = [_clip_ring_sh(r, bbox) for r in geom["coordinates"]]
        shell = rings[0] if rings else []
        if not shell:
            return {"type": "Polygon", "coordinates": []}
        holes = [r for r in rings[1:] if r]
        return {"type": "Polygon", "coordinates": [shell] + holes}
    if t == "MultiPolygon":
        out = []
        for poly_rings in geom["coordinates"]:
            rings = [_clip_ring_sh(r, bbox) for r in poly_rings]
            if rings and rings[0]:
                out.append([rings[0]] + [r for r in rings[1:] if r])
        if not out:
            return {"type": "MultiPolygon", "coordinates": []}
        if len(out) == 1:
            return {"type": "Polygon", "coordinates": out[0]}
        return {"type": "MultiPolygon", "coordinates": out}
    if t == "GeometryCollection":
        clipped = [clip_to_bbox(g, bbox) for g in geom["geometries"]]
        return geometry_collection([g for g in clipped if not is_empty(g)])
    raise ValueError(f"unknown geometry type {t}")


# ---------------------------------------------------------------------------
# convex-polygon clipping (polygon area-of-interest)
# ---------------------------------------------------------------------------


def _convex_edges(poly: Geometry) -> list[tuple[list, list]] | None:
    """CCW-oriented edge list of the polygon's shell, or None if the shell
    is not convex (or has holes) — Sutherland-Hodgman is only exact for a
    convex clipper; the caller falls back to bbox-clip + intersects filter
    (documented divergence from the reference's general JTS intersection)."""
    if poly["type"] != "Polygon" or len(poly["coordinates"]) != 1:
        return None
    ring = [list(p) for p in poly["coordinates"][0]]
    if ring[0] == ring[-1]:
        ring = ring[:-1]
    if len(ring) < 3:
        return None
    # signed area (shoelace) -> orientation; normalize to CCW
    area2 = sum(
        ring[i][0] * ring[(i + 1) % len(ring)][1]
        - ring[(i + 1) % len(ring)][0] * ring[i][1]
        for i in range(len(ring))
    )
    if area2 == 0:
        return None
    if area2 < 0:
        ring = ring[::-1]
    n = len(ring)
    for i in range(n):
        a, b, c = ring[i], ring[(i + 1) % n], ring[(i + 2) % n]
        cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if cross < 0:
            return None  # reflex vertex: not convex
    return [(ring[i], ring[(i + 1) % n]) for i in range(n)]


def is_convex_polygon(poly: Geometry) -> bool:
    return _convex_edges(poly) is not None


def _halfplane_clip_ring(pts: list, a: list, b: list) -> list:
    """Clip a ring's point list against the left half-plane of edge a->b."""
    ex, ey = b[0] - a[0], b[1] - a[1]

    def side(p):
        return ex * (p[1] - a[1]) - ey * (p[0] - a[0])

    def ix(p, q):
        sp, sq = side(p), side(q)
        t = sp / (sp - sq)
        return [p[0] + t * (q[0] - p[0]), p[1] + t * (q[1] - p[1])]

    if not pts:
        return []
    out = []
    prev = pts[-1]
    prev_in = side(prev) >= 0
    for cur in pts:
        cur_in = side(cur) >= 0
        if cur_in:
            if not prev_in:
                out.append(ix(prev, cur))
            out.append(cur)
        elif prev_in:
            out.append(ix(prev, cur))
        prev, prev_in = cur, cur_in
    return out


def _clip_ring_convex(ring: list, edges) -> list:
    pts = [list(p) for p in (ring[:-1] if ring and ring[0] == ring[-1] else ring)]
    for a, b in edges:
        pts = _halfplane_clip_ring(pts, a, b)
        if not pts:
            return []
    if len(pts) < 3:
        return []
    pts.append(list(pts[0]))
    return pts


def _clip_segment_convex(p, q, edges):
    """Cyrus-Beck segment clip against the convex polygon; None if outside."""
    t0, t1 = 0.0, 1.0
    dx, dy = q[0] - p[0], q[1] - p[1]
    for a, b in edges:
        ex, ey = b[0] - a[0], b[1] - a[1]
        # signed distance of the moving point: f(t) = s0 + t * ds
        s0 = ex * (p[1] - a[1]) - ey * (p[0] - a[0])
        ds = ex * dy - ey * dx
        if ds == 0:
            if s0 < 0:
                return None
            continue
        t_hit = -s0 / ds
        if ds > 0:
            t0 = max(t0, t_hit)
        else:
            t1 = min(t1, t_hit)
        if t0 > t1:
            return None
    return (
        [p[0] + t0 * dx, p[1] + t0 * dy],
        [p[0] + t1 * dx, p[1] + t1 * dy],
    )


def _clip_line_convex(coords: list, edges) -> list[list[list[float]]]:
    parts: list[list[list[float]]] = []
    current: list[list[float]] = []
    for i in range(1, len(coords)):
        seg = _clip_segment_convex(coords[i - 1], coords[i], edges)
        if seg is None:
            if len(current) > 1:
                parts.append(current)
            current = []
            continue
        c1, c2 = seg
        if current and current[-1] == c1:
            current.append(c2)
        else:
            if len(current) > 1:
                parts.append(current)
            current = [c1, c2]
    if len(current) > 1:
        parts.append(current)
    return parts


def clip_to_convex_polygon(geom: Geometry | None, poly: Geometry) -> Geometry:
    """Clip any geometry to a CONVEX polygon AOI (Geo.clip polygon case,
    Geo.java:513-515, restricted to convex clippers where Sutherland-
    Hodgman / Cyrus-Beck are exact).  Raises ValueError for non-convex
    polygons — callers check ``is_convex_polygon`` and fall back."""
    edges = _convex_edges(poly)
    if edges is None:
        raise ValueError("clip polygon must be convex without holes")
    if geom is None or is_empty(geom):
        return _empty_like(geom or point())
    t = geom["type"]
    if t == "Point":
        x, y = geom["coordinates"]
        for a, b in edges:
            if (b[0] - a[0]) * (y - a[1]) - (b[1] - a[1]) * (x - a[0]) < 0:
                return point()
        return geom
    if t == "LineString":
        parts = _clip_line_convex(geom["coordinates"], edges)
        if not parts:
            return line_string([])
        return line_string(parts[0]) if len(parts) == 1 else multi_line_string(parts)
    if t == "MultiLineString":
        parts = []
        for line in geom["coordinates"]:
            parts.extend(_clip_line_convex(line, edges))
        if not parts:
            return line_string([])
        return line_string(parts[0]) if len(parts) == 1 else multi_line_string(parts)
    if t == "Polygon":
        rings = [_clip_ring_convex(r, edges) for r in geom["coordinates"]]
        shell = rings[0] if rings else []
        if not shell:
            return {"type": "Polygon", "coordinates": []}
        return {"type": "Polygon", "coordinates": [shell] + [r for r in rings[1:] if r]}
    if t == "MultiPolygon":
        out = []
        for poly_rings in geom["coordinates"]:
            rings = [_clip_ring_convex(r, edges) for r in poly_rings]
            if rings and rings[0]:
                out.append([rings[0]] + [r for r in rings[1:] if r])
        if not out:
            return {"type": "MultiPolygon", "coordinates": []}
        if len(out) == 1:
            return {"type": "Polygon", "coordinates": out[0]}
        return {"type": "MultiPolygon", "coordinates": out}
    if t == "GeometryCollection":
        clipped = [clip_to_convex_polygon(g, poly) for g in geom["geometries"]]
        return geometry_collection([g for g in clipped if not is_empty(g)])
    raise ValueError(f"unknown geometry type {t}")
