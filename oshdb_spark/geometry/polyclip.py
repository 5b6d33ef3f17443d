"""General (non-convex, holed, multi) polygon intersects + clipping.

Closes the round-1 gap: real AOIs (city/country boundaries) are never
convex.  Reference semantics covered here:

  * exact geometry x polygon ``intersects``:
    FastInPolygon banded crossing test + PreparedGeometry.intersects as
    used by GeometrySplitter
    (/root/reference/oshdb-util/src/main/java/org/heigit/ohsome/oshdb/util/geometry/fip/FastInPolygon.java:22-175,
    /root/reference/oshdb-api/src/main/java/org/heigit/ohsome/oshdb/api/mapreducer/GeometrySplitter.java:120-137).
    The round-1 vertex-only test missed a way crossing the polygon with
    all vertices outside; this module adds the segment x ring-edge
    crossing test that makes the predicate exact.
  * general clipping: FastPolygonOperations pre-decomposes the clip
    polygon so each piece is cheap to intersect
    (fip/FastPolygonOperations.java:26-60 — 2^k x 2^k quad blocks of
    ~40 vertices).  We decompose further, to TRIANGLES (ear clipping
    with hole bridging): a triangle is convex, so each piece-clip is the
    exact Sutherland-Hodgman/Cyrus-Beck kernel already proven for the
    convex path (geometry/clip.py).  intersection(geom, poly) =
    union over triangles of intersection(geom, tri); since triangle
    interiors are disjoint, areas are additive and the union region is
    exactly the true intersection.

Output-shape note (documented divergence from JTS): polygonal clip
results come back as a MultiPolygon of triangle-clipped pieces that
share internal edges, not as one dissolved polygon.  The REGION is
exact — emptiness tests, areas (edge-additive spherical-excess sums
cancel on shared internal edges up to float round-off) and any
point-in-result test agree with JTS — only the ring decomposition of
the WKT differs.  Line and point clips are produced directly (segment
splitting at edge crossings), not via the decomposition, so they match
JTS output shapes.

The decomposition runs ONCE per query polygon on the driver
(``PreparedPolygon``) and ships to executors inside the UDF closure —
the Spark-side analog of constructing FastPolygonOperations once and
broadcasting it with the query.
"""

from __future__ import annotations

import math

import numpy as np

from oshdb_spark.geometry.clip import clip_to_convex_polygon
from oshdb_spark.geometry.model import (
    Geometry,
    bounds,
    geometry_collection,
    is_empty,
    line_string,
    multi_line_string,
    point,
)
from oshdb_spark.geometry.pip import (
    bbox_in_polygon,
    bbox_outside_polygon,
    points_in_polygon,
)

# ---------------------------------------------------------------------------
# ring helpers
# ---------------------------------------------------------------------------


def _open_ring(ring) -> list[list[float]]:
    pts = [list(map(float, p)) for p in ring]
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts = pts[:-1]
    return pts


def _signed_area2(pts: list[list[float]]) -> float:
    n = len(pts)
    s = 0.0
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s


def _dedupe_consecutive(pts: list[list[float]]) -> list[list[float]]:
    out = []
    for p in pts:
        if not out or p != out[-1]:
            out.append(p)
    if len(out) > 1 and out[0] == out[-1]:
        out = out[:-1]
    return out


# ---------------------------------------------------------------------------
# ear-clipping triangulation with hole bridging
# ---------------------------------------------------------------------------


def _point_in_tri_blocking(p, a, b, c) -> bool:
    """True if p blocks ear (a,b,c): inside or on its boundary, and not
    coincident with a corner (bridged vertices duplicate coordinates)."""
    if p == a or p == b or p == c:
        return False
    d1 = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
    d2 = (c[0] - b[0]) * (p[1] - b[1]) - (c[1] - b[1]) * (p[0] - b[0])
    d3 = (a[0] - c[0]) * (p[1] - c[1]) - (a[1] - c[1]) * (p[0] - c[0])
    return d1 >= 0 and d2 >= 0 and d3 >= 0


def _ear_clip(pts: list[list[float]]) -> list[tuple]:
    """Triangulate a simple CCW polygon (may contain duplicated bridge
    vertices) by ear clipping.  O(n^2) worst case — run once per query
    polygon on the driver, never per row."""
    idx = list(range(len(pts)))
    tris: list[tuple] = []
    stuck = 0
    while len(idx) > 3:
        n = len(idx)
        found = False
        for k in range(n):
            i0, i1, i2 = idx[k - 1], idx[k], idx[(k + 1) % n]
            a, b, c = pts[i0], pts[i1], pts[i2]
            cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            if cross < 0:
                continue  # reflex
            if cross == 0:
                # collinear spike/bridge seam: removing the middle vertex is
                # always safe (zero-area ear)
                del idx[k]
                found = True
                break
            if any(
                _point_in_tri_blocking(pts[j], a, b, c)
                for j in idx
                if j not in (i0, i1, i2)
            ):
                continue
            tris.append((tuple(a), tuple(b), tuple(c)))
            del idx[k]
            found = True
            break
        if not found:
            stuck += 1
            if stuck > 1:
                raise ValueError(
                    "ear clipping failed: polygon is self-intersecting or "
                    "numerically degenerate"
                )
        else:
            stuck = 0
    a, b, c = pts[idx[0]], pts[idx[1]], pts[idx[2]]
    if (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]) > 0:
        tris.append((tuple(a), tuple(b), tuple(c)))
    return tris


def _bridge_hole(outer: list[list[float]], hole: list[list[float]]) -> list[list[float]]:
    """Splice one hole (CW, open) into the outer ring (CCW, open) via a
    mutually visible vertex pair (Eberly, "Triangulation by Ear Clipping"
    §5 — the same hole-elimination JTS performs internally before its
    polygon triangulations)."""
    mi = max(range(len(hole)), key=lambda i: (hole[i][0], hole[i][1]))
    mx, my = hole[mi]
    # closest outer-edge intersection of the +x ray from M
    best_t = math.inf
    best_edge = -1
    n = len(outer)
    for e in range(n):
        x1, y1 = outer[e]
        x2, y2 = outer[(e + 1) % n]
        if (y1 > my) == (y2 > my):
            continue
        t = x1 + (my - y1) / (y2 - y1) * (x2 - x1)
        if t >= mx and t < best_t:
            best_t = t
            best_edge = e
    if best_edge < 0:
        raise ValueError("hole outside outer ring")
    x1, y1 = outer[best_edge]
    x2, y2 = outer[(best_edge + 1) % n]
    # candidate visible vertex: endpoint of the hit edge with larger x
    p_idx = best_edge if x1 > x2 else (best_edge + 1) % n
    ix, iy = best_t, my
    # a reflex outer vertex inside triangle (M, I, P) would occlude P; pick
    # the occluder minimizing the angle to the ray (then distance)
    px, py = outer[p_idx]
    best = None
    for j in range(n):
        if j == p_idx:
            continue
        a, b, c = outer[j - 1], outer[j], outer[(j + 1) % n]
        reflex = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]) < 0
        if not reflex:
            continue
        if _point_in_tri_blocking(b, [mx, my], [ix, iy], [px, py]):
            dx, dy = b[0] - mx, b[1] - my
            d = math.hypot(dx, dy)
            cos_a = dx / d if d else 1.0
            key = (-cos_a, d)
            if best is None or key < best[0]:
                best = (key, j)
    if best is not None:
        p_idx = best[1]
    # splice: outer[0..p] + M + hole(rotated from M) + M + P + outer[p+1..]
    rotated = hole[mi:] + hole[:mi]
    return (
        outer[: p_idx + 1]
        + [list(rotated[0])]
        + [list(p) for p in rotated[1:]]
        + [list(rotated[0]), list(outer[p_idx])]
        + outer[p_idx + 1 :]
    )


def triangulate_polygon(shell, holes=()) -> list[tuple]:
    """Triangles (CCW coordinate triples) covering shell minus holes."""
    outer = _dedupe_consecutive(_open_ring(shell))
    if len(outer) < 3:
        return []
    if _signed_area2(outer) < 0:
        outer = outer[::-1]
    hs = []
    for h in holes:
        hh = _dedupe_consecutive(_open_ring(h))
        if len(hh) < 3:
            continue
        if _signed_area2(hh) > 0:
            hh = hh[::-1]  # holes clockwise
        hs.append(hh)
    # merge holes rightmost-first so later bridges cannot cross them
    for hh in sorted(hs, key=lambda h: -max(p[0] for p in h)):
        outer = _bridge_hole(outer, hh)
    return _ear_clip(outer)


# ---------------------------------------------------------------------------
# exact segment-crossing intersects
# ---------------------------------------------------------------------------


def _ring_segments(poly: Geometry) -> tuple[np.ndarray, ...]:
    xs1, ys1, xs2, ys2 = [], [], [], []
    t = poly["type"]
    polys = poly["coordinates"] if t == "MultiPolygon" else [poly["coordinates"]]
    for rings in polys:
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64)
            xs1.append(r[:-1, 0])
            ys1.append(r[:-1, 1])
            xs2.append(r[1:, 0])
            ys2.append(r[1:, 1])
    return (
        np.concatenate(xs1),
        np.concatenate(ys1),
        np.concatenate(xs2),
        np.concatenate(ys2),
    )


def _geom_segments(geom: Geometry) -> tuple[np.ndarray, ...] | None:
    lines: list[np.ndarray] = []
    t = geom["type"]
    c = geom.get("coordinates") or []
    if t == "LineString":
        lines = [np.asarray(c, dtype=np.float64)]
    elif t == "MultiLineString":
        lines = [np.asarray(l, dtype=np.float64) for l in c]
    elif t == "Polygon":
        lines = [np.asarray(r, dtype=np.float64) for r in c]
    elif t == "MultiPolygon":
        lines = [np.asarray(r, dtype=np.float64) for rings in c for r in rings]
    else:
        return None
    xs1, ys1, xs2, ys2 = [], [], [], []
    for l in lines:
        if len(l) < 2:
            continue
        xs1.append(l[:-1, 0])
        ys1.append(l[:-1, 1])
        xs2.append(l[1:, 0])
        ys2.append(l[1:, 1])
    if not xs1:
        return None
    return (
        np.concatenate(xs1),
        np.concatenate(ys1),
        np.concatenate(xs2),
        np.concatenate(ys2),
    )


def _segments_cross(ga, pa) -> bool:
    """Any geometry segment touching/crossing any polygon ring segment?

    Vectorized orientation tests over the bbox-overlapping pair subset —
    the batch equivalent of FastInPolygon's banded per-segment walk.
    """
    gx1, gy1, gx2, gy2 = ga
    px1, py1, px2, py2 = pa
    # pair prefilter: segment-bbox overlap
    gminx, gmaxx = np.minimum(gx1, gx2), np.maximum(gx1, gx2)
    gminy, gmaxy = np.minimum(gy1, gy2), np.maximum(gy1, gy2)
    pminx, pmaxx = np.minimum(px1, px2), np.maximum(px1, px2)
    pminy, pmaxy = np.minimum(py1, py2), np.maximum(py1, py2)
    cand = (
        (gminx[:, None] <= pmaxx[None, :])
        & (gmaxx[:, None] >= pminx[None, :])
        & (gminy[:, None] <= pmaxy[None, :])
        & (gmaxy[:, None] >= pminy[None, :])
    )
    gi, pj = np.nonzero(cand)
    if len(gi) == 0:
        return False
    ax, ay, bx, by = gx1[gi], gy1[gi], gx2[gi], gy2[gi]
    cx, cy, dx, dy = px1[pj], py1[pj], px2[pj], py2[pj]
    d1 = (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx)
    d2 = (dx - cx) * (by - cy) - (dy - cy) * (bx - cx)
    d3 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    d4 = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (d1 != d2) & (d3 != d4)
    if proper.any():
        return True

    # touching: an endpoint collinear with AND within the other segment
    def on_seg(d, px_, py_, sx1, sy1, sx2, sy2):
        return (
            (d == 0)
            & (px_ >= np.minimum(sx1, sx2))
            & (px_ <= np.maximum(sx1, sx2))
            & (py_ >= np.minimum(sy1, sy2))
            & (py_ <= np.maximum(sy1, sy2))
        )

    touch = (
        on_seg(d1, ax, ay, cx, cy, dx, dy)
        | on_seg(d2, bx, by, cx, cy, dx, dy)
        | on_seg(d3, cx, cy, ax, ay, bx, by)
        | on_seg(d4, dx, dy, ax, ay, bx, by)
    )
    return bool(touch.any())


def geometry_intersects_polygon(geom: Geometry, poly: Geometry) -> bool:
    """EXACT ``geom intersects poly`` for any geometry type.

    Three evidence sources, each sufficient (JTS intersects semantics,
    boundary contact counts):
      1. a geometry vertex inside (or on) the polygon;
      2. a polygon vertex inside the (polygonal) geometry — poly entirely
         within a geometry ring;
      3. a geometry segment crossing or touching a polygon ring segment —
         the case the round-1 vertex test missed.
    Together these are exhaustive: if two regions/lines intersect without
    any boundary crossing, one contains a vertex of the other.
    """
    if geom is None or is_empty(geom):
        return False
    b = bounds(geom)
    if b is None:
        return False
    if bbox_outside_polygon(b, poly):
        return False
    if bbox_in_polygon(b, poly):
        return True
    t = geom["type"]
    if t == "GeometryCollection":
        return any(geometry_intersects_polygon(g, poly) for g in geom["geometries"])
    pts = np.asarray(list(_iter_coords(geom)), dtype=np.float64)
    if len(pts) and points_in_polygon(
        pts[:, 0], pts[:, 1], poly, include_boundary=True
    ).any():
        return True
    if t == "Point":
        return False
    if t in ("Polygon", "MultiPolygon"):
        ppts = np.asarray(list(_iter_coords(poly)), dtype=np.float64)
        if points_in_polygon(
            ppts[:, 0], ppts[:, 1], geom, include_boundary=True
        ).any():
            return True
    ga = _geom_segments(geom)
    if ga is None:
        return False
    return _segments_cross(ga, _ring_segments(poly))


def _iter_coords(geom: Geometry):
    from oshdb_spark.geometry.model import _iter_coords as it

    return it(geom)


# ---------------------------------------------------------------------------
# general clipping
# ---------------------------------------------------------------------------


class PreparedPolygon:
    """Driver-side prepared clip polygon: triangles + bboxes, built once
    per query and shipped in the UDF closure (the broadcast analog of
    constructing FastPolygonOperations once)."""

    def __init__(self, poly: Geometry):
        t = poly["type"]
        if t not in ("Polygon", "MultiPolygon"):
            raise ValueError(f"clip polygon must be (Multi)Polygon, got {t}")
        self.poly = poly
        self.bbox = bounds(poly)
        tris: list[tuple] = []
        polys = poly["coordinates"] if t == "MultiPolygon" else [poly["coordinates"]]
        for rings in polys:
            if not rings:
                continue
            tris.extend(triangulate_polygon(rings[0], rings[1:]))
        self.triangles = [
            {"type": "Polygon", "coordinates": [[list(a), list(b), list(c), list(a)]]}
            for a, b, c in tris
        ]
        if tris:
            arr = np.asarray(tris, dtype=np.float64)  # (n, 3, 2)
            self.tri_bounds = np.stack(
                [
                    arr[:, :, 0].min(axis=1),
                    arr[:, :, 1].min(axis=1),
                    arr[:, :, 0].max(axis=1),
                    arr[:, :, 1].max(axis=1),
                ],
                axis=1,
            )
        else:
            self.tri_bounds = np.zeros((0, 4))

    @property
    def ring_segments(self) -> tuple[np.ndarray, ...]:
        """Cached ring-edge arrays (computed once per prepared polygon, not
        per clipped row)."""
        if not hasattr(self, "_ring_segs"):
            self._ring_segs = _ring_segments(self.poly)
        return self._ring_segs

    def candidate_triangles(self, b: tuple[float, float, float, float]) -> list[int]:
        tb = self.tri_bounds
        m = (
            (tb[:, 0] <= b[2])
            & (tb[:, 2] >= b[0])
            & (tb[:, 1] <= b[3])
            & (tb[:, 3] >= b[1])
        )
        return list(np.nonzero(m)[0])

    def intersects(self, geom: Geometry) -> bool:
        return geometry_intersects_polygon(geom, self.poly)

    def clip(self, geom: Geometry) -> Geometry:
        return clip_to_polygon(geom, self)


def _clip_line_general(coords, prepared: PreparedPolygon) -> list[list[list[float]]]:
    """Exact line-in-polygon clip: split each segment at every ring-edge
    crossing, keep sub-segments whose midpoints are inside (boundary
    inclusive), stitch consecutive kept pieces.  Produced directly (not
    via the triangle decomposition) so output parts match JTS shapes."""
    px1, py1, px2, py2 = prepared.ring_segments
    parts: list[list[list[float]]] = []
    current: list[list[float]] = []
    for i in range(1, len(coords)):
        ax, ay = float(coords[i - 1][0]), float(coords[i - 1][1])
        bx, by = float(coords[i][0]), float(coords[i][1])
        dx, dy = bx - ax, by - ay
        # parameters t where segment crosses a ring edge
        denom = dx * (py2 - py1) - dy * (px2 - px1)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = ((px1 - ax) * (py2 - py1) - (py1 - ay) * (px2 - px1)) / denom
            u = ((px1 - ax) * dy - (py1 - ay) * dx) / denom
        valid = (denom != 0) & (t > 0) & (t < 1) & (u >= 0) & (u <= 1)
        ts = sorted({0.0, 1.0, *np.unique(t[valid]).tolist()})
        mids = np.asarray([(a + b) / 2 for a, b in zip(ts[:-1], ts[1:])])
        inside = points_in_polygon(
            ax + mids * dx, ay + mids * dy, prepared.poly, include_boundary=True
        )
        for (t0, t1), keep in zip(zip(ts[:-1], ts[1:]), inside):
            if keep:
                p0 = [ax + t0 * dx, ay + t0 * dy]
                p1 = [ax + t1 * dx, ay + t1 * dy]
                if current and current[-1] == p0:
                    current.append(p1)
                else:
                    if len(current) > 1:
                        parts.append(current)
                    current = [p0, p1]
            else:
                if len(current) > 1:
                    parts.append(current)
                current = []
    if len(current) > 1:
        parts.append(current)
    return parts


def segment_clip_part_counts(
    ax: np.ndarray, ay: np.ndarray, bx: np.ndarray, by: np.ndarray,
    prepared: PreparedPolygon,
) -> np.ndarray:
    """Number of surviving parts when clipping each 2-point segment to the
    polygon — the FULLY VECTORIZED batch kernel (one numpy broadcast over
    N segments x E ring edges, one PIP call for all interval midpoints):
    no per-row Python, the shape required at 10^12-document scale.

    Semantically identical to counting _clip_line_general's parts for the
    segment (tests assert kernel agreement); exercised end-to-end by the
    polygon_line_clip driver oracle.
    """
    ax = np.asarray(ax, dtype=np.float64)
    ay = np.asarray(ay, dtype=np.float64)
    bx = np.asarray(bx, dtype=np.float64)
    by = np.asarray(by, dtype=np.float64)
    n = len(ax)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    px1, py1, px2, py2 = prepared.ring_segments
    dx = (bx - ax)[:, None]
    dy = (by - ay)[:, None]
    ex = (px2 - px1)[None, :]
    ey = (py2 - py1)[None, :]
    rx = px1[None, :] - ax[:, None]
    ry = py1[None, :] - ay[:, None]
    denom = dx * ey - dy * ex
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (rx * ey - ry * ex) / denom
        u = (rx * dy - ry * dx) / denom
    valid = (denom != 0) & (t > 0) & (t < 1) & (u >= 0) & (u <= 1)

    seg_idx, _ = np.nonzero(valid)
    tvals = t[valid]
    order = np.lexsort((tvals, seg_idx))
    seg_s, t_s = seg_idx[order], tvals[order]
    # drop exact duplicates (a crossing at a ring vertex reports once per
    # adjacent edge) — they would create zero-length intervals
    if len(seg_s):
        keep = np.concatenate(
            [[True], (seg_s[1:] != seg_s[:-1]) | (t_s[1:] != t_s[:-1])]
        )
        seg_s, t_s = seg_s[keep], t_s[keep]

    counts = np.bincount(seg_s, minlength=n)
    m = counts + 1  # intervals per segment: crossings + 1
    total = int(m.sum())
    start_pos = np.concatenate([[0], np.cumsum(m)[:-1]])
    t0 = np.zeros(total)
    t1 = np.ones(total)
    pair_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(len(seg_s)) - pair_start[seg_s]
    t1[start_pos[seg_s] + rank] = t_s
    t0[start_pos[seg_s] + rank + 1] = t_s

    seg_of_iv = np.repeat(np.arange(n), m)
    tm = (t0 + t1) / 2
    mx = ax[seg_of_iv] + tm * (bx - ax)[seg_of_iv]
    my = ay[seg_of_iv] + tm * (by - ay)[seg_of_iv]
    inside = points_in_polygon(mx, my, prepared.poly, include_boundary=True)

    # a part starts at each inside interval that is the segment's first
    # interval or follows an outside interval (intervals are contiguous)
    first = np.zeros(total, dtype=bool)
    first[start_pos] = True
    prev_inside = np.concatenate([[False], inside[:-1]])
    starts = inside & (first | ~prev_inside)
    return np.bincount(seg_of_iv[starts], minlength=n)


def clip_to_polygon(geom: Geometry | None, prepared: PreparedPolygon) -> Geometry:
    """Clip any geometry to an arbitrary (Multi)Polygon with holes.

    Short-circuits first (CellIterator.java:417-459): bbox fully inside
    -> identity, fully outside -> typed empty; only border geometries pay
    for the real clip.
    """
    if geom is None or is_empty(geom):
        t = geom["type"] if geom else "Point"
        if t == "GeometryCollection":
            return geometry_collection([])
        return {"type": t, "coordinates": []}
    t = geom["type"]
    if t == "GeometryCollection":
        clipped = [clip_to_polygon(g, prepared) for g in geom["geometries"]]
        return geometry_collection([g for g in clipped if not is_empty(g)])
    b = bounds(geom)
    if b is None or bbox_outside_polygon(b, prepared.poly):
        return {"type": t, "coordinates": []}
    if bbox_in_polygon(b, prepared.poly):
        return geom
    if t == "Point":
        x, y = geom["coordinates"]
        inside = points_in_polygon(
            np.array([x]), np.array([y]), prepared.poly, include_boundary=True
        )[0]
        return geom if inside else point()
    if t in ("LineString", "MultiLineString"):
        lines = geom["coordinates"] if t == "MultiLineString" else [geom["coordinates"]]
        parts = []
        for l in lines:
            parts.extend(_clip_line_general(l, prepared))
        if not parts:
            return line_string([])
        return line_string(parts[0]) if len(parts) == 1 else multi_line_string(parts)
    if t in ("Polygon", "MultiPolygon"):
        pieces = []
        for ti in prepared.candidate_triangles(b):
            piece = clip_to_convex_polygon(geom, prepared.triangles[ti])
            if is_empty(piece):
                continue
            pc = piece["coordinates"]
            polys = pc if piece["type"] == "MultiPolygon" else [pc]
            for rings in polys:
                # drop degenerate slivers (zero planar area)
                if rings and abs(_signed_area2(_open_ring(rings[0]))) > 0:
                    pieces.append(rings)
        if not pieces:
            return {"type": t, "coordinates": []}
        if len(pieces) == 1:
            return {"type": "Polygon", "coordinates": pieces[0]}
        return {"type": "MultiPolygon", "coordinates": pieces}
    raise ValueError(f"unknown geometry type {t}")
