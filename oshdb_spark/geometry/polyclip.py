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
    ~40 vertices).  We decompose to convex TRAPEZOIDS (even-odd
    trapezoidal slab decomposition, see _slab_trapezoids): each
    piece-clip is the exact Sutherland-Hodgman/Cyrus-Beck kernel already
    proven for the convex path (geometry/clip.py).  intersection(geom,
    poly) = union over trapezoids of intersection(geom, trap); trapezoid
    interiors are disjoint, so areas are additive and the union region
    is exactly the true intersection.  A DISSOLVE pass (dissolve_rings)
    then cancels the shared internal edges of the piece soup and walks
    the surviving boundary into simple rings, so polygonal clip output
    has the same dissolved ring shape JTS ``intersection`` produces
    (Geo.java:509-515) — WKT ring structure, ring/part counts, and
    perimeter all match, not just region/area.  Line and point clips are
    produced directly (segment splitting at edge crossings), not via the
    decomposition, so they match JTS output shapes as well.

The decomposition runs ONCE per query polygon on the driver
(``PreparedPolygon``) and ships to executors inside the UDF closure —
the Spark-side analog of constructing FastPolygonOperations once and
broadcasting it with the query.
"""

from __future__ import annotations

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
# triangulation (trapezoidal slab decomposition)
# ---------------------------------------------------------------------------


def _slab_trapezoids(shell, holes=()) -> list[tuple]:
    """Interior trapezoids (xa, xb, y0a, y0b, y1a, y1b) of shell minus holes.

    Even-odd TRAPEZOIDAL SLAB decomposition: all ring x-coordinates become
    slab boundaries; within a slab every spanning edge is crossing-free
    (edges of valid rings meet only at endpoints, which lie on slab
    boundaries), so sorting the spanning edges by height and pairing them
    even-odd yields the exact interior trapezoids — shell-minus-holes
    falls out of the even-odd rule with NO hole bridging and no
    ear-clipping, which makes the decomposition immune to the degenerate
    inputs real boundaries throw at it (touching holes, rings meeting at
    a point, collinear spikes — osm-testdata 7xx).  Linear interpolation
    at slab edges is exact, so total area is exact.  Runs once per query
    polygon on the driver.
    """
    rings = [_dedupe_consecutive(_open_ring(shell))]
    for h in holes:
        hh = _dedupe_consecutive(_open_ring(h))
        if len(hh) >= 3:
            rings.append(hh)
    if len(rings[0]) < 3:
        return []
    xs1, ys1, xs2, ys2 = [], [], [], []
    for r in rings:
        a = np.asarray(r + [r[0]], dtype=np.float64)
        xs1.append(a[:-1, 0]); ys1.append(a[:-1, 1])
        xs2.append(a[1:, 0]); ys2.append(a[1:, 1])
    ex1 = np.concatenate(xs1); ey1 = np.concatenate(ys1)
    ex2 = np.concatenate(xs2); ey2 = np.concatenate(ys2)
    nonvert = ex1 != ex2
    ex1, ey1, ex2, ey2 = ex1[nonvert], ey1[nonvert], ex2[nonvert], ey2[nonvert]
    if len(ex1) == 0:
        return []
    eminx = np.minimum(ex1, ex2); emaxx = np.maximum(ex1, ex2)
    with np.errstate(invalid="ignore"):
        slope = (ey2 - ey1) / (ex2 - ex1)
    xs = np.unique(np.concatenate([ex1, ex2]))
    traps: list[tuple] = []
    for xa, xb in zip(xs[:-1], xs[1:]):
        active = (eminx <= xa) & (emaxx >= xb)
        if not active.any():
            continue
        idx = np.nonzero(active)[0]
        ya = ey1[idx] + slope[idx] * (xa - ex1[idx])
        yb = ey1[idx] + slope[idx] * (xb - ex1[idx])
        order = np.argsort((ya + yb) / 2, kind="stable")
        ya, yb = ya[order], yb[order]
        for k in range(0, len(idx) - 1, 2):
            traps.append((xa, xb, ya[k], yb[k], ya[k + 1], yb[k + 1]))
    return traps


def triangulate_polygon(shell, holes=()) -> list[tuple]:
    """Triangles (CCW coordinate triples) covering shell minus holes —
    each slab trapezoid (see _slab_trapezoids) split along a diagonal."""
    tris: list[tuple] = []
    for xa, xb, y0a, y0b, y1a, y1b in _slab_trapezoids(shell, holes):
        # trapezoid (xa,y0a)-(xb,y0b)-(xb,y1b)-(xa,y1a), CCW
        for tri in (
            ((xa, y0a), (xb, y0b), (xb, y1b)),
            ((xa, y0a), (xb, y1b), (xa, y1a)),
        ):
            (tax, tay), (tbx, tby), (tcx, tcy) = tri
            if (tbx - tax) * (tcy - tay) - (tby - tay) * (tcx - tax) > 0:
                tris.append(tri)
    return tris


def trapezoids_polygon(shell, holes=()) -> list[list[tuple]]:
    """Convex trapezoid rings (CCW, unclosed, 3-4 distinct vertices)
    covering shell minus holes — the clip pieces used by clip_to_polygon.
    Trapezoids beat triangles there: interiors are disjoint, the only
    internal edges are the VERTICAL slab boundaries (no diagonals), so the
    dissolve pass after piecewise clipping has less to cancel."""
    quads: list[list[tuple]] = []
    for xa, xb, y0a, y0b, y1a, y1b in _slab_trapezoids(shell, holes):
        ring = [(xa, y0a), (xb, y0b), (xb, y1b), (xa, y1a)]
        ring = [p for i, p in enumerate(ring) if p != ring[(i + 1) % 4]]
        if len(ring) >= 3:
            quads.append(ring)
    return quads


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


# Bound the candidate-pair matrix: a chunk of G geometry segments against
# all P polygon edges must stay well under executor memory even for a
# ~2k-segment way x ~100k-edge country AOI (dense GxP bools would be
# ~200MB).  8M bools per chunk ~= 8MB.
_CROSS_CHUNK_CELLS = 8_000_000


def _segments_cross(ga, pa) -> bool:
    """Any geometry segment touching/crossing any polygon ring segment?

    Vectorized orientation tests over the bbox-overlapping pair subset —
    the batch equivalent of FastInPolygon's banded per-segment walk.
    The geometry-segment axis is chunked so the candidate matrix is
    bounded regardless of AOI edge count (no executor OOM on detailed
    ways x country-scale polygons).
    """
    gx1, gy1, gx2, gy2 = ga
    px1, py1, px2, py2 = pa
    n_p = len(px1)
    chunk = max(1, _CROSS_CHUNK_CELLS // max(1, n_p))
    for s in range(0, len(gx1), chunk):
        e = s + chunk
        if _segments_cross_block(
            (gx1[s:e], gy1[s:e], gx2[s:e], gy2[s:e]), (px1, py1, px2, py2)
        ):
            return True
    return False


def _segments_cross_block(ga, pa) -> bool:
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
    """Driver-side prepared clip polygon: convex trapezoid pieces +
    bboxes, built once per query and shipped in the UDF closure (the
    broadcast analog of constructing FastPolygonOperations once)."""

    def __init__(self, poly: Geometry):
        t = poly["type"]
        if t not in ("Polygon", "MultiPolygon"):
            raise ValueError(f"clip polygon must be (Multi)Polygon, got {t}")
        self.poly = poly
        self.bbox = bounds(poly)
        quads: list[list[tuple]] = []
        polys = poly["coordinates"] if t == "MultiPolygon" else [poly["coordinates"]]
        for rings in polys:
            if not rings:
                continue
            for q in trapezoids_polygon(rings[0], rings[1:]):
                a2 = _signed_area2([list(p) for p in q])
                # float-noise slivers (collinear in exact arithmetic) carry
                # no area and break the convex kernel — drop them
                scale = max(max(abs(x), abs(y)) for x, y in q) or 1.0
                if abs(a2) > 1e-12 * scale * scale:
                    quads.append(q)
        self.pieces = [
            {"type": "Polygon", "coordinates": [[list(p) for p in q] + [list(q[0])]]}
            for q in quads
        ]
        if quads:
            self.piece_bounds = np.asarray(
                [
                    (
                        min(p[0] for p in q),
                        min(p[1] for p in q),
                        max(p[0] for p in q),
                        max(p[1] for p in q),
                    )
                    for q in quads
                ],
                dtype=np.float64,
            )
        else:
            self.piece_bounds = np.zeros((0, 4))

    @property
    def ring_segments(self) -> tuple[np.ndarray, ...]:
        """Cached ring-edge arrays (computed once per prepared polygon, not
        per clipped row)."""
        if not hasattr(self, "_ring_segs"):
            self._ring_segs = _ring_segments(self.poly)
        return self._ring_segs

    def candidate_pieces(self, b: tuple[float, float, float, float]) -> list[int]:
        tb = self.piece_bounds
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
                # emit EXACT endpoints at interval boundaries (t==0 -> the
                # segment's own start vertex, t==1 -> its end vertex) so
                # vertex continuity across segments is bit-exact and a
                # connected polyline is not spuriously split at interior
                # vertices by the ~1 ulp drift of ax + 1.0*dx
                p0 = [ax, ay] if t0 == 0.0 else [ax + t0 * dx, ay + t0 * dy]
                p1 = [bx, by] if t1 == 1.0 else [ax + t1 * dx, ay + t1 * dy]
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


# ---------------------------------------------------------------------------
# dissolve: piece soup -> JTS-shaped rings
# ---------------------------------------------------------------------------

# vertex-identity quantization: 5e-10 deg (~0.05 µm on Earth) absorbs the
# ulp-level disagreement between intersection points computed against the
# two different endpoint representations of a shared slab-boundary line
_SNAP = 2e9


def _node_edges(edges, rep):
    """Split every edge at intermediate snapped vertices lying on it (within
    ~1 snap unit), so differently-partitioned collinear edges cancel exactly.
    Works in snapped integer space; O(E x V) vectorized, piece soups are
    small (one border geometry x AOI)."""
    from collections import Counter

    verts = np.asarray(list(rep.keys()), dtype=np.float64)
    out = Counter()
    for (a, b), c in edges.items():
        ax, ay = a
        bx, by = b
        dx, dy = float(bx - ax), float(by - ay)
        L2 = dx * dx + dy * dy
        vx = verts[:, 0] - ax
        vy = verts[:, 1] - ay
        cross = dx * vy - dy * vx
        dot = dx * vx + dy * vy
        # distance to line <= 2 snap units, strictly between endpoints
        on = (np.abs(cross) <= 2.0 * np.sqrt(L2)) & (dot > 0) & (dot < L2)
        if not on.any():
            out[(a, b)] += c
            continue
        mids = sorted(
            (
                (float(dot[i]), (int(verts[i, 0]), int(verts[i, 1])))
                for i in np.nonzero(on)[0]
            ),
        )
        chain = [a] + [k for _, k in mids if k != a and k != b] + [b]
        for p, q in zip(chain[:-1], chain[1:]):
            if p != q:
                out[(p, q)] += c
    return out


def dissolve_rings(pieces: list[list[list]]) -> list[list[list[list[float]]]]:
    """Merge a soup of piecewise-clipped polygons sharing internal edges
    into dissolved polygons (the ring shape JTS ``intersection`` emits).

    ``pieces``: list of [shell, hole...] closed float rings with pairwise
    disjoint interiors.  Internal edges appear exactly twice in opposite
    directions once ring orientation is normalized (shell CCW / hole CW)
    and collinear edges are co-noded — cancelling them leaves precisely
    the region boundary, which is then walked into simple rings with the
    canonical face-tracing rule (next edge clockwise from the incoming
    twin) and re-attached (hole -> smallest containing shell).  Collinear
    vertices introduced by the slab decomposition are removed; original
    subject/clip vertices are never collinear with them and survive.

    Returns list of polygons: [[shell, hole...], ...] — closed rings,
    shells CCW, holes CW.
    """
    import math
    from collections import Counter, defaultdict

    def key_of(p):
        return (round(p[0] * _SNAP), round(p[1] * _SNAP))

    rep: dict = {}
    edges: Counter = Counter()
    for rings in pieces:
        for ri, ring in enumerate(rings):
            pts = _dedupe_consecutive(_open_ring(ring))
            if len(pts) < 3:
                continue
            a2 = _signed_area2(pts)
            if a2 == 0:
                continue
            if (a2 > 0) != (ri == 0):  # shell CCW, holes CW
                pts = pts[::-1]
            keys = []
            for p in pts:
                k = key_of(p)
                rep.setdefault(k, [float(p[0]), float(p[1])])
                if not keys or k != keys[-1]:
                    keys.append(k)
            while len(keys) > 1 and keys[0] == keys[-1]:
                keys.pop()
            if len(keys) < 3:
                continue
            for i in range(len(keys)):
                edges[(keys[i], keys[(i + 1) % len(keys)])] += 1

    edges = _node_edges(edges, rep)

    net: Counter = Counter()
    for (a, b), c in edges.items():
        r = edges.get((b, a), 0)
        if c > r:
            net[(a, b)] = c - r

    outgoing: dict = defaultdict(list)
    for (a, b), c in net.items():
        for _ in range(c):
            outgoing[a].append(b)

    def pick_next(prev, v):
        outs = outgoing[v]
        if len(outs) == 1:
            return outs.pop()
        # face-tracing: next edge CLOCKWISE from the incoming twin — the
        # largest CCW angle from the reversed incoming direction keeps the
        # interior on the left and splits pinch-point contacts the way a
        # simple-polygon output requires
        back = math.atan2(prev[1] - v[1], prev[0] - v[0])
        best_i, best_d = 0, -1.0
        for i, w in enumerate(outs):
            ang = math.atan2(w[1] - v[1], w[0] - v[0])
            d = (ang - back) % (2 * math.pi)
            if d > best_d:
                best_i, best_d = i, d
        return outs.pop(best_i)

    raw_rings: list[list] = []
    for start in list(outgoing.keys()):
        while outgoing[start]:
            walk = [start, outgoing[start].pop()]
            while walk[-1] != start:
                walk.append(pick_next(walk[-2], walk[-1]))
                if len(walk) > 4 * len(rep) + 8:  # corrupt soup guard
                    break
            if walk[-1] == start and len(walk) >= 4:
                raw_rings.append(walk[:-1])

    shells: list[tuple] = []  # (area2, coords)
    holes: list[tuple] = []
    for keys in raw_rings:
        coords = [rep[k] for k in keys]
        coords = _strip_collinear(coords)
        if len(coords) < 3:
            continue
        a2 = _signed_area2(coords)
        if a2 == 0:
            continue
        closed = [list(p) for p in coords] + [list(coords[0])]
        (shells if a2 > 0 else holes).append((abs(a2), closed))

    shells.sort(key=lambda s: s[0])  # smallest first -> innermost match
    polys: list[list] = [[s[1]] for s in shells]
    for _, hole in holes:
        hx, hy = hole[0]
        placed = False
        for i, (_, shell) in enumerate(shells):
            if points_in_polygon(
                np.array([hx]), np.array([hy]),
                {"type": "Polygon", "coordinates": [shell]},
                include_boundary=True,
            )[0]:
                polys[i].append(hole)
                placed = True
                break
        if not placed and polys:
            polys[-1].append(hole)
    # emit largest shell first (stable, JTS-like ordering by area desc)
    return [p for p in reversed(polys)]


def _strip_collinear(coords: list[list[float]]) -> list[list[float]]:
    """Remove vertices collinear with their neighbors (the slab-boundary
    split points the decomposition introduced; |sin| <= 1e-9 bound)."""
    out = list(coords)
    changed = True
    while changed and len(out) >= 3:
        changed = False
        n = len(out)
        kept = []
        for i in range(n):
            a, b, c = out[i - 1], out[i], out[(i + 1) % n]
            abx, aby = b[0] - a[0], b[1] - a[1]
            bcx, bcy = c[0] - b[0], c[1] - b[1]
            cross = abx * bcy - aby * bcx
            la = math_hypot(abx, aby)
            lb = math_hypot(bcx, bcy)
            if la == 0 or (abs(cross) <= 1e-9 * la * lb and abx * bcx + aby * bcy >= 0):
                changed = True
                continue
            kept.append(b)
        out = kept
    return out


def math_hypot(x: float, y: float) -> float:
    import math

    return math.hypot(x, y)


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
        for ti in prepared.candidate_pieces(b):
            try:
                piece = clip_to_convex_polygon(geom, prepared.pieces[ti])
            except ValueError:
                continue  # degenerate (zero-area) trapezoid: measure zero
            if is_empty(piece):
                continue
            pc = piece["coordinates"]
            polys = pc if piece["type"] == "MultiPolygon" else [pc]
            for rings in polys:
                # drop degenerate slivers (zero planar area)
                if rings and abs(_signed_area2(_open_ring(rings[0]))) > 0:
                    pieces.append(rings)
        # dissolve the trapezoid-clipped piece soup into JTS-shaped rings
        # (shared internal edges cancel; Geo.java:509-515 delegates to JTS
        # intersection whose output is the dissolved region boundary)
        polys = dissolve_rings(pieces)
        if not polys:
            return {"type": t, "coordinates": []}
        if len(polys) == 1:
            return {"type": "Polygon", "coordinates": polys[0]}
        return {"type": "MultiPolygon", "coordinates": polys}
    raise ValueError(f"unknown geometry type {t}")
