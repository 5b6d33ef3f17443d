"""Unit tests for join-count statistics (tiling.join_count_stats),
the interval-overlap join (aggregations.interval_overlap_join), and the
transitive relation member closure (snapshot.relation_node_closure) —
each checked against an independent brute-force reference."""

from __future__ import annotations

import numpy as np

from oshdb_spark.operators.aggregations import interval_overlap_join
from oshdb_spark.operators.snapshot import relation_node_closure
from oshdb_spark.operators.tiling import join_count_stats

ZOOM = 7
CELL = 3_600_000_000 >> ZOOM


# ---------------------------------------------------------------------------
# join_count_stats
# ---------------------------------------------------------------------------


def _brute_join_counts(pts, thr):
    from collections import Counter

    occ = Counter(
        ((lon + 1_800_000_000) // CELL, (lat + 900_000_000) // CELL)
        for lon, lat in pts
    )
    cls = {c: n >= thr for c, n in occ.items()}
    want = {"BB": 0, "BW": 0, "WW": 0}
    cells = sorted(cls)
    for i, a in enumerate(cells):
        for b in cells[i + 1 :]:
            if abs(a[0] - b[0]) <= 1 and abs(a[1] - b[1]) <= 1:
                k = (
                    "BB"
                    if cls[a] and cls[b]
                    else "WW"
                    if not cls[a] and not cls[b]
                    else "BW"
                )
                want[k] += 1
    return want


def test_join_counts_match_bruteforce(spark):
    rs = np.random.RandomState(7)
    # stay inside the valid fixed-point domain (|lat| < 9e8): +/-30 cells
    pts = [
        (
            int(rs.randint(-30, 30)) * CELL + int(rs.randint(0, CELL)),
            int(rs.randint(-30, 30)) * CELL + int(rs.randint(0, CELL)),
        )
        for _ in range(500)
    ]
    df = spark.createDataFrame(pts, "lon_fp long, lat_fp long")
    got = {
        r.pair_class: r.n_pairs
        for r in join_count_stats(df, ZOOM, threshold=2).collect()
    }
    want = _brute_join_counts(pts, 2)
    assert got == want
    assert sum(want.values()) > 0  # fixture non-degenerate


def test_join_counts_zerofill_and_classes(spark):
    # two isolated cells, no adjacency: all three classes zerofill
    df = spark.createDataFrame(
        [(0, 0), (100 * CELL, 0)], "lon_fp long, lat_fp long"
    )
    got = {
        r.pair_class: r.n_pairs
        for r in join_count_stats(df, ZOOM, threshold=1).collect()
    }
    assert got == {"BB": 0, "BW": 0, "WW": 0}
    # two adjacent cells, one black (2 pts) one white (1 pt) -> BW = 1
    df2 = spark.createDataFrame(
        [(0, 0), (1, 0), (CELL, 0)], "lon_fp long, lat_fp long"
    )
    got2 = {
        r.pair_class: r.n_pairs
        for r in join_count_stats(df2, ZOOM, threshold=2).collect()
    }
    assert got2 == {"BB": 0, "BW": 1, "WW": 0}


# ---------------------------------------------------------------------------
# interval_overlap_join
# ---------------------------------------------------------------------------


def _iv_fixture(n, seed, span=1_000_000, max_len=900):
    rs = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        s = int(rs.randint(0, span))
        rows.append((i, int(i % 5), s, s + int(rs.randint(0, max_len))))
    return rows


def _brute_overlaps(rows, keyed):
    want = {}
    for i, (ai, ak, as_, ae) in enumerate(rows):
        for bi, bk, bs, be in rows[i + 1 :]:
            if keyed and ak != bk:
                continue
            if as_ <= be and bs <= ae:
                lo, hi = (ai, bi) if ai < bi else (bi, ai)
                want[(lo, hi)] = min(ae, be) - max(as_, bs)
    return want


def test_interval_overlap_matches_bruteforce(spark):
    rows = _iv_fixture(300, seed=11)
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, start_us long, end_us long"
    )
    got = {
        (r.a_id, r.b_id): r.overlap_us
        for r in interval_overlap_join(df, 1000, key_col="user_id").collect()
    }
    want = _brute_overlaps(rows, keyed=True)
    assert got == want
    assert want


def test_interval_overlap_unkeyed_and_bucket_invariance(spark):
    rows = _iv_fixture(120, seed=23)
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, start_us long, end_us long"
    )
    want = _brute_overlaps(rows, keyed=False)
    # correctness must hold for ANY bucket width, including ones much
    # smaller and much larger than the max interval length
    for bucket in (137, 900, 10_000, 10_000_000):
        got = {
            (r.a_id, r.b_id): r.overlap_us
            for r in interval_overlap_join(df, bucket).collect()
        }
        assert got == want, f"bucket={bucket}"


def test_interval_overlap_touching_and_disjoint(spark):
    rows = [
        (1, 0, 0, 100),
        (2, 0, 100, 200),  # touches 1 at t=100 -> overlap 0
        (3, 0, 201, 300),  # disjoint from 2
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, start_us long, end_us long"
    )
    got = {
        (r.a_id, r.b_id): r.overlap_us
        for r in interval_overlap_join(df, 50).collect()
    }
    assert got == {(1, 2): 0}


# ---------------------------------------------------------------------------
# relation_node_closure
# ---------------------------------------------------------------------------


def _ent(spark, ways, rels):
    """ways: {wid: [nrefs]}; rels: {rid: [(type, ref)]}."""
    rows = []
    for wid, refs in ways.items():
        rows.append(("way", wid, refs, None))
    for rid, members in rels.items():
        rows.append(
            ("relation", rid, None, [(t, r, "") for t, r in members])
        )
    return spark.createDataFrame(
        rows,
        "type string, id long, refs array<bigint>, "
        "members array<struct<type:string,ref:bigint,role:string>>",
    )


def test_closure_three_tiers(spark):
    ways = {1: [10, 11], 2: [11, 12], 3: [13]}
    rels = {
        100: [("way", 1), ("node", 99)],
        101: [("way", 2), ("way", 3)],
        200: [("relation", 100), ("relation", 101), ("node", 50)],
        300: [("relation", 200), ("way", 1)],
    }
    got = {}
    for r in relation_node_closure(_ent(spark, ways, rels)).collect():
        got.setdefault(r.rel_id, set()).add(r.node_ref)
    assert got == {
        100: {10, 11, 99},
        101: {11, 12, 13},
        200: {10, 11, 12, 13, 99, 50},
        300: {10, 11, 12, 13, 99, 50},
    }


def test_closure_missing_refs_drop(spark):
    ways = {1: [10]}
    rels = {
        100: [("way", 1), ("way", 777), ("relation", 888), ("node", 5)],
    }
    got = {}
    for r in relation_node_closure(_ent(spark, ways, rels)).collect():
        got.setdefault(r.rel_id, set()).add(r.node_ref)
    assert got == {100: {10, 5}}


def test_closure_cycle_partial_resolution(spark):
    # A <-> B cycle: both land on the guard level and inherit each
    # other's BASE (direct node/way) contributions — partial, no hang
    ways = {1: [10], 2: [20]}
    rels = {
        100: [("relation", 101), ("way", 1)],
        101: [("relation", 100), ("way", 2)],
    }
    got = {}
    for r in relation_node_closure(_ent(spark, ways, rels)).collect():
        got.setdefault(r.rel_id, set()).add(r.node_ref)
    assert got == {100: {10, 20}, 101: {10, 20}}


def test_closure_deep_chain(spark):
    # 6-deep pure-relation chain: top sees the single leaf node
    ways = {1: [42]}
    rels = {600: [("way", 1)]}
    for d in range(1, 6):
        rels[600 + d] = [("relation", 600 + d - 1)]
    got = {}
    for r in relation_node_closure(_ent(spark, ways, rels)).collect():
        got.setdefault(r.rel_id, set()).add(r.node_ref)
    assert got == {600 + d: {42} for d in range(6)}


# ---------------------------------------------------------------------------
# cell_dwell_time / simplify_track_dp
# ---------------------------------------------------------------------------

from oshdb_spark.operators.aggregations import (  # noqa: E402
    cell_dwell_time,
    simplify_track_dp,
)


def test_cell_dwell_matches_bruteforce(spark):
    rs = np.random.RandomState(31)
    rows = []
    for i in range(400):
        rows.append(
            (
                i,
                int(i % 6),
                int(rs.randint(0, 10_000_000)),
                int(rs.randint(-30, 30)) * CELL + int(rs.randint(0, CELL)),
                int(rs.randint(-30, 30)) * CELL + int(rs.randint(0, CELL)),
            )
        )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, lon_fp long, lat_fp long"
    )
    got = {
        (r.cx, r.cy): (r.dwell_us, r.n_intervals)
        for r in cell_dwell_time(df, ZOOM).collect()
    }
    want = {}
    for uid in {r[1] for r in rows}:
        track = sorted(
            (r for r in rows if r[1] == uid), key=lambda r: (r[2], r[0])
        )
        for a, b in zip(track, track[1:]):
            c = (
                (a[3] + 1_800_000_000) // CELL,
                (a[4] + 900_000_000) // CELL,
            )
            d, n = want.get(c, (0, 0))
            want[c] = (d + b[2] - a[2], n + 1)
    assert got == want
    assert want


def _dp_reference(pts, eps):
    """Independent recursive DP with exact Python-int arithmetic."""
    n = len(pts)
    if n <= 2:
        return list(range(n))
    keep = {0, n - 1}

    def rec(i, j):
        ax, ay = pts[i]
        bx, by = pts[j]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        best, bk = -1, -1
        for k in range(i + 1, j):
            px, py = pts[k][0] - ax, pts[k][1] - ay
            if seg2 == 0:
                m = px * px + py * py
                hit = m > eps * eps
            else:
                c = dx * py - dy * px
                m = c * c
                hit = m > eps * eps * seg2
            if hit and m > best:
                best, bk = m, k
        if bk >= 0:
            keep.add(bk)
            rec(i, bk)
            rec(bk, j)

    rec(0, n - 1)
    return sorted(keep)


def test_dp_matches_reference(spark):
    rs = np.random.RandomState(17)
    rows = []
    tracks = {}
    for uid in range(5):
        n = int(rs.randint(20, 80))
        xs = np.cumsum(rs.randint(-200_000, 200_000, n))
        ys = np.cumsum(rs.randint(-200_000, 200_000, n))
        tracks[uid] = [(int(x), int(y)) for x, y in zip(xs, ys)]
        for i, (x, y) in enumerate(tracks[uid]):
            rows.append((uid * 1000 + i, uid, i * 10, x, y))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, lon_fp long, lat_fp long"
    )
    eps = 150_000
    got = {}
    for r in simplify_track_dp(df, eps).collect():
        got.setdefault(r.user_id, []).append((r.ordinal, r.lon_fp, r.lat_fp))
    for uid, pts in tracks.items():
        keep = _dp_reference(pts, eps)
        want = [(k, pts[k][0], pts[k][1]) for k in keep]
        assert sorted(got[uid]) == want, f"user {uid}"


def test_dp_straight_line_collapses(spark):
    rows = [(i, 1, i, i * 1000, i * 2000) for i in range(50)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, lon_fp long, lat_fp long"
    )
    got = sorted(r.ordinal for r in simplify_track_dp(df, 10).collect())
    assert got == [0, 49]  # perfectly collinear: endpoints only


def test_dp_zero_eps_keeps_corners_only(spark):
    # a right angle with eps=0: the corner must survive
    rows = [
        (0, 1, 0, 0, 0),
        (1, 1, 1, 1000, 0),
        (2, 1, 2, 1000, 1000),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, lon_fp long, lat_fp long"
    )
    got = sorted(r.ordinal for r in simplify_track_dp(df, 0).collect())
    assert got == [0, 1, 2]


# ---------------------------------------------------------------------------
# spacetime_k_counts / raster_focal_sum
# ---------------------------------------------------------------------------

from oshdb_spark.operators.knn import spacetime_k_counts  # noqa: E402
from oshdb_spark.operators.zonal import raster_focal_sum  # noqa: E402


def test_spacetime_k_matches_bruteforce(spark):
    rs = np.random.RandomState(5)
    base = rs.randint(-100, 100, (5, 2)) * 10_000_000
    pts = []
    for i in range(150):
        bx, by = base[i % 5]
        pts.append(
            (
                i,
                int(bx + rs.randint(-12_000_000, 12_000_000)),
                int(by + rs.randint(-12_000_000, 12_000_000)),
                int(rs.randint(0, 1_000_000)),
            )
        )
    df = spark.createDataFrame(
        pts, "event_id long, lon_fp long, lat_fp long, ts_us long"
    )
    radii = [3_000_000, 9_000_000, 20_000_000]
    taus = [100_000, 400_000, 900_000]
    got = {
        (r.r_fp, r.tau_us): r.n_pairs
        for r in spacetime_k_counts(df, radii, taus, zoom=7).collect()
    }
    want = {(r, t): 0 for r in radii for t in taus}
    for i, (ai, ax, ay, at) in enumerate(pts):
        for bi, bx, by, bt in pts[i + 1 :]:
            d2 = (ax - bx) ** 2 + (ay - by) ** 2
            dt = abs(at - bt)
            for r in radii:
                for t in taus:
                    if d2 <= r * r and dt <= t:
                        want[(r, t)] += 1
    assert got == want
    # monotone in both axes, non-degenerate at the corner
    assert want[(radii[-1], taus[-1])] > 0
    for r in radii:
        assert want[(r, taus[0])] <= want[(r, taus[-1])]
    for t in taus:
        assert want[(radii[0], t)] <= want[(radii[-1], t)]


def test_raster_focal_sum_matches_bruteforce(spark):
    zoom = 6
    nx = 1 << zoom
    rs = np.random.RandomState(29)
    cells = {}
    for _ in range(300):
        x, y = int(rs.randint(0, nx)), int(rs.randint(0, nx // 2))
        cells[y * nx + x] = cells.get(y * nx + x, 0) + int(rs.randint(1, 9))
    df = spark.createDataFrame(
        list(cells.items()), "cell_id long, cnt long"
    )
    got = {
        r.cell_id: (r.value, r.focal_sum, r.n_cells)
        for r in raster_focal_sum(df, zoom).collect()
    }
    want = {}
    for cid, v in cells.items():
        x, y = cid % nx, cid // nx
        s = n = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (y + dy) * nx + (x + dx + nx) % nx
                if (y + dy) >= 0 and nb in cells:
                    s += cells[nb]
                    n += 1
        want[cid] = (v, s, n)
    assert got == want


def test_raster_focal_antimeridian_wrap(spark):
    zoom = 4
    nx = 1 << zoom
    # two cells on the same row at x=0 and x=nx-1: neighbors via wrap
    df = spark.createDataFrame(
        [(3 * nx + 0, 5), (3 * nx + (nx - 1), 7)], "cell_id long, cnt long"
    )
    got = {
        r.cell_id: (r.focal_sum, r.n_cells)
        for r in raster_focal_sum(df, zoom).collect()
    }
    assert got == {3 * nx: (12, 2), 3 * nx + nx - 1: (12, 2)}
    # with wrap disabled they are isolated
    got2 = {
        r.cell_id: (r.focal_sum, r.n_cells)
        for r in raster_focal_sum(df, zoom, wrap_lon=False).collect()
    }
    assert got2 == {3 * nx: (5, 1), 3 * nx + nx - 1: (7, 1)}


# ---------------------------------------------------------------------------
# track_convex_hull
# ---------------------------------------------------------------------------

from oshdb_spark.operators.aggregations import track_convex_hull  # noqa: E402


def _hull_edges_reference(pts):
    """Independent O(n^3) reference: directed edge (a,b) is on the CCW
    strict hull iff every other distinct point is strictly left."""
    pts = sorted(set(pts))
    edges = []
    for a in pts:
        for b in pts:
            if a == b:
                continue
            ok = True
            for c in pts:
                if c == a or c == b:
                    continue
                cr = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (
                    c[0] - a[0]
                )
                if cr <= 0:
                    ok = False
                    break
            if ok:
                edges.append((a, b))
    return edges


def test_hull_matches_edge_characterization(spark):
    rs = np.random.RandomState(43)
    rows = []
    tracks = {}
    for uid in range(6):
        n = int(rs.randint(10, 60))
        pts = [
            (
                int(rs.randint(-1_000_000, 1_000_000)),
                int(rs.randint(-1_000_000, 1_000_000)),
            )
            for _ in range(n)
        ]
        tracks[uid] = pts
        rows += [(uid, x, y) for x, y in pts]
    df = spark.createDataFrame(rows, "user_id long, lon_fp long, lat_fp long")
    got = {}
    for r in track_convex_hull(df).collect():
        got.setdefault(r.user_id, []).append(
            (r.ordinal, r.lon_fp, r.lat_fp, r.n_vertices, int(r.area2))
        )
    for uid, pts in tracks.items():
        edges = _hull_edges_reference(pts)
        want_n = len(edges)
        want_area2 = sum(
            a[0] * b[1] - b[0] * a[1] for a, b in edges
        )
        rows_u = sorted(got[uid])
        assert len(rows_u) == want_n, f"user {uid}"
        assert all(r[3] == want_n and r[4] == want_area2 for r in rows_u)
        # vertex set matches the edge endpoints; cycle starts at min
        verts = [(r[1], r[2]) for r in rows_u]
        assert set(verts) == {e[0] for e in edges}
        assert rows_u[0][0] == 0 and (rows_u[0][1], rows_u[0][2]) == min(
            verts
        )
        # consecutive ordinals trace actual hull edges
        ring = [(r[1], r[2]) for r in sorted(rows_u)]
        edge_set = set(edges)
        for a, b in zip(ring, ring[1:] + ring[:1]):
            assert (a, b) in edge_set


def test_hull_degenerate_keys_dropped(spark):
    rows = (
        [(1, i * 10, i * 20) for i in range(8)]  # collinear: no 2-D hull
        + [(2, 0, 0), (2, 5, 5)]  # two points
        + [(3, 7, 7)] * 4  # one distinct point
        + [(4, 0, 0), (4, 10, 0), (4, 0, 10), (4, 2, 2)]  # real hull
    )
    df = spark.createDataFrame(rows, "user_id long, lon_fp long, lat_fp long")
    got = {}
    for r in track_convex_hull(df).collect():
        got.setdefault(r.user_id, []).append((r.lon_fp, r.lat_fp, int(r.area2)))
    assert set(got) == {4}
    assert sorted(got[4]) == [(0, 0, 100), (0, 10, 100), (10, 0, 100)]


def test_hull_collinear_boundary_point_dropped(spark):
    # (5,0) lies ON the hull edge (0,0)-(10,0): strict hull excludes it
    rows = [(1, 0, 0), (1, 10, 0), (1, 5, 0), (1, 5, 8)]
    df = spark.createDataFrame(rows, "user_id long, lon_fp long, lat_fp long")
    got = sorted(
        (r.lon_fp, r.lat_fp) for r in track_convex_hull(df).collect()
    )
    assert got == [(0, 0), (5, 8), (10, 0)]


# ---------------------------------------------------------------------------
# segment_cell_cover
# ---------------------------------------------------------------------------

from oshdb_spark.operators.tiling import segment_cell_cover  # noqa: E402


def _seg_box_intersects(ax, ay, bx, by, X0, Y0, X1, Y1):
    """Independent exact reference: Liang-Barsky clip with Fractions
    against the CLOSED box."""
    from fractions import Fraction

    dx, dy = bx - ax, by - ay
    t0, t1 = Fraction(0), Fraction(1)
    for p, q in (
        (-dx, ax - X0),
        (dx, X1 - ax),
        (-dy, ay - Y0),
        (dy, Y1 - ay),
    ):
        if p == 0:
            if q < 0:
                return False
        else:
            t = Fraction(q, p)
            if p < 0:
                if t > t1:
                    return False
                t0 = max(t0, t)
            else:
                if t < t0:
                    return False
                t1 = min(t1, t)
    return t0 <= t1


def test_segment_cell_cover_matches_liang_barsky(spark):
    rs = np.random.RandomState(47)
    zoom = 9
    w = 3_600_000_000 >> zoom
    segs = []
    for i in range(120):
        x1 = int(rs.randint(-40, 40)) * w + int(rs.randint(0, w))
        y1 = int(rs.randint(-20, 20)) * w + int(rs.randint(0, w))
        # mix of short steps, long diagonals, axis-aligned, degenerate
        if i % 10 == 0:
            x2, y2 = x1, y1  # degenerate point
        elif i % 10 == 1:
            x2, y2 = x1 + int(rs.randint(1, 5)) * w, y1  # horizontal
        elif i % 10 == 2:
            x2, y2 = x1, y1 + int(rs.randint(1, 5)) * w  # vertical
        else:
            x2 = x1 + int(rs.randint(-4 * w, 4 * w))
            y2 = y1 + int(rs.randint(-4 * w, 4 * w))
        segs.append((i, x1, y1, x2, y2))
    df = spark.createDataFrame(
        segs, "seg_id long, x1 long, y1 long, x2 long, y2 long"
    )
    got = {
        (r.seg_id, r.cx, r.cy)
        for r in segment_cell_cover(df, zoom).collect()
    }
    want = set()
    for sid, x1, y1, x2, y2 in segs:
        ax, ay = x1 + 1_800_000_000, y1 + 900_000_000
        bx, by = x2 + 1_800_000_000, y2 + 900_000_000
        for cx in range(min(ax, bx) // w, max(ax, bx) // w + 1):
            for cy in range(min(ay, by) // w, max(ay, by) // w + 1):
                if _seg_box_intersects(
                    ax, ay, bx, by, cx * w, cy * w, (cx + 1) * w, (cy + 1) * w
                ):
                    want.add((sid, cx, cy))
    assert got == want
    assert len(want) > 200  # non-degenerate fixture


def test_segment_cell_cover_diagonal_tighter_than_bbox(spark):
    # a long diagonal across a 6x6 cell bbox touches far fewer than 36
    zoom = 9
    w = 3_600_000_000 >> zoom
    df = spark.createDataFrame(
        [(1, 0, 0, 6 * w - 1, 6 * w - 1)],
        "seg_id long, x1 long, y1 long, x2 long, y2 long",
    )
    rows = segment_cell_cover(df, zoom).collect()
    # exact diagonal: passes through 6 cells + touches 5 corner pairs
    n = len(rows)
    assert 6 <= n <= 16 and n < 36


def test_interval_overlap_huge_timestamps_exact(spark):
    # 2^60-scale epochs with a tiny bucket: double-division bucketing
    # would mis-bucket boundary rows; integer DIV must stay exact
    base = 1 << 60
    rows = [
        (1, 0, base, base + 10),
        (2, 0, base + 10, base + 20),   # touches 1
        (3, 0, base + 21, base + 30),   # disjoint from 2
        (4, 0, base - 7, base + 3),     # overlaps 1 by 3
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, start_us long, end_us long"
    )
    got = {
        (r.a_id, r.b_id): r.overlap_us
        for r in interval_overlap_join(df, 7).collect()
    }
    assert got == {(1, 2): 0, (1, 4): 3}


def test_guards_on_degenerate_parameters(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, 2)], "cell_id long, cnt long")
    with _pytest.raises(ValueError, match="zoom >= 2"):
        raster_focal_sum(df, 1)
    iv = spark.createDataFrame(
        [(1, 0, 0, 5)], "event_id long, user_id long, start_us long, end_us long"
    )
    with _pytest.raises(ValueError, match="positive"):
        interval_overlap_join(iv, 0)
