"""Unit tests for the spatial-statistics layer: IDW surface generation
(zonal.idw_grid_interpolation) and global Moran's I components
(tiling.moran_i_global), each checked against an independent numpy
brute-force reference on small random fixtures."""

from __future__ import annotations

import numpy as np
import pytest

from oshdb_spark.operators.tiling import moran_i_global
from oshdb_spark.operators.zonal import idw_grid_interpolation

ZOOM = 7
CELL = 3_600_000_000 >> ZOOM
HALF = CELL // 2


def _pts(n, seed):
    rs = np.random.RandomState(seed)
    lon = rs.randint(-1_700_000, 1_700_000, n) * 1000
    lat = rs.randint(-800_000, 800_000, n) * 1000
    val = rs.randint(0, 100, n)
    return [(int(a), int(b), int(v)) for a, b, v in zip(lon, lat, val)]


def _brute_idw(pts):
    """All-pairs reference: for every occupied cell center, IDW over the
    points in its 3x3 ring (excluding exact-center hits)."""
    occ = sorted({((p[0] + 1_800_000_000) // CELL, (p[1] + 900_000_000) // CELL) for p in pts})
    out = {}
    for cx, cy in occ:
        clon = cx * CELL + HALF - 1_800_000_000
        clat = cy * CELL + HALF - 900_000_000
        n = 0
        wsum = 0.0
        wv = 0.0
        for lon, lat, val in pts:
            px = (lon + 1_800_000_000) // CELL
            py = (lat + 900_000_000) // CELL
            if abs(px - cx) > 1 or abs(py - cy) > 1:
                continue
            d2 = float((lon - clon) ** 2 + (lat - clat) ** 2)
            if d2 == 0:
                continue
            w = 1e12 / d2
            n += 1
            wsum += round(w, 9)
            wv += round(w * val, 9)
        out[(cx, cy)] = (n, wsum, wv)
    return out


def test_idw_matches_bruteforce(spark):
    pts = _pts(400, seed=11)
    df = spark.createDataFrame(pts, "lon_fp long, lat_fp long, val long")
    got = {
        (r.cx, r.cy): (r.n_pts, float(r.w_sum), float(r.wv_sum))
        for r in idw_grid_interpolation(df, ZOOM).collect()
    }
    want = _brute_idw(pts)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-6)
        assert got[k][2] == pytest.approx(want[k][2], abs=1e-6)


def test_idw_rejects_small_zoom(spark):
    df = spark.createDataFrame([(0, 0, 1)], "lon_fp long, lat_fp long, val long")
    with pytest.raises(ValueError):
        idw_grid_interpolation(df, 6)


def test_idw_center_singularity_excluded(spark):
    # one point exactly on its own cell center: contributes to its 8
    # neighbor cells but is excluded from its own cell's neighborhood,
    # leaving that occupied cell with zero contributors -> no output row.
    lon = 0 * CELL + HALF - 1_800_000_000
    lat = 0 * CELL + HALF - 900_000_000
    df = spark.createDataFrame(
        [(lon, lat, 5)], "lon_fp long, lat_fp long, val long"
    )
    assert idw_grid_interpolation(df, ZOOM).count() == 0


def _brute_moran(pts, zoom):
    cell = 3_600_000_000 >> zoom
    from collections import Counter

    counts = Counter(
        ((p[0] + 1_800_000_000) // cell, (p[1] + 900_000_000) // cell) for p in pts
    )
    keys = sorted(counts)
    nn = len(keys)
    xs = np.array([counts[k] for k in keys], dtype=float)
    m = xs.sum() / nn
    w_conn = 0
    cross = 0.0
    for i, (cx, cy) in enumerate(keys):
        s_i = 0
        n_i = 0
        for j, (ox, oy) in enumerate(keys):
            if i == j or abs(ox - cx) > 1 or abs(oy - cy) > 1:
                continue
            s_i += counts[(ox, oy)]
            n_i += 1
        if n_i == 0:
            continue
        w_conn += n_i
        cross += round((xs[i] - m) * (s_i - n_i * m), 9)
    ssq = round(float((xs * xs).sum()) - float(xs.sum()) ** 2 / nn, 9)
    return nn, w_conn, cross, ssq


def test_moran_matches_bruteforce(spark):
    pts = _pts(300, seed=23)
    df = spark.createDataFrame(pts, "lon_fp long, lat_fp long, val long")
    row = moran_i_global(df, 6).collect()
    assert len(row) == 1
    r = row[0]
    nn, w_conn, cross, ssq = _brute_moran(pts, 6)
    assert r.nn == nn
    assert r.w_conn == w_conn
    assert float(r.cross_sum) == pytest.approx(cross, abs=1e-6)
    assert float(r.ssq) == pytest.approx(ssq, abs=1e-6)


def test_moran_clustered_is_positive(spark):
    # strongly clustered counts -> positive autocorrelation: I > 0,
    # i.e. cross_sum > 0 (all components share sign denominators).
    rs = np.random.RandomState(7)
    cell = 3_600_000_000 >> 6
    pts = []
    for blk in range(4):
        bx = (10 + blk * 20) * cell - 1_800_000_000
        by = (10 + blk * 10) * cell - 900_000_000
        dense = 200 if blk < 2 else 5
        for _ in range(dense):
            pts.append(
                (
                    int(bx + rs.randint(0, 2 * cell)),
                    int(by + rs.randint(0, 2 * cell)),
                    1,
                )
            )
    df = spark.createDataFrame(pts, "lon_fp long, lat_fp long, val long")
    r = moran_i_global(df, 6).collect()[0]
    assert float(r.cross_sum) > 0
    assert float(r.ssq) > 0


# ---------------------------------------------------------------------------
# bearing histogram (Geo.bearingOf)
# ---------------------------------------------------------------------------

def _brute_bearing_hist(segs, zoom, n_bins=16):
    import math
    from collections import Counter

    cell = 3_600_000_000 >> zoom
    tr = math.pi / 180.0 / 1e7
    out = Counter()
    for ax, ay, bx, by in segs:
        cx = ((ax + bx + 3_600_000_000) // 2) // cell
        cy = ((ay + by + 1_800_000_000) // 2) // cell
        x1, y1, x2, y2 = ax * tr, ay * tr, bx * tr, by * tr
        yy = math.sin(x2 - x1) * math.cos(y2)
        xx = math.cos(y1) * math.sin(y2) - math.sin(y1) * math.cos(y2) * math.cos(
            x2 - x1
        )
        b = math.fmod(math.atan2(yy, xx) + 2 * math.pi, 2 * math.pi)
        out[(cx, cy, int(b // (2 * math.pi / n_bins)))] += 1
    return dict(out)


def test_bearing_histogram_matches_bruteforce(spark):
    from oshdb_spark.operators.aggregations import bearing_histogram

    rs = np.random.RandomState(5)
    segs = []
    for _ in range(500):
        ax = int(rs.randint(-1_700_000, 1_700_000)) * 1000
        ay = int(rs.randint(-800_000, 800_000)) * 1000
        segs.append(
            (
                ax,
                ay,
                ax + int(rs.randint(-400, 400)) * 1000,
                ay + int(rs.randint(-400, 400)) * 1000,
            )
        )
    # axis-aligned + degenerate exact cases: due north/south/east/west, zero
    segs += [
        (0, 0, 0, 1_000_000),       # due north: bearing exactly 0 (bin 0)
        (0, 1_000_000, 0, 0),       # due south: bearing exactly pi (bin 8)
        (0, 0, 1_000_000, 0),       # due east
        (1_000_000, 0, 0, 0),       # due west
        (5_000, 5_000, 5_000, 5_000),  # zero-length: atan2(0,0)=0 (bin 0)
    ]
    df = spark.createDataFrame(segs, "ax long, ay long, bx long, by long")
    got = {
        (r.cx, r.cy, r.bin): r.n_segments
        for r in bearing_histogram(df, 6).collect()
    }
    assert got == _brute_bearing_hist(segs, 6)


def test_bearing_exact_cardinals(spark):
    from oshdb_spark.operators.aggregations import bearing_histogram

    df = spark.createDataFrame(
        [(0, 0, 0, 1_000_000), (0, 1_000_000, 0, 0)],
        "ax long, ay long, bx long, by long",
    )
    rows = {r.bin: r.n_segments for r in bearing_histogram(df, 6).collect()}
    assert rows == {0: 1, 8: 1}


# ---------------------------------------------------------------------------
# skew profile + track resampling
# ---------------------------------------------------------------------------

def test_skew_profile_plan_and_values(spark):
    from oshdb_spark.plans.skew import skew_profile

    rows = [("hot",)] * 90 + [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2
    df = spark.createDataFrame(rows, "k string")
    prof = {r.k: r for r in skew_profile(
        df, ["k"], target_rows_per_task=10, max_salts=4, hot_multiplier=2
    ).collect()}
    # hot: 90 rows, 4 keys, total 100 -> 90*4 > 2*100 True; salt ceil(90/10)=9 -> cap 4
    assert prof["hot"].n_rows == 90 and prof["hot"].is_hot
    assert prof["hot"].salt_factor == 4
    assert not prof["a"].is_hot and prof["a"].salt_factor == 1
    assert prof["b"].salt_factor == 1 and prof["c"].salt_factor == 1


def test_resample_track_exact_interpolation(spark):
    from oshdb_spark.operators.aggregations import resample_track

    rows = [
        (1, 100, 1, 0, 0),
        (1, 200, 2, 4_000_000, 8_000_000),
        (1, 300, 3, 8_000_000, 0),
        (2, 100, 4, -1_000_000, -2_000_000),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_us long, event_id long, lon_fp long, lat_fp long"
    )
    got = {
        (r.user_id, r.seg, r.k): (r.rlon, r.rlat)
        for r in resample_track(df, 4).collect()
    }
    # user 1 has 2 steps x 3 subdivisions; user 2 has no step
    assert len(got) == 6
    assert got[(1, 1, 1)] == (1_000_000.0, 2_000_000.0)
    assert got[(1, 1, 2)] == (2_000_000.0, 4_000_000.0)
    assert got[(1, 1, 3)] == (3_000_000.0, 6_000_000.0)
    assert got[(1, 2, 2)] == (6_000_000.0, 4_000_000.0)


def test_resample_track_rejects_non_power_of_two(spark):
    from oshdb_spark.operators.aggregations import resample_track

    df = spark.createDataFrame(
        [(1, 1, 1, 0, 0)],
        "user_id long, ts_us long, event_id long, lon_fp long, lat_fp long",
    )
    with pytest.raises(ValueError):
        resample_track(df, 3)


# ---------------------------------------------------------------------------
# Mann-Kendall per-cell trend
# ---------------------------------------------------------------------------

def _brute_mk(series):
    n = len(series)
    s = sum(
        (series[j] > series[i]) - (series[j] < series[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = sum(t * (t - 1) * (2 * t + 5) for t in Counter(series).values())
    return s, n * (n - 1) * (2 * n + 5) - ties


def test_mann_kendall_matches_bruteforce(spark):
    from oshdb_spark.operators.tiling import mann_kendall_cells

    cell = 3_600_000_000 >> 6
    # cell A: rising counts 1,2,3,4 in periods 0..3 (4..7 zero)
    # cell B: flat 2,2 in periods 1,2 (others zero)
    rows = []
    for p, cnt in enumerate([1, 2, 3, 4]):
        for _ in range(cnt):
            rows.append((10 * cell + 5, 20 * cell + 5, 1000 + p * 100))
    for p in (1, 2):
        for _ in range(2):
            rows.append((50 * cell + 5, 60 * cell + 5, 1000 + p * 100))
    df = spark.createDataFrame(rows, "lon_fp long, lat_fp long, ts_us long")
    got = {
        (r.cx, r.cy): (r.s_stat, r.var18)
        for r in mann_kendall_cells(
            df.selectExpr(
                "lon_fp - 1800000000 AS lon_fp",
                "lat_fp - 900000000 AS lat_fp",
                "ts_us",
            ),
            6, t0_us=1000, period_us=100, n_periods=8,
        ).collect()
    }
    assert got[(10, 20)] == _brute_mk([1, 2, 3, 4, 0, 0, 0, 0])
    assert got[(50, 60)] == _brute_mk([0, 2, 2, 0, 0, 0, 0, 0])
    # the spike-then-quiet series declines overall: 6 rising pairs inside
    # the spike, 16 falling pairs against the trailing zeros -> S = -10
    assert got[(10, 20)][0] == -10


# ---------------------------------------------------------------------------
# kde_density_surface
# ---------------------------------------------------------------------------

from oshdb_spark.operators.zonal import kde_density_surface  # noqa: E402


def _brute_kde(pts, h, ring=1):
    h2 = h * h
    occ = sorted(
        {((p[0] + 1_800_000_000) // CELL, (p[1] + 900_000_000) // CELL) for p in pts}
    )
    out = {}
    for cx, cy in occ:
        clon = cx * CELL + HALF - 1_800_000_000
        clat = cy * CELL + HALF - 900_000_000
        n = 0
        s = 0
        for lon, lat, _v in pts:
            px = (lon + 1_800_000_000) // CELL
            py = (lat + 900_000_000) // CELL
            if px == cx and py == cy:
                n += 1
            if abs(px - cx) <= ring and abs(py - cy) <= ring:
                d2 = (lon - clon) ** 2 + (lat - clat) ** 2
                s += max(h2 - d2, 0)
        out[(cx, cy)] = (n, s)
    return out


@pytest.mark.parametrize("seed", [13, 37])
def test_kde_matches_bruteforce(spark, seed):
    pts = _pts(60, seed)
    df = spark.createDataFrame(pts, "lon_fp long, lat_fp long, val long")
    h = 3 * CELL // 2
    got = {
        (r.cx, r.cy): (r.n_pts, int(r.kde_h2))
        for r in kde_density_surface(df, ZOOM, h).collect()
    }
    want = _brute_kde(pts, h)
    assert got == want
    # sanity: at this bandwidth every occupied cell sees its own points
    assert all(v[1] > 0 for v in got.values())


def test_kde_support_never_clipped_by_ring():
    # the ring bound: centers outside the ring are >= h away, so a
    # larger ring must not change the surface
    import math

    for zoom in (7, 9, 12):
        cell = 3_600_000_000 >> zoom
        for mult in (0.5, 1.0, 1.5, 2.0, 3.7):
            h = int(cell * mult)
            ring = max(1, math.ceil((2 * h - cell) / (2 * cell)))
            # min distance from any in-cell point to an excluded center
            min_excl = (ring + 1 - 0.5) * cell
            assert min_excl >= h, (zoom, mult)


# ---------------------------------------------------------------------------
# ripley_k_counts / knox_spacetime_pairs / local_moran_lisa
# ---------------------------------------------------------------------------

from oshdb_spark.operators.knn import (  # noqa: E402
    knox_spacetime_pairs,
    ripley_k_counts,
)
from oshdb_spark.operators.tiling import local_moran_lisa  # noqa: E402


def test_ripley_matches_bruteforce(spark):
    # clustered points so small radii see pairs
    rs = np.random.RandomState(5)
    base = rs.randint(-150, 150, (8, 2)) * 10_000_000
    pts = []
    i = 0
    for bx, by in base:
        for _ in range(12):
            pts.append(
                (
                    i,
                    int(bx + rs.randint(-12_000_000, 12_000_000)),
                    int(by + rs.randint(-12_000_000, 12_000_000)),
                )
            )
            i += 1
    df = spark.createDataFrame(pts, "event_id long, lon_fp long, lat_fp long")
    radii = [2_500_000, 5_000_000, 10_000_000, 20_000_000]
    got = {
        r.r_fp: r.n_pairs
        for r in ripley_k_counts(df, radii, zoom=7).collect()
    }
    want = {r: 0 for r in radii}
    for a in range(len(pts)):
        for b in range(a + 1, len(pts)):
            d2 = (pts[a][1] - pts[b][1]) ** 2 + (pts[a][2] - pts[b][2]) ** 2
            for r in radii:
                if d2 <= r * r:
                    want[r] += 1
    assert got == want
    # monotone in r, and the ladder is non-degenerate on this fixture
    ordered = [got[r] for r in radii]
    assert ordered == sorted(ordered) and ordered[-1] > 0


def test_ripley_zero_pairs_reports_zeros(spark):
    df = spark.createDataFrame(
        [(1, -1_000_000_000, 0), (2, 1_000_000_000, 0)],
        "event_id long, lon_fp long, lat_fp long",
    )
    got = {r.r_fp: r.n_pairs for r in ripley_k_counts(df, [1000, 2000]).collect()}
    assert got == {1000: 0, 2000: 0}


def test_knox_matches_bruteforce(spark):
    rs = np.random.RandomState(17)
    pts = [
        (
            i,
            int(rs.randint(-40, 40) * 10_000_000 + rs.randint(-9_000_000, 9_000_000)),
            int(rs.randint(-40, 40) * 10_000_000 + rs.randint(-9_000_000, 9_000_000)),
            int(rs.randint(0, 10_000)) * 1_000_000,
        )
        for i in range(150)
    ]
    df = spark.createDataFrame(
        pts, "event_id long, lon_fp long, lat_fp long, ts_us long"
    )
    r, tau = 15_000_000, 3_000_000_000
    got = {
        (p.a_id, p.b_id): (p.d2, p.dt_us)
        for p in knox_spacetime_pairs(df, r, tau, zoom=7).collect()
    }
    want = {}
    for a in range(len(pts)):
        for b in range(a + 1, len(pts)):
            d2 = (pts[a][1] - pts[b][1]) ** 2 + (pts[a][2] - pts[b][2]) ** 2
            dt = abs(pts[a][3] - pts[b][3])
            if d2 <= r * r and dt <= tau:
                want[(a, b)] = (d2, dt)
    assert got == want
    assert want  # fixture actually exercises the band


def test_lisa_rows_sum_to_global_cross_sum(spark):
    pts = _pts(500, seed=23)
    df = spark.createDataFrame(pts, "lon_fp long, lat_fp long, val long")
    lisa = local_moran_lisa(df, ZOOM).collect()
    glob = moran_i_global(df, ZOOM).collect()[0]
    from decimal import Decimal

    assert sum(r.lisa_num for r in lisa) == Decimal(glob.cross_sum)
    assert len(lisa) > 0
    assert all(r.n_i >= 1 for r in lisa)


def test_lisa_matches_bruteforce(spark):
    pts = _pts(300, seed=29)
    df = spark.createDataFrame(pts, "lon_fp long, lat_fp long, val long")
    got = {
        (r.cx, r.cy): (r.x, r.s_i, r.n_i, float(r.lisa_num))
        for r in local_moran_lisa(df, ZOOM).collect()
    }
    from collections import Counter

    counts = Counter(
        ((p[0] + 1_800_000_000) // CELL, (p[1] + 900_000_000) // CELL)
        for p in pts
    )
    m = sum(counts.values()) / len(counts)
    want = {}
    for (cx, cy), x in counts.items():
        s_i = n_i = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                if (cx + dx, cy + dy) in counts:
                    s_i += counts[(cx + dx, cy + dy)]
                    n_i += 1
        if n_i == 0:
            continue  # isolated cells drop (documented)
        want[(cx, cy)] = (x, s_i, n_i, round((x - m) * (s_i - n_i * m), 9))
    assert got == want


# ---------------------------------------------------------------------------
# cross_dwithin_join / cross_k_counts / radius_of_gyration / cell_user_simpson
# ---------------------------------------------------------------------------

from oshdb_spark.operators.aggregations import radius_of_gyration  # noqa: E402
from oshdb_spark.operators.knn import (  # noqa: E402
    cross_dwithin_join,
    cross_k_counts,
)
from oshdb_spark.operators.tiling import cell_user_simpson  # noqa: E402


def _two_class_pts(n, seed):
    rs = np.random.RandomState(seed)
    base = rs.randint(-120, 120, (6, 2)) * 10_000_000
    pts = []
    for i in range(n):
        bx, by = base[i % len(base)]
        pts.append(
            (
                i,
                int(bx + rs.randint(-15_000_000, 15_000_000)),
                int(by + rs.randint(-15_000_000, 15_000_000)),
                bool(rs.randint(0, 2)),  # class independent of cluster
            )
        )
    return pts


def test_cross_dwithin_matches_bruteforce(spark):
    pts = _two_class_pts(120, seed=3)
    a = [(p[0], p[1], p[2]) for p in pts if p[3]]
    b = [(p[0], p[1], p[2]) for p in pts if not p[3]]
    schema = "event_id long, lon_fp long, lat_fp long"
    r = 9_000_000
    got = {
        (p.a_id, p.b_id): p.d2
        for p in cross_dwithin_join(
            spark.createDataFrame(a, schema),
            spark.createDataFrame(b, schema),
            r,
            zoom=7,
        ).collect()
    }
    want = {}
    for ai, ax, ay in a:
        for bi, bx, by in b:
            d2 = (ax - bx) ** 2 + (ay - by) ** 2
            if d2 <= r * r:
                want[(ai, bi)] = d2
    assert got == want
    assert want  # fixture non-degenerate


def test_cross_k_matches_bruteforce(spark):
    pts = _two_class_pts(150, seed=9)
    df = spark.createDataFrame(
        pts, "event_id long, lon_fp long, lat_fp long, is_a boolean"
    )
    radii = [2_000_000, 6_000_000, 12_000_000, 24_000_000]
    got = {
        row.r_fp: row.n_pairs
        for row in cross_k_counts(df, "is_a", radii, zoom=7).collect()
    }
    want = {r: 0 for r in radii}
    for i, ax, ay, ca in pts:
        if not ca:
            continue
        for j, bx, by, cb in pts:
            if cb:
                continue
            d2 = (ax - bx) ** 2 + (ay - by) ** 2
            for r in radii:
                if d2 <= r * r:
                    want[r] += 1
    assert got == want
    ordered = [got[r] for r in radii]
    assert ordered == sorted(ordered) and ordered[-1] > 0


def test_cross_k_zero_pairs_zerofills(spark):
    df = spark.createDataFrame(
        [(1, -1_000_000_000, 0, True), (2, 1_000_000_000, 0, False)],
        "event_id long, lon_fp long, lat_fp long, is_a boolean",
    )
    got = {
        r.r_fp: r.n_pairs
        for r in cross_k_counts(df, "is_a", [1000, 2000]).collect()
    }
    assert got == {1000: 0, 2000: 0}


def test_radius_of_gyration_exact(spark):
    rs = np.random.RandomState(41)
    rows = [
        (
            int(i % 7),
            int(rs.randint(-1_700_000, 1_700_000)) * 1000,
            int(rs.randint(-800_000, 800_000)) * 1000,
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "user_id long, lon_fp long, lat_fp long")
    got = {r.user_id: (r.n_pts, int(r.rog_num)) for r in
           radius_of_gyration(df).collect()}
    want = {}
    for uid in set(r[0] for r in rows):
        xs = [r[1] for r in rows if r[0] == uid]
        ys = [r[2] for r in rows if r[0] == uid]
        n = len(xs)
        num = (
            n * (sum(x * x for x in xs) + sum(y * y for y in ys))
            - sum(xs) ** 2
            - sum(ys) ** 2
        )
        want[uid] = (n, num)
    assert got == want
    # invariant: numerator == n^2 * mean squared dist to centroid >= 0
    assert all(v[1] >= 0 for v in got.values())


def test_radius_of_gyration_single_point_is_zero(spark):
    df = spark.createDataFrame(
        [(1, 123_456_789, -987_654_321)], "user_id long, lon_fp long, lat_fp long"
    )
    r = radius_of_gyration(df).collect()[0]
    assert (r.n_pts, int(r.rog_num)) == (1, 0)


def test_cell_user_simpson_matches_bruteforce(spark):
    rs = np.random.RandomState(13)
    rows = [
        (
            int(rs.randint(0, 9)),
            int(rs.randint(-60, 60)) * 10_000_000 + int(rs.randint(0, 9_000_000)),
            int(rs.randint(-60, 60)) * 10_000_000 + int(rs.randint(0, 9_000_000)),
        )
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "user_id long, lon_fp long, lat_fp long")
    zoom = 7
    cell = 3_600_000_000 >> zoom
    got = {
        (r.cx, r.cy): (r.n_visits, r.n_users, r.sum_sq)
        for r in cell_user_simpson(df, zoom).collect()
    }
    from collections import Counter

    cu = Counter(
        (
            (lon + 1_800_000_000) // cell,
            (lat + 900_000_000) // cell,
            uid,
        )
        for uid, lon, lat in rows
    )
    want = {}
    for (cx, cy, _uid), c in cu.items():
        n, u, s = want.get((cx, cy), (0, 0, 0))
        want[(cx, cy)] = (n + c, u + 1, s + c * c)
    assert got == want
    # Simpson lambda in (0, 1]: sum_sq <= n_visits^2, >= n_visits^2/n_users
    for n, u, s in got.values():
        assert s <= n * n
        assert s * u >= n * n
