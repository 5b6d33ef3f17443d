"""Unit tests for trajectory_hausdorff_join: integer-exact discrete
Hausdorff trajectory-similarity self-join, checked against a numpy
brute-force reference (same decimation + centroid-bucket policy)."""

from __future__ import annotations

import numpy as np
import pytest

from oshdb_spark.operators.aggregations import trajectory_hausdorff_join

ZOOM = 4
CELL = 3_600_000_000 >> ZOOM
K = 8


def _tracks(seed: int, n_users: int = 12, n_pts: int = 20):
    """Users clustered into a handful of centroid cells so the bucket
    join yields in-cell AND cross-cell (absent) pairs."""
    rs = np.random.RandomState(seed)
    rows = []
    for u in range(n_users):
        # 4 anchor boxes; users 0-2 share box 0, etc.
        box = u // 3
        base_lon = -1_500_000_000 + box * 900_000_000
        base_lat = -600_000_000 + (box % 2) * 500_000_000
        for i in range(n_pts):
            rows.append(
                (
                    u,
                    i,  # event_id == order == "ts"
                    int(base_lon + rs.randint(-40_000_000, 40_000_000)),
                    int(base_lat + rs.randint(-40_000_000, 40_000_000)),
                )
            )
    return rows


def _brute(rows):
    by_u: dict[int, list[tuple[int, int]]] = {}
    for u, i, lon, lat in sorted(rows, key=lambda r: (r[0], r[1])):
        by_u.setdefault(u, [])
        if len(by_u[u]) < K:
            by_u[u].append((lon + 1_800_000_000, lat + 900_000_000))
    cent = {}
    for u, pts in by_u.items():
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        cent[u] = ((sx // len(pts)) // CELL, (sy // len(pts)) // CELL)
    out = {}
    users = sorted(by_u)
    for ia, a in enumerate(users):
        for b in users[ia + 1 :]:
            if cent[a] != cent[b]:
                continue

            def sqd(p, q):
                dl = abs(p[0] - q[0])
                dx = min(dl, 3_600_000_000 - dl)
                return dx * dx + (p[1] - q[1]) ** 2

            d_ab = max(min(sqd(p, q) for q in by_u[b]) for p in by_u[a])
            d_ba = max(min(sqd(p, q) for q in by_u[a]) for p in by_u[b])
            out[(a, b)] = (
                len(by_u[a]),
                len(by_u[b]),
                max(d_ab, d_ba),
            )
    return out


@pytest.mark.parametrize("seed", [7, 21])
def test_hausdorff_matches_bruteforce(spark, seed):
    rows = _tracks(seed)
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, lon_fp long, lat_fp long"
    )
    got = {
        (r.a_k, r.b_k): (r.n_a, r.n_b, r.hausdorff_sq)
        for r in trajectory_hausdorff_join(
            df,
            bucket_zoom=ZOOM,
            max_points=K,
            ts_col="event_id",
            order_col="event_id",
        ).collect()
    }
    want = _brute(rows)
    assert got == want
    assert len(want) > 0  # fixture actually produced candidate pairs


def test_hausdorff_symmetric_zero_on_identical_tracks(spark):
    rows = _tracks(3, n_users=2, n_pts=K)
    # user 1 = exact copy of user 0's points
    rows = [r for r in rows if r[0] == 0]
    rows += [(1, i, lon, lat) for (_, i, lon, lat) in rows]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, lon_fp long, lat_fp long"
    )
    res = trajectory_hausdorff_join(
        df, bucket_zoom=ZOOM, max_points=K, ts_col="event_id", order_col="event_id"
    ).collect()
    assert len(res) == 1
    assert res[0].hausdorff_sq == 0
    assert (res[0].n_a, res[0].n_b) == (K, K)


def test_hausdorff_dateline_wrap(spark):
    # two single-point "tracks" straddling the dateline: planar diff is
    # ~3.6e9 fp, wrapped distance must be the short arc (2e7 fp)
    rows = [
        (0, 0, -1_799_000_000, 0),
        (1, 0, 1_791_000_000, 0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, lon_fp long, lat_fp long"
    )
    # zoom 0: one global cell -> the pair is always a candidate
    res = trajectory_hausdorff_join(
        df, bucket_zoom=0, max_points=4, ts_col="event_id", order_col="event_id"
    ).collect()
    assert len(res) == 1
    assert res[0].hausdorff_sq == 10_000_000**2
