"""Unit tests for segment_intersection_join: exact proper (interior)
segment-segment crossing self-join, checked against an all-pairs numpy
brute force and hand-built degenerate cases (collinear overlap, shared
endpoint, T-touch — all of which must be EXCLUDED by the proper-crossing
predicate)."""

from __future__ import annotations

import numpy as np
import pytest

from oshdb_spark.operators.knn import segment_intersection_join

ZOOM = 9


def _orient(p, q, r):
    return (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])


def _proper(s1, s2):
    a, b = (s1[0], s1[1]), (s1[2], s1[3])
    c, d = (s2[0], s2[1]), (s2[2], s2[3])
    o1, o2 = _orient(a, b, c), _orient(a, b, d)
    o3, o4 = _orient(c, d, a), _orient(c, d, b)
    return ((o1 > 0 > o2) or (o1 < 0 < o2)) and ((o3 > 0 > o4) or (o3 < 0 < o4))


def _brute(segs):
    out = set()
    for i, (ia, sa) in enumerate(segs):
        for ib, sb in segs[i + 1 :]:
            if _proper(sa, sb):
                out.add((min(ia, ib), max(ia, ib)))
    return out


def _df(spark, segs):
    rows = [(i, int(s[0]), int(s[1]), int(s[2]), int(s[3])) for i, s in segs]
    return spark.createDataFrame(
        rows, "seg_id long, ax long, ay long, bx long, by long"
    )


@pytest.mark.parametrize("seed", [5, 17])
def test_matches_bruteforce_random(spark, seed):
    rs = np.random.RandomState(seed)
    # zigzag inside a ~2-cell-wide box so the cover join really fans out
    segs = []
    px, py = 100_000_000, 50_000_000
    for i in range(60):
        qx = 100_000_000 + int(rs.randint(0, 12_000_000))
        qy = 50_000_000 + int(rs.randint(0, 9_000_000))
        segs.append((i, (px, py, qx, qy)))
        px, py = qx, qy
    got = {
        (r.a_id, r.b_id)
        for r in segment_intersection_join(_df(spark, segs), zoom=ZOOM).collect()
    }
    want = _brute(segs)
    assert got == want
    assert len(want) > 0


def test_degenerate_cases_excluded(spark):
    segs = [
        (0, (0, 0, 10_000_000, 0)),  # base
        (1, (2_000_000, 0, 8_000_000, 0)),  # collinear overlap -> excluded
        (2, (10_000_000, 0, 10_000_000, 5_000_000)),  # shared endpoint -> excluded
        (3, (5_000_000, 0, 5_000_000, 5_000_000)),  # T-touch on interior -> excluded
        (4, (4_000_000, -1_000_000, 6_000_000, 1_000_000)),  # proper cross of 0
    ]
    got = {
        (r.a_id, r.b_id)
        for r in segment_intersection_join(_df(spark, segs), zoom=ZOOM).collect()
    }
    # seg 4 crosses the base (0) properly and also crosses seg 3
    # (they straddle each other strictly: check with the reference)
    want = _brute(segs)
    assert got == want
    assert (0, 4) in got
    assert all((0, 1) != p and (0, 2) != p and (0, 3) != p for p in got)


def test_dateline_adjacent_cells_no_false_pairs(spark):
    # two far-apart segments must never appear as a candidate-pair result
    segs = [
        (0, (-1_790_000_000, 0, -1_780_000_000, 1_000_000)),
        (1, (1_780_000_000, 0, 1_790_000_000, 1_000_000)),
    ]
    got = segment_intersection_join(_df(spark, segs), zoom=ZOOM).collect()
    assert got == []


# ---------------------------------------------------------------------------
# nearest_segment_snap
# ---------------------------------------------------------------------------

from oshdb_spark.operators.knn import nearest_segment_snap  # noqa: E402

CELL = 3_600_000_000 >> ZOOM


def _snap_brute(points, segs, ring=1):
    """Same candidate policy (point ring-window x segment bbox cover) +
    exact rational point-segment distance with floor division."""
    cover = {}
    for sid, (x1, y1, x2, y2) in segs:
        x1o, y1o, x2o, y2o = (
            x1 + 1_800_000_000,
            y1 + 900_000_000,
            x2 + 1_800_000_000,
            y2 + 900_000_000,
        )
        for cx in range(min(x1o, x2o) // CELL, max(x1o, x2o) // CELL + 1):
            for cy in range(min(y1o, y2o) // CELL, max(y1o, y2o) // CELL + 1):
                cover.setdefault((cx, cy), []).append((sid, x1o, y1o, x2o, y2o))
    out = {}
    for pid, lon, lat in points:
        px, py = lon + 1_800_000_000, lat + 900_000_000
        best = None
        for dx in range(-ring, ring + 1):
            for dy in range(-ring, ring + 1):
                for sid, x1, y1, x2, y2 in cover.get(
                    (px // CELL + dx, py // CELL + dy), []
                ):
                    dot = (px - x1) * (x2 - x1) + (py - y1) * (y2 - y1)
                    len2 = (x2 - x1) ** 2 + (y2 - y1) ** 2
                    if len2 == 0 or dot <= 0:
                        d2 = (px - x1) ** 2 + (py - y1) ** 2
                    elif dot >= len2:
                        d2 = (px - x2) ** 2 + (py - y2) ** 2
                    else:
                        cr = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
                        d2 = (cr * cr) // len2
                    if best is None or (d2, sid) < best:
                        best = (d2, sid)
        if best is not None:
            out[pid] = (best[1], best[0])
    return out


@pytest.mark.parametrize("seed", [11, 29])
def test_snap_matches_bruteforce(spark, seed):
    rs = np.random.RandomState(seed)
    segs = []
    px, py = 200_000_000, 80_000_000
    for i in range(40):
        qx = 200_000_000 + int(rs.randint(0, 15_000_000))
        qy = 80_000_000 + int(rs.randint(0, 10_000_000))
        segs.append((i, (px, py, qx, qy)))
        px, py = qx, qy
    points = [
        (
            j,
            200_000_000 + int(rs.randint(-2_000_000, 17_000_000)),
            80_000_000 + int(rs.randint(-2_000_000, 12_000_000)),
        )
        for j in range(80)
    ]
    pdf = spark.createDataFrame(points, "event_id long, lon_fp long, lat_fp long")
    sdf = _df(spark, segs)
    sdf = sdf.selectExpr("seg_id", "ax", "ay", "bx", "by")
    got = {
        r.point_id: (r.seg_id, r.d2)
        for r in nearest_segment_snap(pdf, sdf, zoom=ZOOM, ring=1).collect()
    }
    want = _snap_brute(points, segs)
    assert got == want
    assert len(want) > 0


def test_snap_endpoint_interior_and_degenerate(spark):
    segs = [
        (0, (0, 0, 10_000_000, 0)),  # horizontal
        (1, (20_000_000, 20_000_000, 20_000_000, 20_000_000)),  # zero-length
    ]
    points = [
        (0, 5_000_000, 3_000_000),  # interior projection -> d2 = 3e6^2
        (1, -2_000_000, 1_000_000),  # before A -> endpoint A
        (2, 20_000_000, 21_000_000),  # degenerate seg -> point dist
    ]
    pdf = spark.createDataFrame(points, "event_id long, lon_fp long, lat_fp long")
    sdf = spark.createDataFrame(
        [(i, *s) for i, s in segs], "seg_id long, ax long, ay long, bx long, by long"
    )
    got = {
        r.point_id: (r.seg_id, r.d2)
        for r in nearest_segment_snap(pdf, sdf, zoom=ZOOM, ring=1).collect()
    }
    assert got[0] == (0, 3_000_000**2)
    assert got[1] == (0, 2_000_000**2 + 1_000_000**2)
    assert got[2] == (1, 1_000_000**2)
