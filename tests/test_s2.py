"""S2 cell-id correctness (grid/s2.py).

No s2 library exists in this container, so the curve is pinned by
structural invariants that only the true S2 construction satisfies
simultaneously:

  * FromFaceIJ o ToFaceIJ == identity (bit-exact, random fuzz);
  * consecutive curve positions within a face map to 4-adjacent (i,j)
    cells — THE defining Hilbert space-filling property; any error in
    the lookup tables breaks adjacency somewhere on a dense sweep;
  * published fixed points of the face/(u,v) projection and the
    quadratic s/t transform;
  * face-cell tokens 1/3/5/7/9/b (face<<61 | 1<<60 in hex, trailing
    zeros stripped — directly from the spec's id layout);
  * parent/level/lsb arithmetic.
"""

from __future__ import annotations

import numpy as np

from oshdb_spark.grid import s2


def test_face_cell_tokens():
    ids = np.array([s2.parent(np.uint64((f << 61) + (1 << 60)), 0)
                    for f in range(6)], dtype=np.uint64)
    assert s2.token(ids) == ["1", "3", "5", "7", "9", "b"]
    assert s2.level_of(ids).tolist() == [0] * 6


def test_leaf_ids_odd_and_face_bits():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 5000)
    lat = rng.uniform(-90, 90, 5000)
    ids = s2.cell_id(lon, lat)
    assert np.all(ids & np.uint64(1) == 1)  # leaves are odd
    face, _, _ = s2.face_ij(lon, lat)
    assert np.array_equal((ids >> np.uint64(61)).astype(np.int64), face)
    assert np.all(s2.level_of(ids) == 30)


def test_face_uv_fixed_points():
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    face, u, v = s2.face_uv(lon, lat)
    assert face.tolist() == [0, 1, 2, 3, 4, 5]
    np.testing.assert_allclose(u, 0.0, atol=1e-12)
    np.testing.assert_allclose(v, 0.0, atol=1e-12)
    # +45 deg longitude on the equator = the +x/+y cube edge: |u| = 1
    f2, u2, _ = s2.face_uv(np.array([44.999999]), np.array([0.0]))
    assert abs(abs(u2[0]) - 1.0) < 1e-5


def test_st_uv_quadratic_inverse():
    s = np.linspace(0.0, 1.0, 1001)
    np.testing.assert_allclose(s2._uv_to_st(s2._st_to_uv(s)), s, atol=1e-12)
    assert s2._uv_to_st(np.array([0.0]))[0] == 0.5
    assert s2._st_to_uv(np.array([0.5]))[0] == 0.0
    assert s2._uv_to_st(np.array([1.0]))[0] == 1.0
    assert s2._uv_to_st(np.array([-1.0]))[0] == 0.0


def test_from_to_face_ij_roundtrip():
    rng = np.random.default_rng(11)
    n = 20000
    face = rng.integers(0, 6, n)
    i = rng.integers(0, 1 << 30, n)
    j = rng.integers(0, 1 << 30, n)
    ids = s2.from_face_ij(face, i, j)
    f2, i2, j2 = s2.to_face_ij(ids)
    assert np.array_equal(face, f2)
    assert np.array_equal(i, i2)
    assert np.array_equal(j, j2)


def test_hilbert_adjacency_dense_sweep():
    """Consecutive curve positions are 4-adjacent cells.  Sweep runs of
    consecutive positions at several scales (crossing every lookup-table
    block boundary) on every face."""
    for face in range(6):
        for start in (0, 255, 4095, 65535, (1 << 20) - 7,
                      (1 << 59) - 1000, (1 << 60) - 1001):
            pos = np.arange(start, start + 1000, dtype=np.uint64)
            ids = (np.uint64(face) << np.uint64(61)) | (
                pos << np.uint64(1)) | np.uint64(1)
            _, i, j = s2.to_face_ij(ids)
            manhattan = np.abs(np.diff(i)) + np.abs(np.diff(j))
            assert np.all(manhattan == 1), (face, start)


def test_parent_contains_leaf():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-85, 85, 2000)
    leaf = s2.cell_id(lon, lat)
    for level in (0, 4, 10, 16, 25):
        p = s2.parent(leaf, level)
        assert np.all(s2.level_of(p) == level)
        lsb = np.uint64(1 << (2 * (30 - level)))
        lo = p - lsb + np.uint64(1)
        hi = p + lsb - np.uint64(1)
        assert np.all((leaf >= lo) & (leaf <= hi))
        # parent is a prefix: same face
        assert np.array_equal(p >> np.uint64(61), leaf >> np.uint64(61))


def test_parent_is_monotone_in_level():
    """Deeper ancestors nest inside shallower ones."""
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-85, 85, 500)
    leaf = s2.cell_id(lon, lat)
    prev_lo = None
    prev_hi = None
    for level in (4, 8, 12, 20):
        p = s2.parent(leaf, level)
        lsb = np.uint64(1 << (2 * (30 - level)))
        lo, hi = p - lsb + np.uint64(1), p + lsb - np.uint64(1)
        if prev_lo is not None:
            assert np.all(lo >= prev_lo) and np.all(hi <= prev_hi)
        prev_lo, prev_hi = lo, hi


def test_nearby_points_share_coarse_parent():
    """Two points 0.001 deg apart almost always share a level-8 cell
    (~100 km); compare via curve-position distance to avoid boundary
    flakiness: their leaf positions must be close on the curve OR in
    (i,j) space."""
    rng = np.random.default_rng(9)
    lon = rng.uniform(-170, 170, 1000)
    lat = rng.uniform(-80, 80, 1000)
    f1, i1, j1 = s2.face_ij(lon, lat)
    f2, i2, j2 = s2.face_ij(lon + 0.0005, lat + 0.0005)
    same_face = f1 == f2
    # 0.0005 deg is ~1.5e4 leaf units; nothing should move further than ~1e5
    close = (np.abs(i1 - i2) < 100000) & (np.abs(j1 - j2) < 100000)
    assert np.all(~same_face | close)
    assert same_face.mean() > 0.95


def test_cell_id_deterministic_vectorized_matches_scalar():
    rng = np.random.default_rng(13)
    lon = rng.uniform(-180, 180, 64)
    lat = rng.uniform(-90, 90, 64)
    batch = s2.cell_id(lon, lat, 12)
    single = np.array(
        [s2.cell_id(np.array([lo]), np.array([la]), 12)[0]
         for lo, la in zip(lon, lat)],
        dtype=np.uint64,
    )
    assert np.array_equal(batch, single)
