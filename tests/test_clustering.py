"""Unit tests for operators/clustering.py (DBSCAN + Lloyd k-means).

Fixtures are hand-checkable: two dense blobs + stragglers for DBSCAN,
two well-separated vector groups for k-means, with numpy re-derivations
as the independent oracle for the larger random cases.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from oshdb_spark.operators.clustering import (
    KMEANS_SCALE,
    dbscan,
    grid_neighbor_pairs,
    kmeans_lloyd,
    quantize_vectors,
)


def _points_df(spark, pts):
    return spark.createDataFrame(
        [(int(i), int(x), int(y)) for i, (x, y) in enumerate(pts)],
        "id long, x long, y long",
    )


class TestGridNeighborPairs:
    def test_small_exact(self, spark):
        # 0-1-2 chained within eps=10; 3 far away
        pts = [(0, 0), (6, 0), (12, 0), (1000, 1000)]
        out = grid_neighbor_pairs(_points_df(spark, pts), eps=10).collect()
        got = {(r.id_a, r.id_b): r.dist_sq for r in out}
        assert got == {
            (0, 1): 36,
            (1, 0): 36,
            (1, 2): 36,
            (2, 1): 36,
        }

    def test_cell_boundary_pairs_found_once(self, spark):
        # points straddling a cell boundary (eps=10 -> cells at x=10)
        pts = [(9, 0), (11, 0)]
        out = grid_neighbor_pairs(_points_df(spark, pts), eps=10).collect()
        assert {(r.id_a, r.id_b) for r in out} == {(0, 1), (1, 0)}

    def test_matches_brute_force_random(self, spark):
        rng = np.random.RandomState(7)
        xy = rng.randint(-500, 500, size=(120, 2))
        eps = 60
        df = _points_df(spark, [tuple(p) for p in xy])
        got = {
            (r.id_a, r.id_b)
            for r in grid_neighbor_pairs(df, eps=eps).collect()
        }
        d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
        want = {
            (i, j)
            for i in range(len(xy))
            for j in range(len(xy))
            if i != j and d2[i, j] <= eps * eps
        }
        assert got == want


def _brute_dbscan(xy, eps, min_pts):
    """Reference DBSCAN with min-id cluster labels + min-cluster borders."""
    n = len(xy)
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    nbr = d2 <= eps * eps
    counts = nbr.sum(1)  # includes self
    core = counts >= min_pts
    # union-find over core-core edges
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        for j in range(i + 1, n):
            if core[i] and core[j] and nbr[i, j]:
                parent[find(i)] = find(j)
    comp = {}
    for i in range(n):
        if core[i]:
            comp.setdefault(find(i), []).append(i)
    label = {}
    for members in comp.values():
        m = min(members)
        for i in members:
            label[i] = m
    out = {}
    for i in range(n):
        if core[i]:
            out[i] = ("core", label[i])
        else:
            cands = [label[j] for j in range(n) if core[j] and nbr[i, j]]
            if cands:
                out[i] = ("border", min(cands))
            else:
                out[i] = ("noise", None)
    return out


class TestDbscan:
    def test_two_blobs_and_noise(self, spark):
        blob_a = [(i * 3, 0) for i in range(5)]  # ids 0-4
        blob_b = [(1000 + i * 3, 0) for i in range(5)]  # ids 5-9
        lone = [(5000, 5000)]  # id 10
        df = _points_df(spark, blob_a + blob_b + lone)
        rows = dbscan(df, eps=10, min_pts=4).collect()
        got = {r.id: (r.role, r.cluster_id) for r in rows}
        assert got[10] == ("noise", None)
        assert {got[i][1] for i in range(5)} == {0}
        assert {got[i][1] for i in range(5, 10)} == {5}
        # middle points see 4+ neighbors within eps -> core; blob ends too
        # (eps=10 covers offsets 3,6,9 -> every member sees >=3 others + self)
        assert all(got[i][0] == "core" for i in range(10))

    def test_border_takes_min_cluster(self, spark):
        # dense blob (core) + one point reachable from it only
        blob = [(i * 2, 0) for i in range(4)]  # ids 0-3, eps 10 => all core
        tip = [(14, 0)]  # id 4: within eps of id 3 only -> 2-point nbhd
        df = _points_df(spark, blob + tip)
        rows = dbscan(df, eps=10, min_pts=4).collect()
        got = {r.id: (r.role, r.cluster_id) for r in rows}
        assert got[4] == ("border", 0)

    def test_matches_brute_force_random(self, spark):
        rng = np.random.RandomState(11)
        # three loose clusters + uniform noise
        blobs = [
            rng.randint(c - 40, c + 40, size=(30, 2))
            for c in (0, 400, 800)
        ]
        noise = rng.randint(-1000, 1800, size=(20, 2))
        xy = np.vstack(blobs + [noise])
        eps, min_pts = 45, 5
        df = _points_df(spark, [tuple(p) for p in xy])
        rows = dbscan(df, eps=eps, min_pts=min_pts).collect()
        got = {r.id: (r.role, r.cluster_id) for r in rows}
        want = _brute_dbscan(xy, eps, min_pts)
        assert got == want


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(v) for v in vec]) for i, vec in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _brute_kmeans(vecs, k, iters):
    """Reference Lloyd with the module's exact quantized arithmetic."""
    # the Spark column is array<float>: quantize the float32 round-trip,
    # exactly as the engine sees the values
    x = np.floor(
        np.array(vecs, dtype=np.float32).astype(np.float64) * KMEANS_SCALE
        + 0.5
    ).astype(np.int64)
    cent = {i: x[i].copy() for i in range(k)}

    def assign():
        out = {}
        for i in range(len(x)):
            best = min(
                (int(((x[i] - c) ** 2).sum()), cid) for cid, c in cent.items()
            )
            out[i] = (best[1], best[0])
        return out

    for _ in range(iters):
        a = assign()
        groups = {}
        for i, (cid, _d) in a.items():
            groups.setdefault(cid, []).append(x[i])
        cent = {
            cid: np.floor(
                np.sum(g, axis=0).astype(np.float64) / len(g) + 0.5
            ).astype(np.int64)
            for cid, g in groups.items()
        }
    return assign()


class TestKmeans:
    def test_two_separated_groups(self, spark):
        lo = [[0.01 * i, 0.0, 0.0] for i in range(4)]
        hi = [[0.9 + 0.01 * i, 1.0, 1.0] for i in range(4)]
        df = _emb_df(spark, lo + hi)
        rows = kmeans_lloyd(df, k=2, n_iter=2).collect()
        got = {r.vec_id: r.cluster for r in rows}
        assert {got[i] for i in range(4)} == {0}
        assert {got[i] for i in range(4, 8)} == {1}

    def test_matches_numpy_reference(self, spark):
        rng = np.random.RandomState(3)
        centers = rng.uniform(-0.5, 0.5, size=(4, 8))
        vecs = np.vstack(
            [c + rng.uniform(-0.05, 0.05, size=(15, 8)) for c in centers]
        )
        df = _emb_df(spark, vecs.tolist())
        rows = kmeans_lloyd(df, k=4, n_iter=3).collect()
        got = {r.vec_id: (r.cluster, r.dist_sq) for r in rows}
        want = _brute_kmeans(vecs.tolist(), k=4, iters=3)
        assert got == want

    def test_quantize_exact(self, spark):
        df = _emb_df(spark, [[0.1234567, -0.5, 0.0000004]])
        row = quantize_vectors(df).collect()[0]
        # floor(-500000.0 + 0.5) = -500000 (half-up rounds toward +inf)
        assert list(row.xi) == [123457, -500000, 0]


class TestSemDeDup:
    def test_near_dup_pruned_within_cluster(self, spark):
        from oshdb_spark.operators.clustering import semdedup_within_cluster

        lo = [
            [1.0, 0.0, 0.0],          # id 0 (kept: smallest in its dup set)
            [0.999, 0.001, 0.0],      # id 1 ~ id 0 -> pruned
            [0.0, 1.0, 0.0],          # id 2: same cluster, orthogonal -> kept
        ]
        hi = [
            [-1.0, -1.0, -1.0],       # id 3 kept
            [-0.998, -1.0, -1.0],     # id 4 ~ id 3 -> pruned
            [-1.0, -0.9, -1.0],       # id 5 ~ id 3 too (cos ~ .998) -> pruned
        ]
        df = _emb_df(spark, lo + hi)
        # tau^2 = 0.9025 (tau = .95)
        rows = semdedup_within_cluster(
            df, k=2, n_iter=2, tau_sq_num=9025, tau_sq_den=10_000
        ).collect()
        got = {r.vec_id: (r.cluster, r.is_kept) for r in rows}
        assert got[0] == (0, True)
        assert got[1] == (0, False)
        assert got[2] == (0, True)
        assert got[3] == (1, True)
        assert got[4] == (1, False)
        assert got[5] == (1, False)

    def test_cross_cluster_dups_not_pruned(self, spark):
        from oshdb_spark.operators.clustering import semdedup_within_cluster

        # cosine-identical but L2-distant vectors seeded as the two
        # initial centroids: k-means (an L2 method) keeps them in
        # different clusters, so neither is pruned — SemDeDup only
        # compares within clusters by design
        df = _emb_df(spark, [[1.0, 0.01], [100.0, 1.0]])
        rows = semdedup_within_cluster(
            df, k=2, n_iter=1, tau_sq_num=9025, tau_sq_den=10_000
        ).collect()
        got = {r.vec_id: (r.cluster, r.is_kept) for r in rows}
        assert got[0][1] and got[1][1]
        assert got[0][0] != got[1][0]
