"""Distributed clustering: grid-bucketed DBSCAN and Lloyd k-means.

  * grid_neighbor_pairs — all point pairs within ``eps`` via the classic
    eps-grid trick: one side explodes to its 3x3 neighbor cells and
    equi-joins the other side's home cell, then an exact integer
    distance filter.  No all-pairs anywhere; cost is bounded by cell
    density (dense cells are the same hot keys `plans/skew.py` salts).
  * dbscan — density-based spatial clustering (Ester et al., KDD'96) as
    a composition: neighbor counts -> core points -> connected
    components over core-core edges (the dedup CC operator, Kiveris
    SoCC'14) -> deterministic border assignment (min core-neighbor
    cluster; classic DBSCAN assigns borders to the first-discovered
    core, which is scan-order-dependent — min-id is the
    order-independent variant, so output is engine-reproducible).
  * kmeans_lloyd — Lloyd iterations with k*dim centroids collected to
    the driver per round (the standard distributed k-means shape:
    assignment is map-only against literal centroids, the update is one
    map-side-combinable groupBy over (cluster, dim)).  Coordinates are
    quantized to 1e-6 units once so every distance is exact BIGINT math
    and centroid updates are floor(sum/count + 0.5) — one IEEE division
    per component — making assignments bit-reproducible across engines
    (the SemDeDup-style semantic-dedup front end: cluster first, compare
    only within clusters).

Reference parity: the reference has no clustering operators — these
serve its data-scale role (OSHDB's aggregateByGeometry groups by given
zones; DBSCAN derives the zones from density).  Training-data pipeline
context: SemDeDup (Abbas et al. 2023) prunes semantic duplicates within
k-means clusters of embeddings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: quantization scale for k-means coordinates (1e-6 of the unit sphere)
KMEANS_SCALE = 1_000_000

# offsets that make fixed-point OSM coordinates non-negative, so integer
# division by eps is plain floor division in every engine
LON_OFFSET = 1_800_000_000
LAT_OFFSET = 900_000_000


def grid_neighbor_pairs(
    points: DataFrame,
    eps: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """ORDERED pairs (id_a, id_b, dist_sq) with 0 < dist <= eps.

    Each point probes its 3x3 neighborhood of eps-sized grid cells; the
    join is a plain equi-join on the cell key, so every ordered pair at
    distance <= eps is found exactly once (b's home cell is always one
    of a's 9 probe cells).  Distances are exact BIGINT (fixed-point
    inputs; deltas are bounded by 2*eps after the cell filter, so the
    squares cannot overflow).
    """
    eps = int(eps)
    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).withColumns(
        {
            "cx": F.expr(f"(x + {LON_OFFSET}) DIV {eps}"),
            "cy": F.expr(f"(y + {LAT_OFFSET}) DIV {eps}"),
        }
    )
    probe = pts.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(F.expr("array(-1, 0, 1)")).alias("dcx"),
        F.col("cx"),
        F.col("cy"),
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.col("cx") + F.col("dcx")).alias("pcx"),
        F.explode(F.expr("array(cy - 1, cy, cy + 1)")).alias("pcy"),
    )
    home = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("pcx"),
        F.col("cy").alias("pcy"),
    )
    return (
        probe.join(home, ["pcx", "pcy"])
        .filter(F.col("id_a") != F.col("id_b"))
        .withColumn(
            "dist_sq",
            (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
            + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")),
        )
        .filter(F.col("dist_sq") <= F.lit(eps * eps).cast("long"))
        .select("id_a", "id_b", "dist_sq")
    )


def dbscan(
    points: DataFrame,
    eps: int,
    min_pts: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """DBSCAN over fixed-point points: (id, role, cluster_id).

    role in ('core', 'border', 'noise'); cluster_id is the minimum core
    id of the cluster (NULL for noise).  Core = closed eps-neighborhood
    of size >= min_pts.  Borders join the minimum cluster among their
    core neighbors (deterministic; see module docstring).

    100-TB posture: pairs are an eps-grid equi-join (no all-pairs), the
    neighbor count and core filter are one map-side-combinable groupBy,
    clustering is the alternating-star CC (O(log n) shuffle-linear
    rounds), border assignment one further equi-join + min-agg.
    """
    from oshdb_spark.operators.dedup import connected_components

    ids = points.select(F.col(id_col).alias("id")).distinct()
    pairs = grid_neighbor_pairs(points, eps, id_col, x_col, y_col)
    # pairs is the ordered edge set, so one groupBy on the probe side
    # counts each point's full open neighborhood
    ncnt = pairs.groupBy(F.col("id_a").alias("id")).agg(
        F.count(F.lit(1)).alias("n_nbrs")
    )
    core = ncnt.filter(F.col("n_nbrs") + 1 >= int(min_pts)).select("id")
    core_edges = (
        pairs.filter(F.col("id_a") < F.col("id_b"))
        .join(core.withColumnRenamed("id", "id_a"), "id_a", "left_semi")
        .join(core.withColumnRenamed("id", "id_b"), "id_b", "left_semi")
        .select("id_a", "id_b")
    )
    comp = connected_components(core_edges, "id_a", "id_b")
    core_lbl = (
        core.join(comp, core["id"] == comp["node"], "left")
        .select(
            core["id"],
            F.coalesce(comp["component"], core["id"]).alias("cluster_id"),
        )
    )
    border_lbl = (
        pairs.join(core_lbl.withColumnRenamed("id", "id_b"), "id_b")
        .join(core.withColumnRenamed("id", "id_a"), "id_a", "left_anti")
        .groupBy(F.col("id_a").alias("id"))
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    labelled = core_lbl.withColumn("role", F.lit("core")).unionByName(
        border_lbl.withColumn("role", F.lit("border"))
    )
    return ids.join(labelled, "id", "left").select(
        "id",
        F.coalesce(F.col("role"), F.lit("noise")).alias("role"),
        "cluster_id",
    )


def quantize_vectors(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, xi: array<bigint>) — components rounded half-up to 1e-6 units.

    floor(v * 1e6 + 0.5) is a single exact-input IEEE multiply + add +
    floor, so every engine computes the identical integer; all distances
    downstream are then exact BIGINT arithmetic.
    """
    return emb.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"transform({vec_col}, v ->"
            f" CAST(FLOOR(CAST(v AS DOUBLE) * {KMEANS_SCALE}.0 + 0.5) AS BIGINT))"
        ).alias("xi"),
    )


def _assign(quantized: DataFrame, centroids: list[tuple[int, list[int]]]) -> DataFrame:
    """Map-only argmin assignment against literal centroids.

    Ties break to the smallest cluster id via lexicographic struct
    ordering (dist_sq, cluster) under array_min.
    """
    cands = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("xi"),
                        F.array(*[F.lit(int(v)).cast("long") for v in vec]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, v: acc + v,
                ).alias("dist_sq"),
                F.lit(int(cid)).cast("int").alias("cluster"),
            )
            for cid, vec in centroids
        ]
    )
    best = F.array_min(cands)
    return quantized.select(
        "id",
        "xi",
        best["cluster"].alias("cluster"),
        best["dist_sq"].alias("dist_sq"),
    )


def kmeans_lloyd(
    emb: DataFrame,
    k: int,
    n_iter: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd k-means: (id, cluster, dist_sq).

    Init = the quantized vectors of the k smallest ids, cluster ids
    0..k-1 in id order.  Each iteration: map-only assignment against
    driver-collected literal centroids (k*dim ints — a bounded scalar
    pull, the same shape MLlib uses), then ONE groupBy (cluster, dim)
    with map-side partial aggregation to recompute centroids as
    floor(sum/count + 0.5).  Clusters that lose all members simply drop
    out (no re-seeding), which keeps the trace engine-reproducible.
    dist_sq in the output is measured against the FINAL centroids (one
    extra assignment pass after the last update).
    """
    q = quantized = quantize_vectors(emb, id_col, vec_col)
    init = (
        q.orderBy("id")
        .limit(int(k))
        .collect()
    )
    centroids = [(i, list(r["xi"])) for i, r in enumerate(init)]
    for _ in range(int(n_iter)):
        assigned = _assign(quantized, centroids)
        upd = (
            assigned.select(
                "cluster", F.posexplode("xi").alias("dim", "val")
            )
            .groupBy("cluster", "dim")
            .agg(
                F.floor(
                    F.sum("val").cast("double") / F.count(F.lit(1)) + F.lit(0.5)
                ).alias("cv")
            )
            .collect()
        )
        by_cluster: dict[int, dict[int, int]] = {}
        for r in upd:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = int(r["cv"])
        centroids = [
            (cid, [dims[d] for d in sorted(dims)])
            for cid, dims in sorted(by_cluster.items())
        ]
    return _assign(quantized, centroids).select(
        F.col("id").alias(id_col), "cluster", "dist_sq"
    )


def semdedup_within_cluster(
    emb: DataFrame,
    k: int,
    n_iter: int,
    tau_sq_num: int = 1225,
    tau_sq_den: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): prune semantic near-duplicates
    WITHIN k-means clusters — (id, cluster, is_kept).

    A vector is pruned when some smaller-id vector in its cluster has
    cosine similarity above tau (keep-first-occurrence, the same
    deterministic survivorship rule as chunk dedup; the paper keeps a
    per-group representative, which is order-dependent — min-id is the
    engine-reproducible variant, pruning a superset of the sequential
    greedy).  tau enters as the exact rational tau^2 = num/den so the
    threshold test is pure integer arithmetic on the 1e-6-quantized
    vectors — ``den * dot^2 >= num * |a|^2 * |b|^2 AND dot > 0`` — in
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB): bit-reproducible, no
    sqrt, no doubles anywhere.

    100-TB posture: the pairwise stage is confined within clusters (the
    point of SemDeDup — k is chosen so clusters are small; cost is
    sum(|cluster|^2), not n^2), as one equi-join on the cluster id; the
    norms are a map-side projection.  A runaway cluster is one hot join
    key — the same diversion contract as `lsh_capped_pairs` applies if
    a corpus needs it.
    """
    assign = kmeans_lloyd(emb, k, n_iter, id_col, vec_col).select(
        F.col(id_col).alias("id"), "cluster"
    )
    q = quantize_vectors(emb, id_col, vec_col)
    v = q.join(assign, "id").withColumn(
        "n2",
        F.aggregate(
            F.transform("xi", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.xi"), F.col("b.xi"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dec = "decimal(38,0)"
    pairs = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .withColumn("dot", dot)
        .filter(
            (F.col("dot") > 0)
            & (
                F.lit(int(tau_sq_den)).cast(dec)
                * F.col("dot").cast(dec)
                * F.col("dot").cast(dec)
                >= F.lit(int(tau_sq_num)).cast(dec)
                * F.col("a.n2").cast(dec)
                * F.col("b.n2").cast(dec)
            )
        )
    )
    pruned = pairs.select(F.col("b.id").alias("id")).distinct()
    return (
        v.select("id", "cluster")
        .join(pruned.withColumn("__p", F.lit(True)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            F.coalesce(~F.col("__p"), F.lit(True)).alias("is_kept"),
        )
    )
