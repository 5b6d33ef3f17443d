"""kNN via grid-cell ring expansion.

Reference primitive: XYGrid.getNeighbours (3x3 ring,
/root/reference/oshdb/src/main/java/org/heigit/ohsome/oshdb/index/XYGrid.java:409-423)
generalized to radius-R rings — the north-rule kNN: generate ring-r cell ids
around each query, semi-join against the data cells, expand until the k-th
candidate distance is provably inside the explored ring (every point outside
Chebyshev cell-ring R is at least R * cell_width degrees away).

Scale shape: the data side computes its cell coordinates ONCE (narrow,
JVM-side integer math); each round is a broadcast hash join of the (small)
query ring-cell set against the data cells, so no data shuffle ever happens —
the only iteration state is a per-query (count, kth_distance) summary
collected to the driver (a few rows per round).

The distance metric is planar squared degrees computed with the exact same
IEEE-double expression the oracle SQL uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_OSM_180 = 1_800_000_000
_OSM_90 = 900_000_000


def _cell_xy(zoom: int, lon: F.Column, lat: F.Column) -> tuple[F.Column, F.Column]:
    """XYGrid x/y cell coordinates (XYGrid.java:140-168) as Columns."""
    w = 360.0 / (1 << zoom) * 1e7
    lon_s = lon.cast("long") + F.lit(_OSM_180)
    lat_s = lat.cast("long") + F.lit(_OSM_90)
    lon_s = F.when(lon_s == 2 * _OSM_180, F.lit(0)).otherwise(lon_s)
    lat_s = F.when(lat_s == 2 * _OSM_90, lat_s - 1).otherwise(lat_s)
    return F.floor(lon_s / F.lit(w)), F.floor(lat_s / F.lit(w))


def _cell_xy_py(zoom: int, lon_fp: int, lat_fp: int) -> tuple[int, int]:
    import math

    w = 360.0 / (1 << zoom) * 1e7
    lon_s = lon_fp + _OSM_180
    lat_s = lat_fp + _OSM_90
    if lon_s == 2 * _OSM_180:
        lon_s = 0
    if lat_s == 2 * _OSM_90:
        lat_s -= 1
    return int(math.floor(lon_s / w)), int(math.floor(lat_s / w))


def knn_join(
    spark: SparkSession,
    points: DataFrame,
    queries: list[tuple[int, int, int]],
    k: int = 5,
    zoom: int = 6,
    initial_ring: int = 2,
    max_rounds: int = 8,
) -> DataFrame:
    """Exact k nearest points (by planar degree distance) per query.

    points: DataFrame with (event_id, lon_fp, lat_fp) fixed-point coords.
    queries: [(qid, qlon_fp, qlat_fp), ...] — small, driver-side.
    Returns (qid, neighbor_id, rank), rank 1..k.
    """
    nx = 1 << zoom
    cell_w_deg = 360.0 / nx
    x_col, y_col = _cell_xy(zoom, F.col("lon_fp"), F.col("lat_fp"))
    pts = points.select(
        "event_id", "lon_fp", "lat_fp", x_col.alias("cx"), y_col.alias("cy")
    ).cache()

    q_cells = {qid: _cell_xy_py(zoom, qx, qy) for qid, qx, qy in queries}
    pending = {qid: (qx, qy) for qid, qx, qy in queries}
    results: list[DataFrame] = []
    ring = initial_ring

    for _ in range(max_rounds):
        if not pending:
            break
        # full coverage: the ring spans every column and every row of the grid
        full_cover = (2 * ring + 1) >= nx and (2 * ring + 1) >= nx // 2
        # query-side ring cell set: (qid, cx, cy) for Chebyshev distance <= ring
        rows = []
        for qid, (qx_fp, qy_fp) in pending.items():
            cqx, cqy = q_cells[qid]
            for dx in range(-ring, ring + 1):
                for dy in range(-ring, ring + 1):
                    rows.append((qid, (cqx + dx) % nx, cqy + dy))
        ring_df = spark.createDataFrame(rows, "qid int, cx long, cy long").distinct()

        cand = pts.join(F.broadcast(ring_df), ["cx", "cy"], "inner")
        qdf = spark.createDataFrame(
            [(qid, qx, qy) for qid, (qx, qy) in pending.items()],
            "qid int, qlon long, qlat long",
        )
        cand = cand.join(F.broadcast(qdf), "qid")
        d2 = (
            ((F.col("lon_fp") - F.col("qlon")) / F.lit(1e7))
            * ((F.col("lon_fp") - F.col("qlon")) / F.lit(1e7))
        ) + (
            ((F.col("lat_fp") - F.col("qlat")) / F.lit(1e7))
            * ((F.col("lat_fp") - F.col("qlat")) / F.lit(1e7))
        )
        ranked = cand.withColumn("d2", d2).withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy("d2", "event_id")
            ),
        ).filter(F.col("rank") <= k)
        topk = ranked.select("qid", F.col("event_id").alias("neighbor_id"), "rank", "d2")
        summary = {
            r["qid"]: (r["n"], r["kth"])
            for r in topk.groupBy("qid")
            .agg(F.count("*").alias("n"), F.max("d2").alias("kth"))
            .collect()
        }
        # exactness: k found and kth distance strictly inside the explored
        # ring, OR the ring already covers the whole grid
        guarantee = float("inf") if full_cover else (ring * cell_w_deg) ** 2
        done = [
            qid
            for qid in list(pending)
            if full_cover
            or (
                summary.get(qid, (0, None))[0] >= k
                and summary[qid][1] < guarantee
            )
        ]
        if done:
            results.append(topk.filter(F.col("qid").isin(done)).drop("d2"))
            for qid in done:
                del pending[qid]
        ring = min(ring * 2, nx)

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
