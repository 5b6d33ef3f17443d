"""Hierarchical quadtree cell index ("quadcell") — the engine's headline
spatial index, alongside the reference-parity XYGrid.

This is a Morton/Z-order quadkey on the equirectangular plane (the public
Bing-Maps "quadkey" / S2-cell-style construction): at level L the world is a
2^L x 2^L grid over lon in [-180,180], lat in [-90,90]; the cell id
interleaves the x/y bits so that (a) a parent cell's id is a 2-bit prefix of
its children (cheap multi-resolution rollup via bit shifts — no joins) and
(b) ids are spatially clustered (good for range pruning and partition
locality at 100 TB scale).

Packing: ``qcell = (level << 58) | morton`` with level in 0..29, so the
whole hierarchy fits one int64 and ``parent = ((l-1) << 58) | (m >> 2)`` is
pure arithmetic, expressible as JVM-side Spark column ops
(``F.shiftleft``/``F.shiftright``) — see operators/tiling.py.

If the ``h3`` package is available we additionally expose true H3 ids
(oshdb_spark.operators.tiling.with_h3); it is absent in this container, so
quadcell is the default hierarchical index.

No counterpart in the reference (it has only the equal-degree XYGrid —
oshdb/src/main/java/org/heigit/ohsome/oshdb/index/XYGrid.java); this is the
scale-path index the north rule asks for.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 29

_OSM_180 = 1_800_000_000
_OSM_90 = 900_000_000


def _spread_bits32(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 so bit i moves to bit 2i."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def quadcell_id_vec(
    level: int, lon_osm: np.ndarray, lat_osm: np.ndarray
) -> np.ndarray:
    """Vectorized quadcell id for fixed-point OSM coordinates.

    Border rule matches XYGrid (north-eastern cell; +180 wraps to -180;
    north pole -> northernmost row) so the two indexes agree on edge
    placement.  Out-of-range coords -> -1.
    """
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in 0..{MAX_LEVEL}")
    n = np.int64(1 << level)
    lon = lon_osm.astype(np.int64, copy=True)
    lat = lat_osm.astype(np.int64, copy=True)
    outside = (lon > _OSM_180) | (lon < -_OSM_180) | (lat > _OSM_90) | (lat < -_OSM_90)
    lon = lon + _OSM_180
    lat = lat + _OSM_90
    lon[lon == 3_600_000_000] = 0
    x = (lon * n) // 3_600_000_000
    y = (lat * n) // 1_800_000_000
    np.clip(y, 0, n - 1, out=y)  # pole rule
    morton = _spread_bits32(x.astype(np.uint64)) | (
        _spread_bits32(y.astype(np.uint64)) << np.uint64(1)
    )
    out = (np.int64(level) << np.int64(58)) | morton.astype(np.int64)
    out[outside] = -1
    return out


def quadcell_parent(qcell: int, steps: int = 1) -> int:
    """Parent cell `steps` levels up — pure bit arithmetic."""
    level = qcell >> 58
    morton = qcell & ((1 << 58) - 1)
    if steps > level:
        raise ValueError("cannot go above level 0")
    return ((level - steps) << 58) | (morton >> (2 * steps))


def quadcell_token(qcell: int) -> str:
    """Human-readable base-4 quadkey string, e.g. '1320...' (one digit/level)."""
    level = qcell >> 58
    morton = qcell & ((1 << 58) - 1)
    digits = []
    for i in range(level):
        digits.append(str((morton >> (2 * (level - 1 - i))) & 3))
    return "".join(digits) or "root"


def quadcell_to_bbox(qcell: int) -> tuple[float, float, float, float]:
    """Cell bbox in WGS84 degrees (minlon, minlat, maxlon, maxlat)."""
    level = qcell >> 58
    morton = qcell & ((1 << 58) - 1)
    x = y = 0
    for i in range(level):
        x |= ((morton >> (2 * i)) & 1) << i
        y |= ((morton >> (2 * i + 1)) & 1) << i
    n = 1 << level
    return (
        x / n * 360.0 - 180.0,
        y / n * 180.0 - 90.0,
        (x + 1) / n * 360.0 - 180.0,
        (y + 1) / n * 180.0 - 90.0,
    )


def quadcell_range_for_bbox(
    level: int, minlon: float, minlat: float, maxlon: float, maxlat: float
) -> list[tuple[int, int]]:
    """Morton-id ranges covering a bbox at `level` (driver-side pruning).

    Walks rows of the covering x/y rectangle and emits each row's cells as
    merged runs of consecutive morton codes.  Used to push quadcell
    predicates down to parquet/Iceberg scans.
    """
    n = 1 << level
    x0 = max(0, min(n - 1, int((minlon + 180.0) / 360.0 * n)))
    x1 = max(0, min(n - 1, int((maxlon + 180.0) / 360.0 * n)))
    y0 = max(0, min(n - 1, int((minlat + 90.0) / 180.0 * n)))
    y1 = max(0, min(n - 1, int((maxlat + 90.0) / 180.0 * n)))
    xs = np.arange(x0, x1 + 1, dtype=np.uint64)
    sx = _spread_bits32(xs)
    ranges: list[tuple[int, int]] = []
    base = np.int64(level) << np.int64(58)
    for y in range(y0, y1 + 1):
        sy = int(_spread_bits32(np.array([y], dtype=np.uint64))[0] << np.uint64(1))
        ids = np.sort((sx | np.uint64(sy)).astype(np.int64)) | base
        # merge consecutive ids into runs
        if len(ids) == 0:
            continue
        breaks = np.where(np.diff(ids) != 1)[0]
        starts = np.concatenate(([0], breaks + 1))
        ends = np.concatenate((breaks, [len(ids) - 1]))
        ranges.extend((int(ids[s]), int(ids[e])) for s, e in zip(starts, ends))
    return sorted(ranges)
