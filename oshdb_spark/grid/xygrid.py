"""Equal-degree XYGrid tiling — bit-parity port of the reference semantics.

Reference (GIScience/oshdb, read at /root/reference):
  * oshdb/src/main/java/org/heigit/ohsome/oshdb/index/XYGrid.java:46-425
  * oshdb/src/main/java/org/heigit/ohsome/oshdb/index/XYGridTree.java:19-276
  * oshdb/src/main/java/org/heigit/ohsome/oshdb/util/CellId.java:37-56
  * oshdb/src/main/java/org/heigit/ohsome/oshdb/osm/OSMCoordinates.java:9-12
  * oshdb/src/main/java/org/heigit/ohsome/oshdb/OSHDB.java:6  (MAXZOOM = 14)

Semantics preserved bit-for-bit (see tests/test_xygrid.py, ported from the
reference's XYGridTest / XYGridTreeTest):
  * coordinates are 1e-7 fixed-point integers ("OSM coordinates");
  * a zoom-z grid has 2^z columns x 2^(z-1) rows; cell id = y * 2^z + x;
  * coordinates on a cell border go to the north-eastern cell;
  * longitude +180 wraps to -180; the North Pole goes to the northernmost row;
  * out-of-range coordinates map to cell -1;
  * an entity is *inserted* at the deepest zoom where its bounding box spans
    <= 2 cells (XYGridTree.getInsertId);
  * a query bbox expands to per-row contiguous id ranges per zoom level, with
    `enlarge=True` growing one cell to the south-west so features stored in a
    neighbouring cell but extending into the query area are found.

All scalar functions mirror the Java double/int arithmetic exactly (Java
`(int)`/`(long)` casts truncate toward zero, like Python's ``int()`` and
``numpy.trunc``).  Vectorized variants (numpy, used from pandas UDFs) share
the same code paths.
"""

from __future__ import annotations

import math
from typing import Iterable, Iterator

import numpy as np

# OSMCoordinates.java:9-12
GEOM_PRECISION_TO_LONG = 1e7
GEOM_PRECISION = 1.0 / GEOM_PRECISION_TO_LONG

# OSHDB.java:6
MAXZOOM = 14

_OSM_180 = 1_800_000_000  # toOSM(180.0)
_OSM_90 = 900_000_000  # toOSM(90.0)


def to_osm(value: float) -> int:
    """WGS84 degree -> 1e-7 fixed-point int (truncating, OSMCoordinates.toOSM)."""
    return int(value * GEOM_PRECISION_TO_LONG)


def to_wgs84(value: int) -> float:
    return value * GEOM_PRECISION


def get_level_id(zoom: int, cell_id: int) -> int:
    """Pack (zoom, id) into one long — CellId.getLevelId (CellId.java:37-39)."""
    return (zoom << 56) | cell_id


def from_level_id(level_id: int) -> tuple[int, int]:
    """Unpack a packed level id — CellId.fromLevelId (CellId.java:48-52)."""
    return (level_id >> 56) & 0xFF, level_id & 0x00FF_FFFF_FFFF_FFFF


class XYGrid:
    """One zoom level of the equal-degree grid (XYGrid.java:46-425)."""

    def __init__(self, zoom: int):
        if zoom > 30:
            zoom = 30
        elif zoom < 0:
            zoom = 0
        self.zoom = zoom
        self.zoompow = 1 << zoom
        # XYGrid.java:115 — double arithmetic, kept as float
        self.cell_width = 360.0 / self.zoompow * GEOM_PRECISION_TO_LONG

    # -- point -> cell -----------------------------------------------------
    def get_id(self, lon_osm: int, lat_osm: int) -> int:
        """Covering tile of an OSM fixed-point coordinate (XYGrid.java:140-168).

        Border -> north-eastern cell; +180 wraps; pole -> northernmost row;
        out of range -> -1.
        """
        if (
            lon_osm > _OSM_180
            or lon_osm < -_OSM_180
            or lat_osm > _OSM_90
            or lat_osm < -_OSM_90
        ):
            return -1
        lon = lon_osm + _OSM_180
        lat = lat_osm + _OSM_90
        if lon == 3_600_000_000:
            lon = 0
        if lat == 1_800_000_000:
            lat -= 1
        x = int(lon / self.cell_width)
        y = int(lat / self.cell_width)
        return y * self.zoompow + x

    def get_id_deg(self, lon: float, lat: float) -> int:
        return self.get_id(to_osm(lon), to_osm(lat))

    # -- cell -> bbox ------------------------------------------------------
    def cell_dimensions(self, cell_id: int) -> tuple[int, int, int, int]:
        """Cell bbox in OSM coords (minlon, minlat, maxlon, maxlat).

        XYGrid.java:196-221 — note the asymmetric max edges (max = next cell
        min - 1) and the special northernmost row / zoom-0 latitude handling.
        """
        x = cell_id % self.zoompow
        y = (cell_id - x) // self.zoompow
        lon = int(x * self.cell_width - _OSM_180)
        lat = int(y * self.cell_width - _OSM_90)
        minlong = lon
        maxlong = int(lon + self.cell_width) - 1
        if self.zoom == 0:
            minlat = -_OSM_90
            maxlat = _OSM_90
        elif lat == _OSM_90 - self.cell_width:
            minlat = lat
            maxlat = _OSM_90
        else:
            minlat = lat
            maxlat = int(lat + self.cell_width) - 1
        return (minlong, minlat, maxlong, maxlat)

    # -- bbox -> estimated cell count ---------------------------------------
    def estimated_id_count(self, bbox: tuple[int, int, int, int]) -> int:
        """max(cols, rows) spanned by bbox (XYGrid.java:229-236)."""
        minlon, minlat, maxlon, maxlat = bbox
        return max(
            int(math.ceil(maxlon / self.cell_width))
            - int(math.floor(minlon / self.cell_width)),
            int(math.ceil(maxlat / self.cell_width))
            - int(math.floor(minlat / self.cell_width)),
        )

    # -- bbox -> cell id ranges ---------------------------------------------
    def bbox2_cell_id_ranges(
        self, bbox: tuple[int, int, int, int], enlarge: bool
    ) -> list[tuple[int, int]]:
        """Per-row contiguous cell-id ranges covering bbox (XYGrid.java:316-400).

        Handles out-of-bounds coords (adds the (-1,-1) garbage range),
        anti-meridian-crossing bboxes (split), and the `enlarge` grow-one-
        cell-south-west rule used for insert-time cell lookup.
        """
        result: set[tuple[int, int]] = set()
        minlon, minlat, maxlon, maxlat = bbox
        if minlat > maxlat:
            return []
        if minlon < -_OSM_180 or minlon > _OSM_180:
            result.add((-1, -1))
            minlon = -_OSM_180
        if minlat < -_OSM_90 or minlat > _OSM_90:
            result.add((-1, -1))
            minlat = -_OSM_90
        if maxlon > _OSM_180 or maxlon < -_OSM_180:
            result.add((-1, -1))
            maxlon = _OSM_180
        if maxlat > _OSM_90 or maxlat < -_OSM_90:
            result.add((-1, -1))
            maxlat = _OSM_90

        if minlon == _OSM_180:
            minlon = _OSM_180 - 1
        if maxlon == _OSM_180:
            maxlon = _OSM_180 - 1
        if minlat == _OSM_90:
            minlat = _OSM_90 - 1
        if maxlat == _OSM_90:
            maxlat = _OSM_90 - 1

        # anti-meridian-crossing bbox: split (XYGrid.java:369-374)
        if minlon > maxlon:
            result.update(
                self.bbox2_cell_id_ranges(
                    (minlon, minlat, _OSM_180 - 1, maxlat), enlarge
                )
            )
            minlon = -_OSM_180

        columnmin = int((minlon + _OSM_180) / self.cell_width)
        columnmax = int((maxlon + _OSM_180) / self.cell_width)
        rowmin = int((minlat + _OSM_90) / self.cell_width)
        rowmax = int((maxlat + _OSM_90) / self.cell_width)

        if enlarge:
            # features can't span the dateline, so enlargement stops at col 0
            if columnmin > 0:
                columnmin -= 1
            if rowmin > 0:
                rowmin -= 1
        for row in range(rowmin, rowmax + 1):
            result.add((row * self.zoompow + columnmin, row * self.zoompow + columnmax))
        return sorted(result)

    def bbox2_cell_rects(
        self, bbox: tuple[int, int, int, int], enlarge: bool
    ) -> tuple[bool, list[tuple[int, int, int, int]]]:
        """Covered cells as (colmin, colmax, rowmin, rowmax) RECTANGLES.

        Same normalization/split/enlarge semantics as bbox2_cell_id_ranges
        (XYGrid.java:316-400) but O(1) output per zoom: the per-row ranges
        all share the same column span, so the whole cover is one rectangle
        (two if the bbox crosses the anti-meridian).  Returns
        (has_garbage_range, rects); has_garbage marks out-of-bounds input
        coords (the reference's (-1,-1) range).  Used to build constant-size
        pushdown predicates instead of enumerating thousands of row ranges.
        """
        garbage = False
        rects: list[tuple[int, int, int, int]] = []
        minlon, minlat, maxlon, maxlat = bbox
        if minlat > maxlat:
            return False, []
        if minlon < -_OSM_180 or minlon > _OSM_180:
            garbage = True
            minlon = -_OSM_180
        if minlat < -_OSM_90 or minlat > _OSM_90:
            garbage = True
            minlat = -_OSM_90
        if maxlon > _OSM_180 or maxlon < -_OSM_180:
            garbage = True
            maxlon = _OSM_180
        if maxlat > _OSM_90 or maxlat < -_OSM_90:
            garbage = True
            maxlat = _OSM_90

        if minlon == _OSM_180:
            minlon = _OSM_180 - 1
        if maxlon == _OSM_180:
            maxlon = _OSM_180 - 1
        if minlat == _OSM_90:
            minlat = _OSM_90 - 1
        if maxlat == _OSM_90:
            maxlat = _OSM_90 - 1

        spans = []
        if minlon > maxlon:  # anti-meridian split (XYGrid.java:369-374)
            spans.append((minlon, _OSM_180 - 1))
            spans.append((-_OSM_180, maxlon))
        else:
            spans.append((minlon, maxlon))

        rowmin = int((minlat + _OSM_90) / self.cell_width)
        rowmax = int((maxlat + _OSM_90) / self.cell_width)
        if enlarge and rowmin > 0:
            rowmin -= 1
        for lo, hi in spans:
            columnmin = int((lo + _OSM_180) / self.cell_width)
            columnmax = int((hi + _OSM_180) / self.cell_width)
            if enlarge and columnmin > 0:
                columnmin -= 1
            rects.append((columnmin, columnmax, rowmin, rowmax))
        return garbage, rects

    def neighbours(self, cell_id: int) -> list[tuple[int, int]]:
        """3x3 ring around a cell, as id ranges (XYGrid.java:409-423)."""
        minlon, minlat, maxlon, maxlat = self.cell_dimensions(cell_id)
        return self.bbox2_cell_id_ranges(
            (minlon - 1, minlat - 1, maxlon + 1, maxlat + 1), False
        )

    def ring(self, cell_id: int, r: int) -> list[tuple[int, int]]:
        """Generalized ring: all cells within Chebyshev distance r.

        Extension of getNeighbours (XYGrid.java:409-423) used by kNN
        ring-expansion (SURVEY.md §2.3); r=1 == neighbours().
        """
        if r == 0:
            return [(cell_id, cell_id)]
        minlon, minlat, maxlon, maxlat = self.cell_dimensions(cell_id)
        w = int(self.cell_width)
        return self.bbox2_cell_id_ranges(
            (
                minlon - (r - 1) * w - 1,
                minlat - (r - 1) * w - 1,
                maxlon + (r - 1) * w + 1,
                maxlat + (r - 1) * w + 1,
            ),
            False,
        )


class XYGridTree:
    """Multi-zoom pyramid, levels 0..maxzoom (XYGridTree.java:19-276)."""

    def __init__(self, maxzoom: int = MAXZOOM):
        self.max_level = maxzoom
        self.grids = [XYGrid(z) for z in range(maxzoom + 1)]

    def get_ids(self, lon_osm: int, lat_osm: int) -> list[tuple[int, int]]:
        """(zoom, cell_id) of a point at every level (XYGridTree.java:48-72)."""
        return [(g.zoom, g.get_id(lon_osm, lat_osm)) for g in self.grids]

    def get_insert_id(
        self, bbox: tuple[int, int, int, int]
    ) -> tuple[int, int] | None:
        """Deepest zoom where bbox spans <= 2 cells (XYGridTree.java:93-100)."""
        for i in range(self.max_level, -1, -1):
            if self.grids[i].estimated_id_count(bbox) <= 2:
                return (i, self.grids[i].get_id(bbox[0], bbox[1]))
        return None

    def bbox2_cell_ids(
        self, bbox: tuple[int, int, int, int], enlarge: bool
    ) -> Iterator[tuple[int, int]]:
        """All (zoom, cell_id) pairs covering bbox at every level."""
        for zoom, ranges in self.bbox2_cell_id_ranges(bbox, enlarge):
            for start, end in ranges:
                for cid in range(start, end + 1):
                    yield (zoom, cid)

    def bbox2_cell_id_ranges(
        self, bbox: tuple[int, int, int, int], enlarge: bool
    ) -> Iterable[tuple[int, list[tuple[int, int]]]]:
        """Per-zoom list of cell-id ranges (XYGridTree.java:246-274)."""
        for g in self.grids:
            yield (g.zoom, g.bbox2_cell_id_ranges(bbox, enlarge))


# ---------------------------------------------------------------------------
# Vectorized (numpy) kernels — used inside pandas UDFs; one numpy op sequence
# per Arrow batch, no per-row Python.
# ---------------------------------------------------------------------------


def xy_cell_id_vec(zoom: int, lon_osm: np.ndarray, lat_osm: np.ndarray) -> np.ndarray:
    """Vectorized XYGrid.getId (XYGrid.java:140-168). int64 in, int64 out."""
    zoompow = np.int64(1 << zoom)
    cell_width = 360.0 / (1 << zoom) * GEOM_PRECISION_TO_LONG
    lon = lon_osm.astype(np.int64, copy=True)
    lat = lat_osm.astype(np.int64, copy=True)
    outside = (lon > _OSM_180) | (lon < -_OSM_180) | (lat > _OSM_90) | (lat < -_OSM_90)
    lon = lon + _OSM_180
    lat = lat + _OSM_90
    lon[lon == 3_600_000_000] = 0
    lat[lat == 1_800_000_000] -= 1
    x = np.trunc(lon / cell_width).astype(np.int64)
    y = np.trunc(lat / cell_width).astype(np.int64)
    out = y * zoompow + x
    out[outside] = -1
    return out


def _estimated_id_count_vec(
    zoom: int,
    minlon: np.ndarray,
    minlat: np.ndarray,
    maxlon: np.ndarray,
    maxlat: np.ndarray,
) -> np.ndarray:
    """Vectorized XYGrid.getEstimatedIdCount (XYGrid.java:229-236)."""
    cell_width = 360.0 / (1 << zoom) * GEOM_PRECISION_TO_LONG
    cols = np.ceil(maxlon / cell_width).astype(np.int64) - np.floor(
        minlon / cell_width
    ).astype(np.int64)
    rows = np.ceil(maxlat / cell_width).astype(np.int64) - np.floor(
        minlat / cell_width
    ).astype(np.int64)
    return np.maximum(cols, rows)


def xy_insert_cell_vec(
    minlon: np.ndarray,
    minlat: np.ndarray,
    maxlon: np.ndarray,
    maxlat: np.ndarray,
    maxzoom: int = MAXZOOM,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized XYGridTree.getInsertId (XYGridTree.java:93-100).

    Returns (zoom, cell_id) int64 arrays: per entity-lifetime bbox, the
    deepest zoom where the bbox spans <= 2 cells, and the cell id of the
    bbox's south-west corner at that zoom.  Entities whose bbox spans more
    than 2 cells even at zoom 0 (cannot happen for valid coords) get (-1,-1).
    """
    n = len(minlon)
    out_zoom = np.full(n, -1, dtype=np.int64)
    out_id = np.full(n, -1, dtype=np.int64)
    unassigned = np.ones(n, dtype=bool)
    for z in range(maxzoom, -1, -1):
        if not unassigned.any():
            break
        cnt = _estimated_id_count_vec(z, minlon, minlat, maxlon, maxlat)
        take = unassigned & (cnt <= 2)
        if take.any():
            out_zoom[take] = z
            out_id[take] = xy_cell_id_vec(z, minlon[take], minlat[take])
            unassigned &= ~take
    return out_zoom, out_id
