"""XYGrid corner-case tests, ported from the reference test suite:
/root/reference/oshdb/src/test/java/org/heigit/ohsome/oshdb/index/XYGridTest.java
/root/reference/oshdb/src/test/java/org/heigit/ohsome/oshdb/index/XYGridTreeTest.java
"""

import numpy as np
import pytest

from oshdb_spark.grid import (
    XYGrid,
    XYGridTree,
    from_level_id,
    get_level_id,
    to_osm,
    xy_cell_id_vec,
    xy_insert_cell_vec,
)
from oshdb_spark.grid.xygrid import GEOM_PRECISION


def bbox_wgs84(minlon, minlat, maxlon, maxlat):
    return (to_osm(minlon), to_osm(minlat), to_osm(maxlon), to_osm(maxlat))


ZERO = XYGrid(0)
TWO = XYGrid(2)
THIRTY = XYGrid(30)


# --- getId ------------------------------------------------------- XYGridTest

@pytest.mark.parametrize(
    "grid,lon,lat,expected",
    [
        (TWO, 0.0, 0.0, 6),                      # testGetId_double_double
        (TWO, -181.0, -91.0, -1),                # testnegneg181_neg91_2
        (ZERO, -180.0, -90.0, 0),                # testneg180_neg90_0
        (ZERO, 180.0, 90.0, 0),                  # test180_90_0 (wrap + pole)
        (ZERO, 179.0, 90.0, 0),                  # test179_90_0
        (TWO, -180.0, -90.0, 0),                 # testneg180_neg90_2
        (TWO, 180.0, 90.0, 4),                   # test180_90_2
        (TWO, 180.0 - GEOM_PRECISION, 90.0, 7),  # test179_90_2
        (THIRTY, -180.0, -90.0, 0),              # testneg180_neg90_30
        (THIRTY, 180.0, 90.0, 576460751229681664),   # test180_90_30
        (THIRTY, 180.0 - GEOM_PRECISION, 90.0, 576460752303423487),  # test179_90_30
    ],
)
def test_get_id(grid, lon, lat, expected):
    assert grid.get_id_deg(lon, lat) == expected
    # the vectorized kernel must agree bit-for-bit
    vec = xy_cell_id_vec(
        grid.zoom,
        np.array([to_osm(lon)], dtype=np.int64),
        np.array([to_osm(lat)], dtype=np.int64),
    )
    assert int(vec[0]) == expected


def test_zoom_clamping():
    # testneg180_neg90_31 / test180_90_neg1: zoom clamps to [0, 30]
    assert XYGrid(31).get_id_deg(-180.0, -90.0) == 0
    assert XYGrid(31).zoom == 30
    assert XYGrid(-1).get_id_deg(180.0, 90.0) == 0
    assert XYGrid(-1).zoom == 0


def test_get_id_bounding_box():
    # testGetId_BoundingBox — id of a bbox = id of its SW corner
    assert TWO.get_id(*bbox_wgs84(-10.0, -10.0, 10.0, 10.0)[:2]) == 1
    # dateline-crossing bbox: still the (min) corner
    assert TWO.get_id(*bbox_wgs84(10.0, -10.0, -9.0, 10.0)[:2]) == 2


def test_get_cell_width():
    assert TWO.cell_width * GEOM_PRECISION == 90


# --- getCellDimensions -------------------------------------------------------

@pytest.mark.parametrize(
    "grid,cell_id,expected",
    [
        (TWO, 0, bbox_wgs84(-180.0, -90.0, -90.0 - GEOM_PRECISION, 0.0 - GEOM_PRECISION)),
        (TWO, 6, bbox_wgs84(0.0, 0.0, 90.0 - GEOM_PRECISION, 90.0)),
        (TWO, 7, bbox_wgs84(90.0, 0.0, 180.0 - GEOM_PRECISION, 90.0)),
        (ZERO, 0, bbox_wgs84(-180.0, -90.0, 180.0 - GEOM_PRECISION, 90.0)),
        (XYGrid(1), 0, bbox_wgs84(-180.0, -90.0, 0.0 - GEOM_PRECISION, 90.0)),
    ],
)
def test_get_cell_dimensions(grid, cell_id, expected):
    assert grid.cell_dimensions(cell_id) == expected


# --- getEstimatedIdCount ------------------------------------------------------

def test_get_estimated_id_count():
    assert TWO.estimated_id_count(bbox_wgs84(0.0, 0.0, 89.0, 89.0)) == 1
    assert TWO.estimated_id_count(bbox_wgs84(-89.0, -90.0, 89.0, 90.0)) == 2
    assert THIRTY.estimated_id_count(bbox_wgs84(0.0, 0.0, 0.0000053, 0.0000053)) == 16
    # "just" touching three cells (GIScience/oshdb#183)
    assert TWO.estimated_id_count(bbox_wgs84(-0.1, 0.0, 90.1, 89.0)) == 3


# --- bbox2CellIdRanges --------------------------------------------------------

def _materialize(ranges):
    out = set()
    for start, end in ranges:
        out.update(range(start, end + 1))
    return out


def test_bbox2_ids():
    assert ZERO.bbox2_cell_id_ranges(bbox_wgs84(-180, -90, 180, 90), False) == [(0, 0)]

    r = TWO.bbox2_cell_id_ranges(bbox_wgs84(-180, -90, 180, 90), False)
    assert len(r) == 2
    assert r[0] == (0, 3)

    assert ZERO.bbox2_cell_id_ranges(bbox_wgs84(-10, -10, 10, 10), False) == [(0, 0)]
    # dateline-crossing
    assert ZERO.bbox2_cell_id_ranges(bbox_wgs84(179.0, 0.0, 89.0, 5.0), False) == [(0, 0)]

    assert _materialize(
        TWO.bbox2_cell_id_ranges(bbox_wgs84(-10, -10, 10, 10), False)
    ) == {1, 2, 5, 6}
    assert _materialize(
        TWO.bbox2_cell_id_ranges(bbox_wgs84(-180.0, 0.0, 89.0, 5.0), False)
    ) == {4, 5, 6}
    # dateline-crossing southern hemisphere
    assert _materialize(
        TWO.bbox2_cell_id_ranges(bbox_wgs84(90.0, -90.0, 89.0, -1.0), False)
    ) == {0, 1, 2, 3}

    assert len(TWO.bbox2_cell_id_ranges(TWO.cell_dimensions(0), False)) == 1


def test_neighbours():
    # center cell 5 at zoom 2: 3x3 ring clipped at the pole; cells on the
    # grid edge additionally get the (-1,-1) garbage range (XYGrid.java:407)
    assert _materialize(TWO.neighbours(5)) == {-1, 0, 1, 2, 4, 5, 6}
    grid4 = XYGrid(4)
    # interior cell at zoom 4 (16 cols x 8 rows): full 3x3 ring, no -1
    assert _materialize(grid4.neighbours(35)) == {18, 19, 20, 34, 35, 36, 50, 51, 52}
    # ring r=2 is the 5x5 block
    assert _materialize(grid4.ring(35, 2)) == {
        r * 16 + c for r in range(0, 5) for c in range(1, 6)
    }


# --- XYGridTree ----------------------------------------------------------

def test_tree_get_ids():
    tree = XYGridTree(4)
    cell_ids = set(tree.get_ids(to_osm(0.1), to_osm(0.1)))
    assert cell_ids == {(0, 0), (1, 1), (2, 6), (3, 20), (4, 72)}


def test_tree_get_insert_id():
    tree = XYGridTree(4)
    assert tree.get_insert_id(bbox_wgs84(0.0, -90.0, 179.0, 90.0)) == (2, 2)
    assert tree.get_insert_id(bbox_wgs84(0.0, -90.0, 0.1, 90.0)) == (2, 2)
    assert tree.get_insert_id(bbox_wgs84(0.0, -90.0, 179.0, -89.9)) == (2, 2)


def test_tree_insert_id_vectorized_parity():
    tree = XYGridTree(4)
    boxes = [
        bbox_wgs84(0.0, -90.0, 179.0, 90.0),
        bbox_wgs84(0.0, -90.0, 0.1, 90.0),
        bbox_wgs84(0.0, -90.0, 179.0, -89.9),
        bbox_wgs84(8.0, 49.0, 8.1, 49.1),
        bbox_wgs84(-0.0001, -0.0001, 0.0001, 0.0001),
    ]
    arr = np.array(boxes, dtype=np.int64)
    zooms, ids = xy_insert_cell_vec(arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], 4)
    for i, b in enumerate(boxes):
        assert (int(zooms[i]), int(ids[i])) == tree.get_insert_id(b)


def test_tree_bbox2_cell_ids():
    tree = XYGridTree(3)
    got = set(tree.bbox2_cell_ids(bbox_wgs84(0.0, 0.0, 44.9, 44.9), False))
    assert got == {(3, 20), (2, 6), (1, 1), (0, 0)}

    got = set(tree.bbox2_cell_ids(bbox_wgs84(0.0, 0.0, 89.0, 89.0), True))
    assert got == {
        (3, 12), (3, 11), (3, 13), (3, 19), (3, 20), (3, 21), (3, 27), (3, 28),
        (3, 29), (2, 1), (2, 2), (2, 5), (2, 6), (1, 1), (1, 0), (0, 0),
    }


# --- levelId packing (CellId.java:37-52) -----------------------------------

def test_level_id_roundtrip():
    # packing is used for zoom <= MAXZOOM(14) where id < 2^27 << 2^56
    # (same constraint as the reference: CellId.java:37-39)
    for zoom, cid in [(0, 0), (2, 6), (14, 536870911), (14, (1 << 27) - 1)]:
        packed = get_level_id(zoom, cid)
        assert from_level_id(packed) == (zoom, cid)
    assert get_level_id(2, 6) == (2 << 56) | 6


# ---------------------------------------------------------------------------
# rectangle cover == per-row range cover (cell_rect_filter basis)
# ---------------------------------------------------------------------------


def test_rects_equal_ranges():
    from oshdb_spark.grid.xygrid import XYGrid

    bboxes = [
        (-600_000_000, -400_000_000, 600_000_000, 400_000_000),
        (1_700_000_000, -100_000_000, -1_700_000_000, 100_000_000),  # dateline
        (-1_800_000_000, -900_000_000, 1_800_000_000, 900_000_000),  # world
        (86_000_000, 493_000_000, 90_000_000, 500_000_000),  # small
        (-1_900_000_000, -400_000_000, 0, 400_000_000),  # out-of-range lon
    ]
    for zoom in (0, 1, 3, 7, 12, 14):
        g = XYGrid(zoom)
        for bbox in bboxes:
            for enlarge in (False, True):
                ranges = set(g.bbox2_cell_id_ranges(bbox, enlarge))
                garbage, rects = g.bbox2_cell_rects(bbox, enlarge)
                from_rects = set()
                if garbage:
                    from_rects.add((-1, -1))
                for cmin, cmax, rmin, rmax in rects:
                    for r in range(rmin, rmax + 1):
                        from_rects.add((r * g.zoompow + cmin, r * g.zoompow + cmax))
                assert from_rects == ranges, (zoom, bbox, enlarge)
