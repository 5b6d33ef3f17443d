"""Tests for the quadcell (Morton quadkey) hierarchical index."""

import numpy as np
import pytest

from oshdb_spark.grid.quadcell import (
    quadcell_id_vec,
    quadcell_parent,
    quadcell_range_for_bbox,
    quadcell_to_bbox,
    quadcell_token,
)


def qid(level, lon_deg, lat_deg):
    return int(
        quadcell_id_vec(
            level,
            np.array([int(lon_deg * 1e7)], dtype=np.int64),
            np.array([int(lat_deg * 1e7)], dtype=np.int64),
        )[0]
    )


def test_level0_single_cell():
    assert qid(0, 0.0, 0.0) == 0
    assert qid(0, -180.0, -90.0) == 0


def test_level1_quadrants():
    # level-1 packing: (1 << 58) | morton(x, y)
    base = 1 << 58
    assert qid(1, -90.0, -45.0) == base | 0b00  # SW: x=0,y=0
    assert qid(1, 90.0, -45.0) == base | 0b01   # SE: x=1,y=0
    assert qid(1, -90.0, 45.0) == base | 0b10   # NW: x=0,y=1
    assert qid(1, 90.0, 45.0) == base | 0b11    # NE: x=1,y=1


def test_border_rules_match_xygrid():
    # border -> north-eastern cell; +180 wraps; pole stays in top row
    assert qid(1, 0.0, 0.0) == (1 << 58) | 0b11  # on both borders -> NE
    assert qid(1, 180.0, 45.0) == (1 << 58) | 0b10  # wraps to x=0 (west)
    assert qid(1, 90.0, 90.0) == (1 << 58) | 0b11  # pole clamped to top row
    assert qid(1, 181.0, 0.0) == -1  # out of range


def test_parent_is_prefix():
    c = qid(10, 8.67, 49.39)  # Heidelberg
    p = quadcell_parent(c)
    assert p == qid(9, 8.67, 49.39)
    assert quadcell_parent(c, 10) == qid(0, 8.67, 49.39)


def test_token_and_bbox_roundtrip():
    c = qid(5, 8.67, 49.39)
    tok = quadcell_token(c)
    assert len(tok) == 5 and set(tok) <= set("0123")
    minlon, minlat, maxlon, maxlat = quadcell_to_bbox(c)
    assert minlon <= 8.67 < maxlon
    assert minlat <= 49.39 < maxlat


def test_range_for_bbox_covers_points():
    level = 8
    rng = quadcell_range_for_bbox(level, 8.0, 49.0, 9.0, 50.0)
    covered = set()
    for s, e in rng:
        covered.update(range(s, e + 1))
    rs = np.random.RandomState(42)
    lons = rs.uniform(8.0, 9.0, 200)
    lats = rs.uniform(49.0, 50.0, 200)
    ids = quadcell_id_vec(
        level,
        (lons * 1e7).astype(np.int64),
        (lats * 1e7).astype(np.int64),
    )
    assert set(ids.tolist()) <= covered


def test_vectorized_matches_scalar_path():
    rs = np.random.RandomState(7)
    lons = (rs.uniform(-180, 180, 500) * 1e7).astype(np.int64)
    lats = (rs.uniform(-90, 90, 500) * 1e7).astype(np.int64)
    ids = quadcell_id_vec(12, lons, lats)
    # verify morton decode puts every point back inside its cell bbox
    for i in range(0, 500, 50):
        minlon, minlat, maxlon, maxlat = quadcell_to_bbox(int(ids[i]))
        assert minlon * 1e7 <= lons[i] <= maxlon * 1e7 + 1
        assert minlat * 1e7 <= lats[i] <= maxlat * 1e7 + 1
