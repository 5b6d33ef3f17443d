"""Witness tests for operators/tiling.bbox_cover_ranges: the distributed
bulk XYGridTree.bbox2CellIdRanges plan must agree bit-for-bit with the
Python XYGridTree port (grid/xygrid.py, itself gated against the
reference's XYGridTest/XYGridTreeTest vectors in tests/test_xygrid.py),
for both enlarge modes, across every normalization edge case."""

from __future__ import annotations

import numpy as np
import pytest

from oshdb_spark.grid.xygrid import XYGridTree
from oshdb_spark.operators.tiling import bbox_cover_ranges

CASES = [
    (1, -100_000_000, 300_000_000, 400_000_000, 700_000_000),  # normal
    (2, -100_000_000, 300_000_000, 400_000_000, 950_000_000),  # maxlat OOB
    (3, 1_700_000_000, -100_000_000, -1_700_000_000, 100_000_000),  # dateline
    (4, 1_750_000_000, 0, 1_800_000_000, 50_000_000),  # +180 border
    (5, 0, 100, 100, 50),  # minlat > maxlat -> empty
    (6, -1_900_000_000, -950_000_000, 1_900_000_000, 950_000_000),  # all OOB
    (7, -1_800_000_000, -900_000_000, 1_800_000_000, 900_000_000),  # world
    (8, 0, 0, 0, 0),  # degenerate point
]


def _lib(cases, enlarge):
    tree = XYGridTree()
    out = set()
    for bid, *bbox in cases:
        for zoom, ranges in tree.bbox2_cell_id_ranges(tuple(bbox), enlarge):
            for s, e in ranges:
                out.add((bid, zoom, s, e))
    return out


@pytest.mark.parametrize("enlarge", [True, False])
def test_cover_matches_library(spark, enlarge):
    df = spark.createDataFrame(
        CASES, "bid long, minlon long, minlat long, maxlon long, maxlat long"
    )
    got = set(
        (r.bid, r.zoom, r.range_start, r.range_end)
        for r in bbox_cover_ranges(df, enlarge=enlarge).collect()
    )
    assert got == _lib(CASES, enlarge)


def test_cover_random_boxes(spark):
    rs = np.random.RandomState(42)
    cases = []
    for i in range(40):
        lons = sorted(int(v) for v in rs.randint(-1_900_000_000, 1_900_000_000, 2))
        lats = sorted(int(v) for v in rs.randint(-950_000_000, 950_000_000, 2))
        if rs.rand() < 0.3:  # force some dateline crossings / empties
            lons = lons[::-1]
        if rs.rand() < 0.2:
            lats = lats[::-1]
        cases.append((i, lons[0], lats[0], lons[1], lats[1]))
    df = spark.createDataFrame(
        cases, "bid long, minlon long, minlat long, maxlon long, maxlat long"
    )
    # zoom capped so random world-spanning boxes stay small
    got = set(
        (r.bid, r.zoom, r.range_start, r.range_end)
        for r in bbox_cover_ranges(df, maxzoom=8, enlarge=True).collect()
    )
    tree = XYGridTree(maxzoom=8)
    want = set()
    for bid, *bbox in cases:
        for zoom, ranges in tree.bbox2_cell_id_ranges(tuple(bbox), True):
            for s, e in ranges:
                want.add((bid, zoom, s, e))
    assert got == want
