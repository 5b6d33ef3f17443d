"""Snapshot view over GeometryCollection relations with polygon AOIs.

1:1 semantic port of IterateByTimestampNotOsmTypeSpecificTest.java
(reference oshdb-util celliterator, data
different-timestamps/not-osm-type-specific.osm): the snapshot view driven
with yearly timestamps 2000..2018 and a polygon area-of-interest must

* return nothing when the AOI polygon misses all entities
  (testCellOutsidePolygon, :85-113 — the reference exercises this via a
  grid cell whose bbox misses the polygon; the engine's equivalent
  observable is an empty snapshot result, with cell-range pruning itself
  covered by the tiling/pruned-scan tests),
* return nothing when an entity-id prefilter matches no OSH entity even
  though the AOI covers the data (testCellCoveringPolygon, :116-143 —
  ``oshEntity -> oshEntity.getId() == 80`` with no id-80 relation), and
* return every alive relation when the AOI is the whole world
  (testCellFullyInsidePolygon, :146-174).

Fixture: history_polygon (different-timestamps/polygon.osm), the same
substitution the contribution-view sibling port uses
(tests/test_contribution_not_multipolygon.py) — versioned relations with
collection/multipolygon geometries around lon 7.3/lat 1.0 and the 516
family near the reference triangle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oshdb_spark.api import OSHDB, SnapshotView
from oshdb_spark.timestamps import timestamps as iso_timestamps

from tests.osmhistory_harness import spark_fixture

TRI = {"type": "Polygon", "coordinates": [[[10.8, 10.3], [12.7, 12.7],
                                           [12.7, 10.3], [10.8, 10.3]]]}
WORLD = {"type": "Polygon",
         "coordinates": [[[-180.0, -90.0], [180.0, -90.0], [180.0, 90.0],
                          [-180.0, 90.0], [-180.0, -90.0]]]}

YEARLY = [t // 1_000_000 for t in
          iso_timestamps("2000-01-01T00:00:00Z", "2018-01-01T00:00:00Z",
                         "P1Y")]


@pytest.fixture(scope="module")
def db(spark):
    rows, schema, tr = spark_fixture("history_polygon")
    return OSHDB(spark, spark.createDataFrame(rows, schema), translator=tr)


def _snap(db, polygon, rid=None):
    v = (SnapshotView.on(db)
         .timestamps(list(YEARLY))
         .osm_type("relation")
         .area_of_interest(polygon=polygon))
    if rid is not None:
        v = v.filter(F.col("id") == rid)
    return v.dataframe().collect()


def test_polygon_outside_data(db):
    # testCellOutsidePolygon analog: AOI far from every entity -> empty
    far = {"type": "Polygon", "coordinates": [[[50.0, 50.0], [52.0, 50.0],
                                               [52.0, 52.0], [50.0, 52.0],
                                               [50.0, 50.0]]]}
    assert _snap(db, far) == []


def test_id_prefilter_matches_nothing(db):
    # testCellCoveringPolygon: AOI covers the data but the OSH-level id
    # filter (id == 80) matches no relation -> empty
    assert _snap(db, TRI, rid=80) == []


def test_world_polygon_yields_snapshots(db):
    # testCellFullyInsidePolygon: whole-world polygon -> every alive
    # relation appears at every timestamp where a version is visible
    rows = _snap(db, WORLD)
    assert rows != []
    # relation 500 is created 2014 and alive through 2018 -> at least
    # the 2014..2017 yearly snapshots are present for it
    r500 = [r for r in rows if r["id"] == 500]
    assert len(r500) >= 3
    # snapshots land only on the query timestamps
    assert all(r["snap_ts"] in set(YEARLY) for r in rows)
