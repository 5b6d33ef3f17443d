"""Port of OSHDBFilterTest.java (oshdb-api/src/test/java/.../tests/):
filter-DSL integration through the fluent MapReducer chain.

The reference runs six "is the filter library wired in at all" checks
against its H2 extract (42 buildings in the test bbox at 2014-01-01,
plus one building relation with a non-polygon geometry). This port runs
the SAME query shapes over a deterministic fixture with the same counts:
42 closed building=yes ways (polygon geometry) created before 2014 and
one building=yes relation of a non-multipolygon type (GeometryCollection
-> geometry:other).

Covered 1:1 (OSHDBFilterTest.java line refs):
  testFilterString        (:59-74)  — string filter on both views, sum of 1s
  testFilterObject        (:76-83)  — pre-parsed filter node, count
  testAggregateFilter     (:85-95)  — aggregateBy(type) + geometry or-filter
  testFilterGroupByEntity (:107-122) — lambda vs string filter equality
  testFilterNonExistentTag (:124-138) — unknown key/value must not raise
  testFilterNotCrashDuringNormalize (:140-155) — an opaque raw-Column
      predicate (the lambda escape hatch, which bypasses DNF
      normalization) still runs; constant-false yields 0
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oshdb_spark.api import ContributionView, OSHDB, SnapshotView
from oshdb_spark.filters.dsl import TagTranslator, parse_filter
from oshdb_spark.timestamps import parse_iso

ENT_SCHEMA = (
    "doc_id string, id long, type string, version int, visible boolean, "
    "ts long, changeset long, uid int, tags map<int,int>, lon long, lat long, "
    "refs array<long>, members array<struct<type:string,ref:long,role:string>>"
)

K = {"building": 2, "type": 5, "name": 7}
V = {("building", "yes"): 1, ("type", "building"): 3}
TR = TagTranslator(keys=K, values=V)
BLD = {K["building"]: V[("building", "yes")]}
N_WAYS = 42
WORLD = (-180.0, -90.0, 180.0, 90.0)


def _t(iso: str) -> int:
    return parse_iso(iso) // 1_000_000


@pytest.fixture(scope="module")
def db(spark):
    rows = []
    npool = 120
    for n in range(1, npool + 1):
        rows.append((
            f"n{n}", n, "node", 1, True, _t("2009-01-01"), 1, 1, {},
            10_000_000 + n * 1000, 20_000_000 + (n % 13) * 1000, None, None,
        ))
    for wid in range(1, N_WAYS + 1):
        k = 3 + (wid % 5)
        ring = [((wid * 5 + j) % npool) + 1 for j in range(k)]
        ring.append(ring[0])
        rows.append((
            f"w{wid}", wid, "way", 1, True, _t("2010-06-15"),
            2000 + wid, 50, BLD, None, None, ring, None,
        ))
    # one building=yes relation of type=building (not a multipolygon):
    # members resolve to a GeometryCollection -> geometry:other
    rows.append((
        "r900", 900, "relation", 1, True, _t("2011-01-01"), 3000, 51,
        {K["building"]: V[("building", "yes")],
         K["type"]: V[("type", "building")]},
        None, None, None,
        [{"type": "way", "ref": 1, "role": "outline"},
         {"type": "way", "ref": 2, "role": "part"}],
    ))
    return OSHDB(spark, spark.createDataFrame(rows, ENT_SCHEMA), translator=TR)


def _snap(db):
    return (SnapshotView.on(db)
            .timestamps([_t("2014-01-01")])
            .area_of_interest(bbox=WORLD))


def _contrib(db):
    return (ContributionView.on(db)
            .timestamps([_t("2008-01-01"), _t("2014-01-01")])
            .area_of_interest(bbox=WORLD))


def test_filter_string(db):
    # sum of map(x -> 1) == count; 42 building polygons in both views
    got = (_snap(db)
           .filter("type:way and geometry:polygon and building=*")
           .transform(lambda df: df.withColumn("one", F.lit(1)))
           .sum("one"))
    assert got == N_WAYS
    got = (_contrib(db)
           .filter("type:way and geometry:polygon and building=*")
           .transform(lambda df: df.withColumn("one", F.lit(1)))
           .sum("one"))
    assert got == N_WAYS


def test_filter_object(db):
    node = parse_filter("type:way and geometry:polygon and building=*", TR)
    assert _snap(db).filter(node).count() == N_WAYS


def test_aggregate_filter(db):
    res = (_snap(db)
           .filter("(geometry:polygon or geometry:other) and building=*")
           .aggregate_by("type")
           .count())
    rows = {r["type"]: r["cnt"] for r in res.collect()}
    assert len(rows) == 2
    assert rows["way"] == N_WAYS
    assert rows["relation"] == 1


def test_aggregate_filter_object(db):
    node = parse_filter("(geometry:polygon or geometry:other) and building=*",
                        TR)
    res = _snap(db).filter(node).aggregate_by("type").count()
    rows = {r["type"]: r["cnt"] for r in res.collect()}
    assert rows["way"] == N_WAYS


def test_filter_group_by_entity(db):
    # lambda (raw Column) filter and the string filter agree after
    # groupByEntity, on both views
    snap_lambda = (_snap(db)
                   .transform(lambda df: df.filter(F.col("type") == "way"))
                   .group_by_entity()
                   .count())
    snap_string = _snap(db).filter("type:way").group_by_entity().count()
    assert snap_lambda == snap_string

    c_lambda = (_contrib(db)
                .transform(lambda df: df.filter(F.col("type") == "way"))
                .group_by_entity()
                .count())
    c_string = _contrib(db).filter("type:way").group_by_entity().count()
    assert c_lambda == c_string


def test_filter_nonexistent_tag(db):
    # unknown keys/values translate to match-nothing, never raise
    assert _snap(db).filter("type:way and nonexistentkey=*").count() == 0
    assert (_contrib(db)
            .filter("type:way and nonexistentkey=nonexistentvalue")
            .count()) == 0


def test_filter_not_crash_during_normalize(db):
    # the raw-Column escape hatch bypasses DNF normalization (the
    # reference's un-negatable FilterExpression); constant false -> 0
    assert _contrib(db).filter(F.lit(False)).count() == 0
