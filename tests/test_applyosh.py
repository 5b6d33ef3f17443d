"""OSH-level (full-history) prefilter bound semantics.

Port of ApplyOSHTest.java (reference oshdb-filter) against
filters.dsl.osh_prefilter evaluated as ANY-over-versions.  The contract
is identical — never prune an entity that could produce a result row —
but our bound is TIGHTER in two documented places where the reference
accepts false positives for cheapness:

  * `key in (v1, v2)` with a version matching the KEY only: the
    reference's applyOSH keeps it (it only indexes keys at the OSH
    level); no version can actually match, so we prune.
  * `a=* and b=*` with the conjuncts satisfied by DIFFERENT versions:
    the reference tests each child separately (anyOf(a) && anyOf(b));
    the per-version filter needs both on the SAME version, so we prune.

Both deviations only ever REMOVE entities that provably yield zero rows.

`geometry:*` filters return no bound here (reference's applyOSH
type-implication is covered by the view-level osm_types narrowing).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oshdb_spark.filters.dsl import TagTranslator, osh_prefilter, parse_filter

K = {"highway": 1, "building": 2, "name": 3}
V = {("highway", "residential"): 1, ("highway", "track"): 2,
     ("highway", "primary"): 3, ("building", "yes"): 1,
     ("name", "FIXME"): 1}
TR = TagTranslator(keys=K, values=V)

ENT_SCHEMA = (
    "id long, type string, version int, tags map<int,int>"
)


def _tags(*pairs):
    return {K[k]: V[(k, v)] for k, v in pairs}


def _keeps(spark, flt, versions, etype="node", eid=1):
    """True iff the applyOSH bound keeps an entity with these versions."""
    rows = [(eid, etype, i + 1, t) for i, t in enumerate(versions)]
    df = spark.createDataFrame(rows, ENT_SCHEMA)
    ub = osh_prefilter(parse_filter(flt, TR))
    if ub is None:
        return True  # no bound -> no prune
    return (df.agg(F.max(ub.cast("int")).alias("m")).first()["m"] or 0) == 1


HI_RES = _tags(("highway", "residential"))
HI_TRACK = _tags(("highway", "track"))
HI_PRIMARY = _tags(("highway", "primary"))
BLD = _tags(("building", "yes"))


class TestTagFilters:
    def test_equals(self, spark):
        f = "highway=residential"
        assert _keeps(spark, f, [HI_RES])
        assert _keeps(spark, f, [HI_RES, BLD])
        assert not _keeps(spark, f, [BLD])

    def test_equals_any(self, spark):
        f = "highway=*"
        assert _keeps(spark, f, [HI_RES])
        assert _keeps(spark, f, [HI_TRACK, BLD])
        assert not _keeps(spark, f, [BLD])

    def test_not_equals(self, spark):
        f = "highway!=residential"
        assert not _keeps(spark, f, [HI_RES])
        assert _keeps(spark, f, [HI_RES, BLD])
        assert _keeps(spark, f, [BLD])

    def test_not_equals_any(self, spark):
        f = "highway!=*"
        assert not _keeps(spark, f, [HI_RES])
        assert _keeps(spark, f, [HI_RES, BLD])
        assert _keeps(spark, f, [BLD])

    def test_equals_any_of(self, spark):
        f = "highway in (residential, track)"
        assert _keeps(spark, f, [HI_RES])
        assert not _keeps(spark, f, [BLD])
        assert _keeps(spark, f, [BLD, HI_TRACK])
        # TIGHTER than the reference: key matches but no value ever can —
        # the reference's key-level index keeps this, we prove zero rows
        assert not _keeps(spark, f, [HI_PRIMARY])
        assert not _keeps(spark, f, [BLD, HI_PRIMARY])


class TestIdFilters:
    def test_id_equals(self, spark):
        assert _keeps(spark, "id:1", [{}])
        assert not _keeps(spark, "id:2", [{}])

    def test_id_not_equals(self, spark):
        assert not _keeps(spark, "not id:1", [{}])
        assert _keeps(spark, "not id:2", [{}])

    def test_id_equals_any_of(self, spark):
        assert _keeps(spark, "id:(1,2,3)", [{}])
        assert not _keeps(spark, "id:(2,3)", [{}])
        assert not _keeps(spark, "not id:(1,2,3)", [{}])
        assert _keeps(spark, "not id:(2,3)", [{}])

    def test_id_in_range(self, spark):
        assert _keeps(spark, "id:(1..3)", [{}])
        assert not _keeps(spark, "id:(2..3)", [{}])
        assert _keeps(spark, "id:(1..)", [{}])
        assert not _keeps(spark, "id:(2..)", [{}])
        assert _keeps(spark, "id:(..3)", [{}])
        assert not _keeps(spark, "id:(..0)", [{}])

    def test_id_not_in_range(self, spark):
        assert not _keeps(spark, "not id:(1..3)", [{}])
        assert _keeps(spark, "not id:(2..3)", [{}])
        assert not _keeps(spark, "not id:(1..)", [{}])
        assert _keeps(spark, "not id:(2..)", [{}])
        assert not _keeps(spark, "not id:(..3)", [{}])
        assert _keeps(spark, "not id:(..0)", [{}])


class TestTypeAndBooleans:
    def test_type(self, spark):
        assert _keeps(spark, "type:node", [{}])
        assert not _keeps(spark, "type:way", [{}])

    def test_and(self, spark):
        f = "highway=* and name=*"
        both = _tags(("highway", "residential"), ("name", "FIXME"))
        assert _keeps(spark, f, [both])
        assert not _keeps(spark, f, [HI_RES])
        assert not _keeps(spark, f, [{}])
        # TIGHTER than the reference: conjuncts satisfied by DIFFERENT
        # versions — no single version matches, so we prune where the
        # reference's per-child anyOf check keeps
        name_only = _tags(("name", "FIXME"))
        assert not _keeps(spark, f, [HI_RES, name_only])

    def test_or(self, spark):
        f = "highway=* or name=*"
        assert _keeps(spark, f, [HI_RES])
        assert _keeps(spark, f, [{}, _tags(("name", "FIXME"))])
        assert not _keeps(spark, f, [{}])

    def test_geometry_type_gives_no_bound(self, spark):
        # geometry filters can't prune histories (need built geometry);
        # their OSM-type implication narrows the scan via osm_types()
        assert _keeps(spark, "geometry:point", [{}])
        assert osh_prefilter(parse_filter("geometry:line", TR)) is None
