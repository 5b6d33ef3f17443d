"""Port of the reference's ApplyOSMContributionTest and
ApplyOSMEntitySnapshotTest (oshdb-filter/src/test): how a parsed filter
applies to CONTRIBUTIONS (match if the BEFORE state or the AFTER state
matches — FilterExpression.applyOSMContribution's fallback) and how the
contribution-only selectors (changeset:, contributor:) post-filter
contribution rows.

Structural translation: the reference applies filters to synthetic
OSMContribution objects; this engine's equivalent surface is the
ContributionView pipeline, where the filter participates in aliveness
(before-or-after by construction: a row survives if it or its lagged
predecessor matches) and contrib selectors post-filter rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oshdb_spark.api import OSHDB, ContributionView
from oshdb_spark.filters.dsl import TagTranslator, parse_filter

ENT_SCHEMA = (
    "doc_id string, id long, type string, version int, visible boolean, "
    "ts long, changeset long, uid int, tags map<int,int>, lon long, lat long, "
    "refs array<long>, members array<struct<type:string,ref:long,role:string>>"
)

TR = TagTranslator(
    keys={"building": 2, "foo": 9},
    values={("building", "yes"): 1},
)


def _node(nid, version, ts, changeset, uid, tags=None, lon=10, lat=10):
    return (
        f"n{nid}", nid, "node", version, True, ts, changeset, uid,
        tags or {}, lon, lat, None, None,
    )


@pytest.fixture(scope="module")
def geom_change_db(spark):
    """way 10: v1 = closed building ring (polygon), v2 = open line,
    v3 = still a line (no geometry-type change)."""
    nodes = [
        (f"n{i}", i, "node", 1, True, 50, 1, 1, {},
         (i % 2) * 10_000_000, (i // 2) * 10_000_000, None, None)
        for i in range(1, 5)
    ]
    ring = [1, 2, 4, 3, 1]
    open_line = [1, 2, 4]
    ways = [
        ("w10", 10, "way", 1, True, 100, 11, 1, {2: 1}, None, None,
         ring, None),
        ("w10", 10, "way", 2, True, 200, 12, 2, {2: 1}, None, None,
         open_line, None),
        ("w10", 10, "way", 3, True, 300, 13, 3, {2: 1}, None, None,
         [1, 2, 3], None),
    ]
    rows = nodes + ways
    return OSHDB(spark, spark.createDataFrame(rows, ENT_SCHEMA), translator=TR)


def _ts_set(db, flt):
    df = ContributionView.on(db).timestamps([0, 10_000]).filter(flt).dataframe()
    return {r["ts"] for r in df.filter("type = 'way'").collect()}


def test_basic_fallback_geometry_before_or_after(geom_change_db):
    """testBasicFallback: a geometry filter matches a contribution when
    the BEFORE state or the AFTER state matches; neither -> no row.
    polygon->line at ts 200 matches 'geometry:polygon' through the
    before state; line->line at ts 300 matches through neither."""
    assert _ts_set(geom_change_db, "geometry:polygon") == {100, 200}
    # the complementary filter sees the line states
    assert _ts_set(geom_change_db, "geometry:line") == {200, 300}


@pytest.fixture(scope="module")
def contrib_db(spark):
    """node 1: contribution at (changeset 1, uid 10) then one at
    (changeset 42, uid 1) — the reference's testContribution pair."""
    rows = [
        _node(1, 1, 100, changeset=1, uid=10, tags={2: 1}, lon=10),
        _node(1, 2, 200, changeset=42, uid=1, tags={2: 1}, lon=20),
    ]
    return OSHDB(spark, spark.createDataFrame(rows, ENT_SCHEMA), translator=TR)


def _contrib_ts(db, flt):
    df = ContributionView.on(db).timestamps([0, 10_000]).filter(flt).dataframe()
    return sorted(r["ts"] for r in df.collect())


@pytest.mark.parametrize(
    "selector",
    [
        "changeset:42",          # testChangesetId
        "changeset:(41,42,43)",  # testChangesetIdList
        "changeset:(41..43)",    # testChangesetIdRange
        "contributor:1",         # testContributorUserId
        "contributor:(1,2,3)",   # testContributorUserIdList
        "contributor:(1..2)",    # testContributorUserIdRange
        "contributor:1 and type:node",     # testAndOperator
        "contributor:1 or foo=doesntexist",  # testOrOperator
    ],
)
def test_contribution_selectors(contrib_db, selector):
    """Only the (changeset 42, uid 1) contribution survives each
    selector; the (changeset 1, uid 10) one is filtered out."""
    assert _contrib_ts(contrib_db, selector) == [200]


def test_negatable_filter(contrib_db):
    """testNegatableFilter: a negated filter inverts the row set."""
    expr = parse_filter("id:(1,2)", TR)
    assert _contrib_ts(contrib_db, expr) == [100, 200]
    assert _contrib_ts(contrib_db, expr.negate()) == []


def test_snapshot_selector_documented_deviation(contrib_db):
    """DOCUMENTED DEVIATION (tests/test_filter_parse.py header): the
    reference parser rejects contribution-only selectors without an
    opt-in flag (FilterParser.java:52); this engine always parses them
    and the view applies them to its columns — on the snapshot view,
    changeset:42 selects snapshots whose CURRENT version's changeset is
    42 (none at ts 150, the version-2 row at ts 250)."""
    from oshdb_spark.api import SnapshotView

    def _n(ts):
        return (
            SnapshotView.on(contrib_db)
            .timestamps([ts])
            .filter("changeset:42")
            .count()
        )

    assert _n(150) == 0
    assert _n(250) == 1


def test_contributor_uid_member_attribution(spark):
    """Port of OSMContributionGetContributorUserIdTest (oshdb-api):
    a contribution caused by a MEMBER edit is attributed to the member
    version's editor (wayIndirect: node v2 uid 7, v3 uid 8), while the
    way's own creation keeps its own uid (wayDirect/node: uid of the
    entity version)."""
    from oshdb_spark.operators.contribution import contribution_view

    rows = [
        # member node 3: three versions by three different users
        ("n3", 3, "node", 1, True, 121, 2, 6, {}, 0, 0, None, None),
        ("n3", 3, "node", 2, True, 123, 3, 7, {}, 10_000_000, 0, None, None),
        ("n3", 3, "node", 3, True, 125, 4, 8, {}, 20_000_000, 0, None, None),
        # static second node
        ("n4", 4, "node", 1, True, 100, 1, 5, {}, 0, 10_000_000, None, None),
        # way 1 created by uid 1, referencing both nodes
        ("w1", 1, "way", 1, True, 122, 10, 1, {}, None, None, [3, 4], None),
    ]
    ents = spark.createDataFrame(rows, ENT_SCHEMA)
    cv = contribution_view(ents, 0, 1000, squash=False)
    way_rows = {
        r["ts"]: (r["contrib_uid"], r["own_change"])
        for r in cv.filter("type = 'way'").collect()
    }
    assert way_rows[122] == (1, True)   # own creation -> own uid
    assert way_rows[123] == (7, False)  # member edit -> member's editor
    assert way_rows[125] == (8, False)



def test_filter_by_lambda_escape_hatch(contrib_db):
    """Port of FilterByTest (oshdb-filter): the lambda escape hatch —
    here a raw Catalyst Column — filters entities by arbitrary
    predicates and negates with ~.  byOSMEntity(version == 1) keeps the
    v1 contribution; its negation keeps the rest."""
    from oshdb_spark.api import SnapshotView

    def _ids(col):
        return sorted(
            r["id"]
            for r in SnapshotView.on(contrib_db)
            .timestamps([150])
            .filter(col)
            .dataframe()
            .collect()
        )

    by_id = F.col("id") == 1          # Filter.byOSHEntity(getId() == 1)
    assert _ids(by_id) == [1]
    assert _ids(~by_id) == []
    by_version = F.col("version") == 1  # Filter.byOSMEntity(getVersion() == 1)
    assert _ids(by_version) == [1]
    assert _ids(~by_version) == []

if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
