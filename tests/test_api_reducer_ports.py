"""Structural ports of the reference's api-level reducer/terminal suites:

    MapReduceTest.java            (uniq contributor uids, groupByEntity,
                                   stream variants)
    MapAggregateByIndexTest.java  (aggregateBy + generic reduce, zerofill
                                   incl. the totally-empty result, chained
                                   combined indices)
    MapAggregateByTimestampTest.java (custom time index + validation,
                                   map-before/after-aggregation equality,
                                   combined index order swap)
    FlatMapReduceTest.java / FlatMapAggregateTest.java
      (+ the GroupedByEntity variants)
    LambdaFilterTest.java         (raw predicates pre/post aggregateBy)
    CollectTest.java / ForEachTest.java / StreamTest.java
    TestMapReducerTimestamps.java (invalid timestamp strings)
    TestAutoAggregation.java      (map before/after aggregateByGeometry)
    IterateByContributionTest.java (issue 108: window opening after the
                                   entity's creation)
    OSMDataFiltersTest.java       (chained areaOfInterest intersection;
                                   bbox/polygon/multipolygon AOIs)
    HelpersOSMContributionViewTest.java / HelpersOSMEntitySnapshotViewTest
                                  (sum/count/average/weightedAverage/uniq/
                                   countUniq over both views in all four
                                   shapes: single window, per-interval,
                                   total, custom index)
    QuantilesTest.java            (estimated quantiles, self-referential
                                   interpolation check)

The reference suites run against its H2 ``test-data`` extract and assert
dataset-specific constants; these ports run the SAME query shapes and
assertion structure over two deterministic fixtures whose expected values
are derived from the fixture definition in plain Python (an independent
oracle — the engine never feeds the expectation side).

Fixture H ("highway node"): one node, 9 versions, the first untagged —
mirrors the reference's node 617308093 (first version lacks the highway
tag; later versions from 5 distinct contributors).

Fixture B ("building ways"): 42 building=yes ways created in 3 monthly
waves, 14 of which get exactly one 2014 tag edit — mirrors the counts
exercised by the Helpers/Collect/Stream suites (42 entities, 14
contributions in the 2014 window, creations spread over 3 months).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oshdb_spark.api import ContributionView, OSHDB, SnapshotView
from oshdb_spark.filters.dsl import TagTranslator
from oshdb_spark.timestamps import MONTHLY, YEARLY, parse_iso, timestamps

ENT_SCHEMA = (
    "doc_id string, id long, type string, version int, visible boolean, "
    "ts long, changeset long, uid int, tags map<int,int>, lon long, lat long, "
    "refs array<long>, members array<struct<type:string,ref:long,role:string>>"
)

K = {"highway": 3, "building": 2, "name": 7}
V = {("highway", "primary"): 1, ("building", "yes"): 1}
TR = TagTranslator(keys=K, values=V)

HWY = {K["highway"]: V[("highway", "primary")]}
HWY_NAME = {K["highway"]: V[("highway", "primary")], K["name"]: 99}
BLD = {K["building"]: V[("building", "yes")]}


def _t(iso: str) -> int:
    return parse_iso(iso) // 1_000_000  # fixtures work in epoch seconds


def _stamps(start, end, interval=None):
    args = (start, end) if interval is None else (start, end, interval)
    return [t // 1_000_000 for t in timestamps(*args)]


T6 = _stamps("2010-01-01", "2015-01-01", YEARLY)      # 6 yearly stamps
T72 = _stamps("2010-01-01", "2015-12-01", MONTHLY)    # 72 monthly stamps
T2 = _stamps("2014-01-01", "2015-01-01")              # one interval
T1 = [_t("2015-12-01")]                                # single stamp


# ---------------------------------------------------------------------------
# fixture H: the highway node (MapReduceTest's node 617308093 analogue)
# ---------------------------------------------------------------------------

# (version, iso ts, uid, tags, moved): v1 lacks the highway tag; versions
# 2-7 move the node (geometry changes); the LAST TWO are tag-only edits —
# the reference's node 617308093 has the same shape ("last two didn't
# modify the node's coordinates", LambdaFilterTest.java:52-56)
def _named(n):
    return {K["highway"]: V[("highway", "primary")], K["name"]: n}


NODE_VERSIONS = [
    (1, "2010-02-01", 900, {}, True),
    (2, "2010-06-01", 901, _named(99), True),
    (3, "2011-03-01", 902, _named(99), True),
    (4, "2011-09-01", 902, _named(99), True),
    (5, "2012-05-01", 901, _named(99), True),
    (6, "2013-07-01", 903, _named(99), True),
    (7, "2014-04-01", 902, _named(99), True),
    (8, "2015-02-01", 904, _named(98), False),
    (9, "2015-06-01", 905, _named(97), False),
]
NID = 617

# independent oracle: contributions under the highway=* filter are the
# transitions into/within the tagged state — v1->v2 is the filtered
# CREATION, each later version an edit by its own uid
CONTRIB_UIDS = [uid for v, _, uid, tags, _m in NODE_VERSIONS if tags]
N_CONTRIBS = len(CONTRIB_UIDS)                     # 8
UNIQ_CONTRIB_UIDS = set(CONTRIB_UIDS)              # {901..905} -> 5

# geometry-change contributions: moved versions 3..7 (v2 is the CREATION,
# v8/v9 are tag-only) -> 3 distinct uids, the LambdaFilterTest shape
GEOM_CHANGE_CONTRIB_IDXS = [
    i
    for i, (v, _, uid, tags, moved) in enumerate(NODE_VERSIONS)
    if tags and moved and i > 0 and NODE_VERSIONS[i - 1][3]
]
GEOM_CHANGE_UIDS = {NODE_VERSIONS[i][2] for i in GEOM_CHANGE_CONTRIB_IDXS}

# distinct after-state tag pairs over all matching contributions
AFTER_TAG_PAIRS = {
    (k, val)
    for _, _, _, tags, _m in NODE_VERSIONS
    if tags
    for k, val in tags.items()
}


def _node_asof(ts: int):
    """Newest version with ts <= query ts (None before v1)."""
    best = None
    for v, iso, uid, tags, _m in NODE_VERSIONS:
        if _t(iso) <= ts:
            best = (v, uid, tags)
    return best


SNAPSHOT_UIDS = [
    n[1] for n in (_node_asof(ts) for ts in T6) if n is not None and n[2]
]
N_SNAPSHOTS = len(SNAPSHOT_UIDS)                   # 5
UNIQ_SNAPSHOT_UIDS = set(SNAPSHOT_UIDS)            # 3 distinct


@pytest.fixture(scope="module")
def hwy_db(spark):
    rows, pos = [], 0
    for v, iso, uid, tags, moved in NODE_VERSIONS:
        if moved:
            pos = v  # tag-only versions keep the previous coordinates
        rows.append(
            (
                f"n{NID}v{v}", NID, "node", v, True, _t(iso), 1000 + v, uid,
                tags, 80_000_000 + pos * 10, 90_000_000 + pos * 10, None, None,
            )
        )
    return OSHDB(spark, spark.createDataFrame(rows, ENT_SCHEMA), translator=TR)


def _hwy_contrib(hwy_db):
    return (
        ContributionView.on(hwy_db)
        .timestamps([T72[0], T72[-1]])
        .filter("type:node and highway=*")
    )


def _hwy_snap(hwy_db):
    return SnapshotView.on(hwy_db).timestamps(T6).filter(
        "type:node and highway=*"
    )


# -- MapReduceTest ----------------------------------------------------------


def test_mapreduce_contribution_uniq_uids(hwy_db):
    """MapReduceTest.testOSMContributionView: uniq contributor uids; the
    first (untagged) version contributes nothing."""
    assert _hwy_contrib(hwy_db).uniq("contrib_uid") == UNIQ_CONTRIB_UIDS
    # with an extra row-level filter (the reference's .filter(uid > 0))
    assert (
        _hwy_contrib(hwy_db)
        .transform(lambda df: df.filter(F.col("contrib_uid") > 0))
        .uniq("contrib_uid")
        == UNIQ_CONTRIB_UIDS
    )


def test_mapreduce_contribution_group_by_entity(hwy_db):
    grouped = _hwy_contrib(hwy_db).group_by_entity()
    sizes = [r["n"] for r in grouped.select(F.size("rows").alias("n")).collect()]
    assert sum(sizes) == N_CONTRIBS


def test_mapreduce_snapshot_uniq_uids(hwy_db):
    assert _hwy_snap(hwy_db).uniq("uid") == UNIQ_SNAPSHOT_UIDS
    assert (
        _hwy_snap(hwy_db)
        .transform(lambda df: df.filter(F.col("uid") > 0))
        .uniq("uid")
        == UNIQ_SNAPSHOT_UIDS
    )


def test_mapreduce_snapshot_group_by_entity(hwy_db):
    grouped = _hwy_snap(hwy_db).group_by_entity()
    sizes = [r["n"] for r in grouped.select(F.size("rows").alias("n")).collect()]
    assert sum(sizes) == N_SNAPSHOTS


def test_mapreduce_stream_variants(hwy_db):
    """MapReduceTest.testOSMContributionViewStream /
    testOSMEntitySnapshotViewStream: stream() sees the same rows."""
    got = {r["contrib_uid"] for r in _hwy_contrib(hwy_db).stream()}
    assert got == UNIQ_CONTRIB_UIDS
    got = {r["uid"] for r in _hwy_snap(hwy_db).stream()}
    assert got == UNIQ_SNAPSHOT_UIDS


# -- MapAggregateByIndexTest -------------------------------------------------


def test_aggregate_by_index_generic_reduce(hwy_db):
    """testOSMContribution/testOSMEntitySnapshot: aggregateBy(id) + generic
    set-union reduce."""

    def acc(state, pdf):
        state |= set(int(u) for u in pdf["contrib_uid"].dropna())
        return state

    res = (
        _hwy_contrib(hwy_db)
        .aggregate_by("id")
        .reduce(set, acc, lambda a, b: a | b)
    )
    assert set(res.keys()) == {NID}
    assert res[NID] == UNIQ_CONTRIB_UIDS

    def acc_s(state, pdf):
        state |= set(int(u) for u in pdf["uid"].dropna())
        return state

    res = _hwy_snap(hwy_db).aggregate_by("id").reduce(
        set, acc_s, lambda a, b: a | b
    )
    assert res == {NID: UNIQ_SNAPSHOT_UIDS}


def test_aggregate_by_index_zerofill(hwy_db):
    """testZerofill: a requested-but-absent key fills with the identity and
    observed keys survive; a totally-empty result still zerofills."""
    res = (
        _hwy_contrib(hwy_db)
        .aggregate_by("id", keys=[-1])
        .count()
    )
    got = {r["id"]: r["cnt"] for r in res.collect()}
    assert got == {-1: 0, NID: N_CONTRIBS}

    res = (
        _hwy_contrib(hwy_db)
        .transform(lambda df: df.filter(F.lit(False)))
        .aggregate_by("id", keys=[-1])
        .count()
    )
    got = {r["id"]: r["cnt"] for r in res.collect()}
    assert got == {-1: 0}


def test_aggregate_by_index_multiple(hwy_db):
    """testMultiple2/testMultiple3: chained aggregateBy = combined index."""
    snap1 = SnapshotView.on(hwy_db).timestamps(T1).filter(
        "type:node and highway=*"
    )
    res = snap1.aggregate_by("id").aggregate_by("type").count()
    rows = res.collect()
    assert [(r["id"], r["type"], r["cnt"]) for r in rows] == [(NID, "node", 1)]

    res = (
        snap1.aggregate_by("id").aggregate_by("type").aggregate_by("uid").count()
    )
    rows = res.collect()
    expected_uid = _node_asof(T1[0])[1]
    assert [(r["id"], r["type"], r["uid"], r["cnt"]) for r in rows] == [
        (NID, "node", expected_uid, 1)
    ]


# -- FlatMapReduceTest / FlatMapAggregateTest --------------------------------


def test_flat_map_reduce_tag_pairs(hwy_db):
    """FlatMapReduceTest.test: flatMap a contribution to its after-state tag
    pairs (only for the target id), reduce to a set."""
    flat = _hwy_contrib(hwy_db).flat_map(
        F.when(F.col("id") == NID, F.map_entries("tags")).otherwise(
            F.array().cast("array<struct<key:int,value:int>>")
        ),
        name="tag",
    )

    def acc(state, pdf):
        state |= {(int(t["key"]), int(t["value"])) for t in pdf["tag"]}
        return state

    result = flat.reduce(set, acc, lambda a, b: a | b)
    assert result == AFTER_TAG_PAIRS


def test_flat_map_constant_set(hwy_db):
    """FlatMapReduceTest.testSet/testIterable: flatMap to a constant set."""
    flat = _hwy_contrib(hwy_db).flat_map(
        F.array(F.lit(1), F.lit(2), F.lit(3)), name="v"
    )
    assert flat.uniq("v") == {1, 2, 3}


def test_flat_map_aggregate(hwy_db):
    """FlatMapAggregateTest.test: flatMap to (id, tag-pair), aggregateBy id,
    reduce to a set per key."""
    flat = _hwy_contrib(hwy_db).flat_map(
        F.when(F.col("id") == NID, F.map_entries("tags")).otherwise(
            F.array().cast("array<struct<key:int,value:int>>")
        ),
        name="tag",
        keep=["id"],
    )

    def acc(state, pdf):
        state |= {(int(t["key"]), int(t["value"])) for t in pdf["tag"]}
        return state

    result = flat.aggregate_by("id").reduce(set, acc, lambda a, b: a | b)
    assert set(result.keys()) == {NID}
    assert result[NID] == AFTER_TAG_PAIRS


def test_flat_map_aggregate_grouped_by_entity(hwy_db):
    """FlatMapAggregateGroupedByEntityTest.test: groupByEntity, flatMap each
    entity's contribution list to two (id, value) entries — its
    GEOMETRY_CHANGE count and a constant 2 (empty for other ids) —
    aggregateBy key, reduce(0, +, +): one map entry, value = changes + 2."""
    grouped = _hwy_contrib(hwy_db).group_by_entity()
    n_changes = F.size(
        F.filter(
            "rows",
            lambda r: F.array_contains(r["contrib_types"], "GEOMETRY_CHANGE"),
        )
    )
    entries = grouped.filter(F.col("id") == NID).select(
        F.col("id"),
        F.explode(F.array(n_changes.cast("int"), F.lit(2))).alias("v"),
    )
    result = {
        r["id"]: r["s"]
        for r in entries.groupBy("id").agg(F.sum("v").alias("s")).collect()
    }
    assert set(result.keys()) == {NID}
    assert result[NID] == len(GEOM_CHANGE_CONTRIB_IDXS) + 2


def test_flat_map_grouped_contribution_geometry_changes(hwy_db):
    """FlatMapReduceGroupedByEntityTest.testOSMContributionView: per-entity
    list -> one 1 per GEOMETRY_CHANGE contribution plus a constant 2,
    summed globally."""
    grouped = _hwy_contrib(hwy_db).group_by_entity()
    n = F.size(
        F.filter(
            "rows",
            lambda r: F.array_contains(r["contrib_types"], "GEOMETRY_CHANGE"),
        )
    )
    total = (
        grouped.filter(F.col("id") == NID)
        .select((n + F.lit(2)).alias("v"))
        .agg(F.sum("v").alias("s"))
        .collect()[0]["s"]
    )
    assert total == len(GEOM_CHANGE_CONTRIB_IDXS) + 2


def test_flat_map_grouped_snapshot_geometry_changes(hwy_db):
    """FlatMapReduceGroupedByEntityTest.testOSMEntitySnapshotView: count
    adjacent snapshot pairs whose geometry differs, plus a constant 2."""
    grouped = (
        SnapshotView.on(hwy_db)
        .timestamps(T6)
        .filter("type:node and highway=*")
        .group_by_entity()
    )
    a = F.slice("rows", 1, F.size("rows") - 1)
    b = F.slice("rows", 2, F.size("rows") - 1)
    changes = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x["wkt"] != y["wkt"]).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    total = (
        grouped.filter(F.col("id") == NID)
        .select((changes + F.lit(2)).alias("v"))
        .agg(F.sum("v").alias("s"))
        .collect()[0]["s"]
    )
    # oracle: adjacent as-of versions with different coordinates
    snaps = [n for n in (_node_asof(ts) for ts in T6) if n is not None and n[2]]
    pos = []
    for v, _uid, _tags in snaps:
        moved_upto = max(
            vv for vv, _i, _u, _t, m in NODE_VERSIONS if m and vv <= v
        )
        pos.append(moved_upto)
    exp = sum(1 for i in range(1, len(pos)) if pos[i] != pos[i - 1])
    assert total == exp + 2


def test_flat_map_grouped_by_entity(hwy_db):
    """FlatMapReduceGroupedByEntityTest / CollectTest
    .testFlatMapCollectGroupedById analogue: one value per entity from the
    grouped row list."""
    grouped = _hwy_contrib(hwy_db).group_by_entity()
    ids = [
        r["v"]
        for r in grouped.select(
            F.element_at("rows", 1).getField("contrib_uid").alias("v")
        ).collect()
    ]
    # one group (one entity), first contribution's uid
    assert len(ids) == 1


# -- IterateByContributionTest (issue 108) --------------------------------------


def test_issue108_window_after_creation(hwy_db):
    """IterateByContributionTest.testIssue108: a query window that OPENS
    after the entity's creation yields only non-CREATION contributions —
    the pre-window state feeds the lag, so the first in-window edit is not
    misclassified as a creation."""
    t0 = _t("2012-01-01")
    rows = (
        ContributionView.on(hwy_db)
        .timestamps([t0, T72[-1]])
        .filter("type:node and highway=*")
        .dataframe()
        .collect()
    )
    exp = [
        (v, iso) for v, iso, _u, tags, _m in NODE_VERSIONS
        if tags and t0 <= _t(iso)
    ]
    assert len(rows) == len(exp)
    assert all("CREATION" not in r["contrib_types"] for r in rows)


# -- LambdaFilterTest ----------------------------------------------------------


def test_lambda_filter_contribution_type(hwy_db):
    """LambdaFilterTest.testFilter: a raw-predicate filter on the
    contribution type set; the last two (tag-only) edits drop out."""
    got = (
        _hwy_contrib(hwy_db)
        .transform(
            lambda df: df.filter(
                F.array_contains("contrib_types", "GEOMETRY_CHANGE")
            )
        )
        .uniq("contrib_uid")
    )
    assert got == GEOM_CHANGE_UIDS
    assert len(got) == 3


def test_lambda_filter_after_aggregate(hwy_db):
    """LambdaFilterTest.testAggregateFilter: same predicate applied AFTER
    aggregateBy, through MapAggregator.transform."""
    res = (
        _hwy_contrib(hwy_db)
        .aggregate_by("id")
        .transform(
            lambda df: df.filter(
                F.array_contains("contrib_types", "GEOMETRY_CHANGE")
            )
        )
        .uniq("contrib_uid")
    )
    got = {r["id"]: set(r["uniq_contrib_uid"]) for r in res.collect()}
    assert got == {NID: GEOM_CHANGE_UIDS}


# -- OSMDataFiltersTest ---------------------------------------------------------


def test_aoi_chains(hwy_db):
    """OSMDataFiltersTest: chained areaOfInterest calls INTERSECT; bbox,
    polygon, and multipolygon AOIs containing the node all count it; a
    disjoint chain counts nothing."""
    base = SnapshotView.on(hwy_db).timestamps(T1).filter("type:node")
    around = (7.9, 8.9, 8.2, 9.2)  # node sits at ~(8.0x, 9.0x) deg

    assert base.area_of_interest(bbox=around).count() == 1
    # bboxesNotIntersecting: disjoint chain -> empty
    assert (
        base.area_of_interest(bbox=(0.0, 0.0, 1.0, 1.0))
        .area_of_interest(bbox=around)
        .count()
        == 0
    )
    # bboxesIntersecting: world then bbox == bbox
    assert (
        base.area_of_interest(bbox=(-180.0, -90.0, 180.0, 90.0))
        .area_of_interest(bbox=around)
        .count()
        == 1
    )
    # polygon AOI of the same rectangle
    poly = {
        "type": "Polygon",
        "coordinates": [[
            [around[0], around[1]], [around[2], around[1]],
            [around[2], around[3]], [around[0], around[3]],
            [around[0], around[1]],
        ]],
    }
    assert base.area_of_interest(polygon=poly).count() == 1
    # multiPolygon AOI wrapping the same rectangle
    multi = {"type": "MultiPolygon", "coordinates": [poly["coordinates"]]}
    assert base.area_of_interest(polygon=multi).count() == 1


# -- TestMapReducerTimestamps -------------------------------------------------


def test_invalid_timestamp_strings():
    """testInvalidTimestamps: unparseable / non-UTC / negative-year inputs
    raise at parse time (DateTimeParseException /
    OSHDBTimestampIllegalArgumentException parity)."""
    with pytest.raises(ValueError):
        timestamps("invalid1", "invalid2")
    with pytest.raises(ValueError):
        parse_iso("invalid")
    with pytest.raises(ValueError):
        parse_iso("2020-01-01T00:00:00+00")
    with pytest.raises(ValueError):
        parse_iso("-2020-01-01T00:00:00Z")


# ---------------------------------------------------------------------------
# fixture B: 42 building ways (Helpers / Collect / Stream / ForEach /
# MapAggregateByTimestamp suites)
# ---------------------------------------------------------------------------

# creation waves: 3 distinct months (the Helpers average test counts months
# with creations), 42 ways total; ways 1-14 get one 2014 tag edit
WAVES = [
    ("2010-06-15", range(1, 21)),    # 20 ways
    ("2011-03-10", range(21, 36)),   # 15 ways
    ("2012-08-05", range(36, 43)),   # 7 ways
]
N_WAYS = 42
EDIT_2014 = {wid: f"2014-03-{(wid % 27) + 1:02d}" for wid in range(1, 15)}


def _way_created(wid: int) -> int:
    for iso, ids in WAVES:
        if wid in ids:
            return _t(iso)
    raise KeyError(wid)


@pytest.fixture(scope="module")
def bld_db(spark):
    rows = []
    # a shared pool of static nodes; way wid uses 3 + (wid % 7) of them,
    # closed — vertex count (refs length) varies 4..10
    npool = 200
    for n in range(1, npool + 1):
        rows.append(
            (
                f"n{n}", n, "node", 1, True, _t("2009-01-01"), 1, 1, {},
                10_000_000 + n * 1000, 20_000_000 + (n % 17) * 1000,
                None, None,
            )
        )
    for wid in range(1, N_WAYS + 1):
        k = 3 + (wid % 7)
        ring = [((wid * 7 + j) % npool) + 1 for j in range(k)]
        ring.append(ring[0])
        rows.append(
            (
                f"w{wid}v1", wid, "way", 1, True, _way_created(wid),
                2000 + wid, 50 + (wid % 3), BLD, None, None, ring, None,
            )
        )
        if wid in EDIT_2014:
            tags2 = dict(BLD)
            tags2[K["name"]] = wid  # tag change, geometry untouched
            rows.append(
                (
                    f"w{wid}v2", wid, "way", 2, True, _t(EDIT_2014[wid]),
                    3000 + wid, 60 + (wid % 5), tags2, None, None, ring, None,
                )
            )
    return OSHDB(spark, spark.createDataFrame(rows, ENT_SCHEMA), translator=TR)


def _bld_contrib(bld_db, ts):
    return (
        ContributionView.on(bld_db)
        .timestamps(list(ts))
        .filter("type:way and building=yes")
    )


def _bld_snap(bld_db, ts):
    return SnapshotView.on(bld_db).timestamps(ts).filter(
        "type:way and building=yes"
    )


def _floor(ts: int, stamps: list[int]) -> int:
    return max(s for s in stamps if s <= ts)


# independent oracle of fixture B's contributions: (ts, id, kind)
ORACLE_CONTRIBS = [
    (_way_created(wid), wid, "CREATION") for wid in range(1, N_WAYS + 1)
] + [(_t(iso), wid, "TAG_CHANGE") for wid, iso in EDIT_2014.items()]


# -- HelpersOSMContributionViewTest -------------------------------------------


def test_helpers_sum(bld_db):
    """testSum: all four shapes."""
    v2 = _bld_contrib(bld_db, T2)
    ind = F.when(
        F.array_contains("contrib_types", "TAG_CHANGE"), F.lit(1)
    ).otherwise(F.lit(0))
    # single window: aggregateByTimestamp -> one entry
    res = v2.transform(lambda df: df.withColumn("i", ind)).aggregate_by_timestamp().sum("i")
    rows = res.collect()
    assert len(rows) == 1
    assert rows[0]["sum_i"] == len(EDIT_2014)

    # many timestamps: monthly creations
    v72 = _bld_contrib(bld_db, T72)
    cre = F.when(
        F.array_contains("contrib_types", "CREATION"), F.lit(1)
    ).otherwise(F.lit(0))
    res = v72.transform(lambda df: df.withColumn("c", cre)).aggregate_by_timestamp().sum("c")
    rows = res.collect()
    assert len(rows) == len(T72) - 1  # 71 interval starts
    assert sum(r["sum_c"] for r in rows) == N_WAYS

    # total
    assert (
        v72.transform(lambda df: df.withColumn("c", cre)).sum("c") == N_WAYS
    )

    # custom aggregation identifier: by stringified type set
    res = (
        v72.transform(
            lambda df: df.withColumn(
                "kinds", F.array_join(F.array_sort("contrib_types"), "+")
            )
        )
        .aggregate_by("kinds")
        .count()
    )
    got = {r["kinds"]: r["cnt"] for r in res.collect()}
    assert got.get("CREATION") == N_WAYS
    assert "DELETION" not in got


def test_helpers_count_custom_index(bld_db):
    """testCount: aggregateBy(id % 2 == 0)."""
    v2 = _bld_contrib(bld_db, T2)
    res = v2.aggregate_by((F.col("id") % 2) == 0, name="even").count()
    got = {r["even"]: r["cnt"] for r in res.collect()}
    exp_even = sum(1 for wid in EDIT_2014 if wid % 2 == 0)
    assert got == {True: exp_even, False: len(EDIT_2014) - exp_even}


def test_helpers_average(bld_db):
    """testAverage: all-tag-change window -> 1.0; months without
    contributions have no average (null after zerofill); months with a
    positive average == the creation waves."""
    v2 = _bld_contrib(bld_db, T2)
    ind = F.when(
        F.array_contains("contrib_types", "TAG_CHANGE"), F.lit(1)
    ).otherwise(F.lit(0))
    assert (
        v2.transform(lambda df: df.withColumn("i", ind)).average("i") == 1.0
    )

    v72 = _bld_contrib(bld_db, T72)
    cre = F.when(
        F.array_contains("contrib_types", "CREATION"), F.lit(1)
    ).otherwise(F.lit(0))
    res = (
        v72.transform(lambda df: df.withColumn("c", cre))
        .aggregate_by_timestamp()
        .average("c")
    )
    rows = res.collect()
    assert len(rows) == len(T72) - 1
    positive = [r for r in rows if r["avg_c"] is not None and r["avg_c"] > 0]
    assert len(positive) == len(WAVES)  # 3 creation months


def test_helpers_weighted_average(bld_db):
    """testWeightedAverage: weight 2*(id%2); expected from the oracle."""
    v2 = _bld_contrib(bld_db, T2)
    num = sum(2 * (wid % 2) * 1 for wid in EDIT_2014)  # indicator==1 always
    den = sum(2 * (wid % 2) for wid in EDIT_2014)
    got = v2.transform(
        lambda df: df.withColumn("v", F.lit(1)).withColumn(
            "w", 2 * (F.col("id") % 2)
        )
    ).weighted_average("v", "w")
    assert got == pytest.approx(num / den, rel=1e-9)


def test_helpers_uniq(bld_db):
    """testUniq: per-interval id sets union to all edited/created ids."""
    v72 = _bld_contrib(bld_db, T72)
    res = v72.aggregate_by_timestamp().uniq("id")
    rows = res.collect()
    assert len(rows) == len(T72) - 1
    union = set()
    for r in rows:
        union |= set(r["uniq_id"] or [])
    assert union == set(range(1, N_WAYS + 1))
    # total
    assert v72.uniq("id") == set(range(1, N_WAYS + 1))
    # custom index
    res = v72.aggregate_by((F.col("id") % 2) == 0, name="even").uniq("id")
    got = {r["even"]: set(r["uniq_id"]) for r in res.collect()}
    assert got[True] == {i for i in range(1, N_WAYS + 1) if i % 2 == 0}
    assert got[False] == {i for i in range(1, N_WAYS + 1) if i % 2 == 1}


# -- HelpersOSMEntitySnapshotViewTest ------------------------------------------


def test_helpers_snapshot_sum_count(bld_db):
    """testSum/testCount: single stamp (42 ways alive), full monthly list
    (first stamp 0, last stamp 42), total, and the id-parity custom index
    (21 even / 21 odd)."""
    s1 = _bld_snap(bld_db, [T6[-1]])
    res = (
        s1.transform(lambda df: df.withColumn("one", F.lit(1)))
        .aggregate_by_timestamp()
        .sum("one")
    )
    rows = res.collect()
    assert len(rows) == 1 and rows[0]["sum_one"] == N_WAYS

    t72s = _stamps("2010-01-01", "2015-12-01", MONTHLY)
    s72 = _bld_snap(bld_db, t72s)
    res = s72.aggregate_by_timestamp().count()
    rows = sorted(res.collect(), key=lambda r: r["snap_ts"])
    assert len(rows) == len(t72s)  # snapshots zerofill ALL stamps
    assert rows[0]["cnt"] == 0 and rows[-1]["cnt"] == N_WAYS

    assert s1.count() == N_WAYS

    res = s1.aggregate_by((F.col("id") % 2) == 0, name="even").count()
    got = {r["even"]: r["cnt"] for r in res.collect()}
    assert got == {True: N_WAYS // 2, False: N_WAYS // 2}


def test_helpers_snapshot_average_weighted(bld_db):
    """testAverage/testWeightedAverage: parity indicator averages 0.5 over
    1..42; weighting by the indicator picks out the odd half."""
    s1 = _bld_snap(bld_db, [T6[-1]])
    odd = (F.col("id") % 2).cast("double")
    assert s1.transform(
        lambda df: df.withColumn("o", odd)
    ).average("o") == pytest.approx(0.5, rel=1e-9)

    got = s1.transform(
        lambda df: df.withColumn("v", F.lit(1.0)).withColumn("w", 2 * odd)
    ).weighted_average("v", "w")
    assert got == pytest.approx(1.0, rel=1e-9)

    # custom index: average of the parity indicator per parity bucket
    res = (
        s1.aggregate_by((F.col("id") % 2) == 0, name="even")
        .transform(lambda df: df.withColumn("o", odd))
        .average("o")
    )
    got = {r["even"]: r["avg_o"] for r in res.collect()}
    assert got[True] == pytest.approx(0.0, abs=1e-12)
    assert got[False] == pytest.approx(1.0, rel=1e-9)


def test_helpers_snapshot_uniq_countuniq(bld_db):
    """testUniq/testCountUniq: 42 distinct ids at the last stamp, 0 at the
    first; parity split 21/21."""
    t72s = _stamps("2010-01-01", "2015-12-01", MONTHLY)
    s72 = _bld_snap(bld_db, t72s)
    res = s72.aggregate_by_timestamp().uniq("id")
    rows = sorted(res.collect(), key=lambda r: r["snap_ts"])
    assert len(rows) == len(t72s)
    assert len(rows[0]["uniq_id"] or []) == 0
    assert len(rows[-1]["uniq_id"] or []) == N_WAYS

    assert s72.count_uniq("id") == N_WAYS
    res = s72.aggregate_by((F.col("id") % 2) == 0, name="even").count_uniq("id")
    got = {r["even"]: r["count_uniq_id"] for r in res.collect()}
    assert got == {True: N_WAYS // 2, False: N_WAYS // 2}


# -- CollectTest / ForEachTest / StreamTest -----------------------------------


def test_collect_distinct_ids(bld_db):
    """CollectTest.testCollect/testMapCollect: collected rows carry all 42
    entity ids."""
    rows = _bld_contrib(bld_db, T72).dataframe().collect()
    assert len({r["id"] for r in rows}) == N_WAYS


def test_collect_flat_map(bld_db):
    """CollectTest.testFlatMapCollect: singleton flatMap preserves ids."""
    flat = _bld_contrib(bld_db, T72).flat_map(F.array(F.col("id")), name="i")
    rows = flat.dataframe().collect()
    assert len({r["i"] for r in rows}) == N_WAYS


def test_collect_aggregated_by_timestamp(bld_db):
    """CollectTest.testAggregatedByTimestamp: per-interval collect matches
    the oracle histogram."""
    res = _bld_contrib(bld_db, T72).aggregate_by_timestamp().collect("id")
    got = {
        r["interval_ts"]: sorted(r["collect_id"] or []) for r in res.collect()
    }
    exp: dict[int, list[int]] = {s: [] for s in T72[:-1]}
    for ts, wid, _kind in ORACLE_CONTRIBS:
        exp[_floor(ts, T72[:-1])].append(wid)
    assert got == {k: sorted(v) for k, v in exp.items()}


def test_foreach_and_stream(bld_db):
    """ForEachTest/StreamTest: driver-side iteration sees every entity."""
    seen = {}
    for r in _bld_contrib(bld_db, T72).stream():
        seen[r["id"]] = True
    assert len(seen) == N_WAYS


# -- MapAggregateByTimestampTest ----------------------------------------------


def test_agg_by_ts_contribution_counts(bld_db):
    """testOSMContribution: single + multiple timestamps."""
    # single window
    res = (
        _bld_contrib(bld_db, T2)
        .transform(lambda df: df.withColumn("one", F.lit(1)))
        .aggregate_by_timestamp()
        .sum("one")
    )
    rows = res.collect()
    assert len(rows) == 1 and rows[0]["sum_one"] == len(EDIT_2014)

    # multiple
    res = (
        _bld_contrib(bld_db, T72)
        .transform(lambda df: df.withColumn("one", F.lit(1)))
        .aggregate_by_timestamp()
        .sum("one")
    )
    rows = sorted(res.collect(), key=lambda r: r["interval_ts"])
    assert len(rows) == len(T72) - 1
    assert rows[0]["sum_one"] == 0 and rows[-1]["sum_one"] == 0
    assert max(r["sum_one"] for r in rows) == 20  # largest creation wave


def test_agg_by_ts_custom_default_equivalence(bld_db):
    """testOSMContributionCustomDefault / testOSMEntitySnapshotCustomDefault:
    aggregateByTimestamp(row timestamp) == automatic."""
    v = _bld_contrib(bld_db, T72)
    auto = {
        r["interval_ts"]: r["cnt"]
        for r in v.aggregate_by_timestamp().count().collect()
    }
    custom = {
        r["interval_ts"]: r["cnt"]
        for r in v.aggregate_by_timestamp(F.col("ts")).count().collect()
    }
    assert auto == custom

    s = _bld_snap(bld_db, T6)
    auto = {
        r["snap_ts"]: r["cnt"]
        for r in s.aggregate_by_timestamp().count().collect()
    }
    custom = {
        r["snap_ts"]: r["cnt"]
        for r in s.aggregate_by_timestamp(F.col("snap_ts")).count().collect()
    }
    assert auto == custom


def test_agg_by_ts_custom_constant(bld_db):
    """testOSMContributionCustom/testOSMEntitySnapshotCustom: map everything
    to the first timestamp -> one non-zero bucket, full zerofill."""
    v = _bld_contrib(bld_db, T72)
    rows = (
        v.aggregate_by_timestamp(F.lit(int(T72[0])).cast("long"))
        .count()
        .collect()
    )
    assert len(rows) == len(T72) - 1
    assert sum(1 for r in rows if r["cnt"] > 0) == 1

    s = _bld_snap(bld_db, T6)
    rows = (
        s.aggregate_by_timestamp(F.lit(int(T6[0])).cast("long"))
        .count()
        .collect()
    )
    assert len(rows) == len(T6)
    assert sum(1 for r in rows if r["cnt"] > 0) == 1


def test_agg_by_ts_invalid_custom_index(bld_db):
    """testInvalidUsage: custom index outside the query interval fails."""
    v = _bld_contrib(bld_db, T2)
    agg = v.aggregate_by_timestamp(F.lit(int(T72[0])).cast("long") - 10_000_000)
    with pytest.raises(Exception, match="Aggregation timestamp outside"):
        agg.count().collect()


def test_agg_by_ts_map_before_after(bld_db):
    """testMapperFunctions: map before vs after aggregation is identical."""
    v = _bld_contrib(bld_db, T72)
    before = {
        r["interval_ts"]: r["sum_seven"]
        for r in v.transform(lambda df: df.withColumn("seven", F.lit(7)))
        .aggregate_by_timestamp()
        .sum("seven")
        .collect()
    }
    after = {
        r["interval_ts"]: r["sum_seven"]
        for r in v.aggregate_by_timestamp()
        .transform(lambda df: df.withColumn("seven", F.lit(7)))
        .sum("seven")
        .collect()
    }
    assert before == after


def test_agg_by_ts_combined_index_order(bld_db):
    """testCombinedWithAggregateByIndex(+Order): timestamp+index combined
    grouping, in both chain orders."""
    s = _bld_snap(bld_db, [T6[-1]])
    res = s.aggregate_by_timestamp().aggregate_by("type").count()
    rows = res.collect()
    assert [(r["snap_ts"], r["type"], r["cnt"]) for r in rows] == [
        (T6[-1], "way", N_WAYS)
    ]

    s2 = _bld_snap(bld_db, T6)
    a = {
        (r["snap_ts"], r["type"]): r["cnt"]
        for r in s2.aggregate_by_timestamp().aggregate_by("type").count().collect()
    }
    b = {
        (r["snap_ts"], r["type"]): r["cnt"]
        for r in s2.aggregate_by("type").aggregate_by_timestamp().count().collect()
    }
    assert a == b


# -- TestAutoAggregation --------------------------------------------------------


def test_auto_aggregation_geometry_map_order(hwy_db):
    """TestAutoAggregation: map before vs after aggregateByGeometry gives the
    same per-zone result (the reference's node: uid summed inside a zone
    containing the point)."""
    zone = {
        "type": "Polygon",
        "coordinates": [[[0, 0], [20, 0], [20, 20], [0, 20], [0, 0]]],
    }
    view = SnapshotView.on(hwy_db).timestamps(T1).filter("type:node")

    after = (
        view.aggregate_by_geometry({"TEST": zone})
        .transform(lambda df: df.withColumn("u", F.col("uid")))
        .sum("u")
    )
    before = (
        view.transform(lambda df: df.withColumn("u", F.col("uid")))
        .aggregate_by_geometry({"TEST": zone})
        .sum("u")
    )
    got_after = {r["zone_key"]: r["sum_u"] for r in after.collect()}
    got_before = {r["zone_key"]: r["sum_u"] for r in before.collect()}
    expected_uid = _node_asof(T1[0])[1]
    assert got_after == got_before == {"TEST": expected_uid}

    # collect shape (testMapThenAggregateByGeometryCollect)
    res = (
        view.transform(lambda df: df.withColumn("u", F.col("uid")))
        .aggregate_by_geometry({"TEST": zone})
        .collect("u")
    )
    got = {r["zone_key"]: list(r["collect_u"]) for r in res.collect()}
    assert got == {"TEST": [expected_uid]}


# -- QuantilesTest -------------------------------------------------------------

QS = [0.0, 0.2, 0.4, 0.6, 0.8, 1.0]


def _interp_quantile(sorted_vals: list[float], q: float) -> float:
    """The reference's assertApproximateQuantiles expectation
    (QuantilesTest.java:39-53): linear interpolation between order stats."""
    idx = (len(sorted_vals) - 1) * q
    lo = int(idx)
    hi = min(lo + 1, len(sorted_vals) - 1)
    frac = idx - lo
    return (1 - frac) * sorted_vals[lo] + frac * sorted_vals[hi]


@pytest.fixture(scope="module")
def quant_view(bld_db):
    # 41 of the 42 ways -> (n-1)*q integral for every q in QS, so the
    # interpolated expectation coincides with an exact order statistic and
    # the sketch result must match it exactly (the reference's 1e-4
    # relative gate)
    # nverts = geometry coordinate count (the reference maps
    # getGeometry().getCoordinates().length; the snapshot df carries wkt)
    return (
        _bld_snap(bld_db, T1)
        .transform(lambda df: df.filter(F.col("id") <= 41))
        .transform(
            lambda df: df.withColumn("nverts", F.size(F.split("wkt", ",")))
        )
    )


def test_quantiles_median_and_single(quant_view):
    vals = sorted(
        r["nverts"] for r in quant_view.dataframe().select("nverts").collect()
    )
    assert len(vals) == 41
    got = quant_view.estimated_quantile("nverts", 0.5)
    assert got == pytest.approx(_interp_quantile(vals, 0.5), rel=1e-4)
    got = quant_view.estimated_quantile("nverts", 0.8)
    assert got == pytest.approx(_interp_quantile(vals, 0.8), rel=1e-4)


def test_quantiles_list_and_function(quant_view):
    vals = sorted(
        r["nverts"] for r in quant_view.dataframe().select("nverts").collect()
    )
    got = quant_view.estimated_quantiles("nverts", QS)
    for q, g in zip(QS, got):
        assert g == pytest.approx(_interp_quantile(vals, q), rel=1e-4)


def test_quantiles_map_aggregator(bld_db):
    """testQuantile(s)MapAggregator: per-timestamp quantiles vs per-timestamp
    collected values."""
    view = (
        _bld_snap(bld_db, T6[-2:])
        .transform(lambda df: df.filter(F.col("id") <= 41))
        .transform(
            lambda df: df.withColumn("nverts", F.size(F.split("wkt", ",")))
        )
    )
    per_ts: dict[int, list[int]] = {}
    for r in view.dataframe().select("snap_ts", "nverts").collect():
        per_ts.setdefault(r["snap_ts"], []).append(r["nverts"])
    for v in per_ts.values():
        v.sort()

    agg = view.aggregate_by_timestamp()
    single = {
        r["snap_ts"]: r["q80_nverts"]
        for r in agg.estimated_quantile("nverts", 0.8).collect()
        if r["q80_nverts"] is not None
    }
    for ts, got in single.items():
        assert got == pytest.approx(_interp_quantile(per_ts[ts], 0.8), rel=1e-4)

    multi = {
        r["snap_ts"]: r["quantiles_nverts"]
        for r in agg.estimated_quantiles("nverts", QS).collect()
        if r["quantiles_nverts"] is not None
    }
    for ts, got in multi.items():
        for q, g in zip(QS, got):
            assert g == pytest.approx(_interp_quantile(per_ts[ts], q), rel=1e-4)


# ---------------------------------------------------------------------------
# reference-name conveniences: map (alias of transform), forEach,
# estimatedMedian, isCancelable, tagInterpreter
# (MapReducer.java:220-228,430-448,1061-1069,1354-1360)
# ---------------------------------------------------------------------------


def test_map_alias_and_for_each(spark, hwy_db):
    from pyspark.sql import functions as F

    red = _hwy_snap(hwy_db).map(
        lambda df: df.select("id", (F.col("id") * 2).alias("dbl"))
    )
    rows = [(r["id"], r["dbl"]) for r in red.dataframe().collect()]
    assert rows and all(d == 2 * i for i, d in rows)

    seen = []
    red.for_each(lambda r: seen.append(r["id"]))
    assert sorted(seen) == sorted(i for i, _ in rows)


def test_estimated_median_and_cancelable(spark, hwy_db):
    red = _hwy_snap(hwy_db)
    assert red.estimated_median("id") == red.estimated_quantile("id", 0.5)
    assert red.is_cancelable() is True


def test_tag_interpreter_override(spark, hwy_db):
    from oshdb_spark.geometry.taginterpreter import TagInterpreter

    base = _hwy_snap(hwy_db)
    override = TagInterpreter()
    red = base.tag_interpreter(override)
    assert red.db.interpreter is override
    assert base.db.interpreter is not override  # immutably chained
    assert red.db.entities is base.db.entities
    # the chain state (timestamps, filters) carries over untouched
    assert red.state == base.state
