"""Geometry metric filters (geometry.vertices/outers/inners/roundness/
squareness) — ported from the reference's ApplyOSMGeometryTest
(/root/reference/oshdb-filter/src/test/java/org/heigit/ohsome/oshdb/filter/ApplyOSMGeometryTest.java:217-447),
same geometries and thresholds, evaluated through the engine's column
path: geometry_metrics_udf attaches the metric columns, the parsed DSL
node compiles to the predicate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oshdb_spark.filters.dsl import metrics_needed, parse_filter
from oshdb_spark.operators.geometry_ops import geometry_metrics_udf
from tests.test_api import db, tag_flip_db  # noqa: F401 (pytest fixtures)

REGULAR_32GON = (
    "POLYGON ((1.0000004 0, 0.9807856 0.1950904, 0.9238799 0.3826836, "
    "0.8314699 0.5555704, 0.707107 0.707107, 0.5555704 0.8314699, "
    "0.3826836 0.9238799, 0.1950904 0.9807856, 0 1.0000004, "
    "-0.1950904 0.9807856, -0.3826836 0.9238799, -0.5555704 0.8314699, "
    "-0.707107 0.707107, -0.8314699 0.5555704, -0.9238799 0.3826836, "
    "-0.9807856 0.1950904, -1.0000004 0, -0.9807856 -0.1950904, "
    "-0.9238799 -0.3826836, -0.8314699 -0.5555704, -0.707107 -0.707107, "
    "-0.5555704 -0.8314699, -0.3826836 -0.9238799, -0.1950904 -0.9807856, "
    "0 -1.0000004, 0.1950904 -0.9807856, 0.3826836 -0.9238799, "
    "0.5555704 -0.8314699, 0.707107 -0.707107, 0.8314699 -0.5555704, "
    "0.9238799 -0.3826836, 0.9807856 -0.1950904, 1.0000004 0))"
)


def _bbox_poly(minx, miny, maxx, maxy):
    return (
        f"POLYGON (({minx} {miny}, {maxx} {miny}, {maxx} {maxy}, "
        f"{minx} {maxy}, {minx} {miny}))"
    )


def _line_n(n):
    return "LINESTRING (" + ", ".join(f"{i} {i}" for i in range(1, n + 1)) + ")"


def _poly_n(n):
    """Polygon whose ring has n points incl. closure (ApplyOSMGeometryTest
    testGeometryFilterVerticesPolygon: n-1 distinct coords + repeat)."""
    pts = [f"{i} {i * i}" for i in range(1, n)] + ["1 1"]
    return "POLYGON ((" + ", ".join(pts) + "))"


def _apply(spark, filter_text, wkts):
    """applyOSMGeometry analog: metric columns from the UDF, then the
    compiled predicate; returns the per-wkt booleans in input order."""
    node = parse_filter(filter_text)
    df = spark.createDataFrame([(i, w) for i, w in enumerate(wkts)], "i int, wkt string")
    m = geometry_metrics_udf()(F.lit(None).cast("binary"), F.col("wkt"))
    for c in ("g_vertices", "g_outers", "g_inners", "g_roundness", "g_squareness"):
        df = df.withColumn(c, m[c])
    rows = df.withColumn("ok", node.osm_column()).orderBy("i").collect()
    return [bool(r["ok"]) for r in rows]


def test_metrics_needed_detection():
    assert metrics_needed(parse_filter("geometry.vertices:(11..13)")) == {"vertices"}
    assert metrics_needed(
        parse_filter("geometry.roundness:(0.8..) or geometry.outers:1")
    ) == {"roundness", "outers"}
    assert metrics_needed(parse_filter("area:(1.0..2.0)")) == set()


def test_vertices_point_line(spark):
    # testGeometryFilterVerticesPoint + ...Line
    out = _apply(
        spark,
        "geometry.vertices:(11..13)",
        ["POINT (0 0)"] + [_line_n(n) for n in (10, 11, 12, 13, 14)],
    )
    assert out == [False, False, True, True, True, False]


def test_vertices_polygon(spark):
    out = _apply(
        spark,
        "geometry.vertices:(11..13)",
        [_poly_n(n) for n in (10, 11, 12, 13, 14)],
    )
    assert out == [False, True, True, True, False]


def test_vertices_polygon_with_hole(spark):
    # outer shell is a simple bbox with 5 points; inner ring has n-5 points
    def poly_hole(n):
        n -= 5
        inner = ", ".join([f"{i} {i * i}" for i in range(1, n)] + ["1 1"])
        outer = "-80 -80, 80 -80, 80 80, -80 80, -80 -80"
        return f"POLYGON (({outer}), ({inner}))"

    out = _apply(
        spark,
        "geometry.vertices:(11..13)",
        [poly_hole(n) for n in (10, 11, 12, 13, 14)],
    )
    assert out == [False, True, True, True, False]


def test_vertices_multipolygon(spark):
    def mp(n):
        n -= 5
        coords = ", ".join([f"{i} {i * i}" for i in range(1, n)] + ["1 1"])
        return f"MULTIPOLYGON (((-2 -2, -1 -2, -1 -1, -2 -1, -2 -2)), (({coords})))"

    out = _apply(
        spark,
        "geometry.vertices:(11..13)",
        [mp(n) for n in (10, 11, 12, 13, 14)],
    )
    assert out == [False, True, True, True, False]


def test_outers(spark):
    two_sq = (
        "MULTIPOLYGON (((1 1, 2 1, 2 2, 1 2, 1 1)), ((3 3, 4 3, 4 4, 3 4, 3 3)))"
    )
    one_sq = "MULTIPOLYGON (((1 1, 2 1, 2 2, 1 2, 1 1)))"
    out = _apply(
        spark,
        "geometry.outers:1",
        ["POINT (0 0)", "LINESTRING (0 0, 1 0, 1 1)", _bbox_poly(1, 1, 2, 2),
         two_sq, one_sq],
    )
    assert out == [False, False, True, False, True]
    out2 = _apply(
        spark, "geometry.outers:(2..)",
        ["POINT (0 0)", _bbox_poly(1, 1, 2, 2), two_sq],
    )
    assert out2 == [False, False, True]


def test_inners(spark):
    holed = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 4 6, 6 6, 6 4, 4 4))"
    out = _apply(
        spark,
        "geometry.inners:0",
        ["POINT (0 0)", "LINESTRING (0 0, 1 0, 1 1)", _bbox_poly(1, 1, 2, 2), holed],
    )
    # non-polygonal -> -1 sentinel, so inners:0 rejects points and lines
    assert out == [False, False, True, False]
    assert _apply(spark, "geometry.inners:1", [holed]) == [True]


def test_roundness(spark):
    # square < 0.8, regular 32-gon >= 0.8 (testGeometryFilterRoundness)
    out = _apply(
        spark, "geometry.roundness:(0.8..)", [_bbox_poly(0, 0, 1, 1), REGULAR_32GON]
    )
    assert out == [False, True]


def test_squareness(spark):
    # square >= 0.8, regular 32-gon < 0.8 (testGeometryFilterSqareness)
    out = _apply(
        spark, "geometry.squareness:(0.8..)", [_bbox_poly(0, 0, 1, 1), REGULAR_32GON]
    )
    assert out == [True, False]


def test_snapshot_view_e2e(db):
    """End-to-end through the SnapshotView: metric columns are attached
    lazily only when the filter needs them."""
    from oshdb_spark.api import SnapshotView
    from tests.test_api import TS

    base = SnapshotView.on(db).timestamps([TS[3]]).filter("geometry:polygon")
    n_all = base.count()
    n_sq = (
        SnapshotView.on(db)
        .timestamps([TS[3]])
        .filter("geometry:polygon and geometry.squareness:(0.5..)")
        .count()
    )
    n_v = (
        SnapshotView.on(db)
        .timestamps([TS[3]])
        .filter("geometry:polygon and geometry.vertices:(4..)")
        .count()
    )
    assert 0 < n_v <= n_all
    assert 0 <= n_sq <= n_all
    # plan hygiene: no metric columns unless requested
    assert "g_vertices" not in base.dataframe().columns


@pytest.fixture()
def vertex_change_db(spark):
    """way 10: v1 = 3-vertex line, v2 = 5-vertex line."""
    from oshdb_spark.api import OSHDB
    from tests.test_api import ENT_SCHEMA, TR

    rows = [
        ("d1", n, "node", 1, True, 50, 1, 1, {}, n * 10_000_000, 0, None, None)
        for n in (1, 2, 3, 4, 5)
    ] + [
        ("d1", 10, "way", 1, True, 100, 2, 1, {}, None, None, [1, 2, 3], None),
        ("d1", 10, "way", 2, True, 200, 3, 1, {}, None, None,
         [1, 2, 3, 4, 5], None),
    ]
    return OSHDB(spark, spark.createDataFrame(rows, ENT_SCHEMA), translator=TR)


def test_contribution_metric_aliveness(vertex_change_db):
    """Derived geometry metric filters participate in contribution
    ALIVENESS (FilterExpression.java:98-113 applies geometry predicates
    uniformly to before/after states): a way that grows past the vertex
    bound yields a DELETION under ``vertices:(..3)`` and a CREATION under
    ``vertices:(4..)``."""
    from oshdb_spark.api import ContributionView

    df = (
        ContributionView.on(vertex_change_db)
        .timestamps([0, 1000])
        .filter("type:way and geometry.vertices:(..3)")
        .dataframe()
    )
    rows = {r["ts"]: list(r["contrib_types"]) for r in df.collect()}
    assert rows == {100: ["CREATION"], 200: ["DELETION"]}

    df2 = (
        ContributionView.on(vertex_change_db)
        .timestamps([0, 1000])
        .filter("type:way and geometry.vertices:(4..)")
        .dataframe()
    )
    rows2 = {r["ts"]: list(r["contrib_types"]) for r in df2.collect()}
    assert rows2 == {200: ["CREATION"]}
