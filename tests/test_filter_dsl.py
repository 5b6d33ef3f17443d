"""Filter DSL parser + Column-compilation tests.

Scenario shapes mirror the reference's oshdb-filter test suite
(ParseTest / ApplyOSMTest / NormalizeTest): precedence, negation,
in-lists, id ranges, quoted strings, type narrowing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oshdb_spark.filters.dsl import (
    FilterParseError,
    TagTranslator,
    parse_filter,
)

TR = TagTranslator(
    keys={"building": 2, "highway": 3, "name": 7, "area": 1, "name:it": 12},
    values={
        ("building", "yes"): 1,
        ("building", "no"): 2,
        ("highway", "residential"): 1,
        ("highway", "living_street"): 2,
        ("highway", "service"): 3,
        ("name:it", "Roma"): 9,
    },
)


@pytest.fixture(scope="module")
def ents(spark):
    rows = [
        # id, type, tags
        (1, "node", {7: 5}),
        (2, "way", {2: 1}),            # building=yes
        (3, "way", {2: 2}),            # building=no
        (4, "way", {3: 1}),            # highway=residential
        (5, "way", {3: 3}),            # highway=service
        (6, "relation", {2: 1}),       # building=yes relation
        (7, "node", {12: 9}),          # name:it=Roma
        (8, "way", {}),
    ]
    return spark.createDataFrame(rows, "id long, type string, tags map<int,int>")


def ids(df, node, **kw):
    return sorted(r["id"] for r in df.filter(node.osm_column()).collect())


def test_tag_equals(ents):
    assert ids(ents, parse_filter("building=yes", TR)) == [2, 6]


def test_tag_equals_any(ents):
    assert ids(ents, parse_filter("building=*", TR)) == [2, 3, 6]


def test_tag_not_equals(ents):
    # key!=value == not key=value (matches entities without the tag too)
    assert ids(ents, parse_filter("building!=yes", TR)) == [1, 3, 4, 5, 7, 8]


def test_tag_not_equals_any(ents):
    assert ids(ents, parse_filter("building!=*", TR)) == [1, 4, 5, 7, 8]


def test_tag_in(ents):
    got = ids(ents, parse_filter("highway in (residential, living_street)", TR))
    assert got == [4]


def test_and_or_precedence(ents):
    # and binds tighter than or
    got = ids(ents, parse_filter("building=yes and type:way or type:node", TR))
    assert got == [1, 2, 7]


def test_parens_override(ents):
    got = ids(ents, parse_filter("building=yes and (type:way or type:node)", TR))
    assert got == [2]


def test_not(ents):
    got = ids(ents, parse_filter("not type:node", TR))
    assert got == [2, 3, 4, 5, 6, 8]


def test_type_filter(ents):
    assert ids(ents, parse_filter("type:relation", TR)) == [6]


def test_id_equals(ents):
    assert ids(ents, parse_filter("id:4", TR)) == [4]


def test_id_typed(ents):
    assert ids(ents, parse_filter("id:way/2", TR)) == [2]
    assert ids(ents, parse_filter("id:node/2", TR)) == []


def test_id_list(ents):
    assert ids(ents, parse_filter("id:(1,2,3)", TR)) == [1, 2, 3]
    assert ids(ents, parse_filter("id:(node/1,way/2)", TR)) == [1, 2]


def test_id_range(ents):
    assert ids(ents, parse_filter("id:(3..5)", TR)) == [3, 4, 5]
    assert ids(ents, parse_filter("id:(..2)", TR)) == [1, 2]
    assert ids(ents, parse_filter("id:(6..)", TR)) == [6, 7, 8]


def test_quoted_key(ents):
    assert ids(ents, parse_filter('"name:it"="Roma"', TR)) == [7]
    # unquoted keys with colons also work (allowed chars)
    assert ids(ents, parse_filter("name:it=Roma", TR)) == [7]


def test_unknown_tag_matches_nothing(ents):
    assert ids(ents, parse_filter("nonexistent=foo", TR)) == []
    # but its negation matches everything
    assert len(ids(ents, parse_filter("nonexistent!=foo", TR))) == 8


def test_whitespace_tolerance(ents):
    assert ids(ents, parse_filter("building = yes", TR)) == [2, 6]
    assert ids(ents, parse_filter("type : way and building = *", TR)) == [2, 3]


def test_type_narrowing():
    # DNF type narrowing (MapReducer.java:1910-1935 semantics)
    assert parse_filter("type:node", TR).osm_types() == {"node"}
    assert parse_filter("type:way and building=yes", TR).osm_types() == {"way"}
    assert parse_filter("geometry:polygon", TR).osm_types() == {"way", "relation"}
    assert parse_filter("geometry:polygon and type:way", TR).osm_types() == {"way"}
    assert parse_filter("type:node or type:way", TR).osm_types() == {"node", "way"}
    assert parse_filter("not type:node", TR).osm_types() == {"node", "way", "relation"}
    assert parse_filter("geometry:point", TR).osm_types() == {"node"}


def test_geometry_metric_range_parse():
    f = parse_filter("area:(123.4..1E6)", TR)
    assert f.lo == 123.4 and f.hi == 1e6
    f = parse_filter("length:(100..)", TR)
    assert f.lo == 100.0 and f.hi is None
    f = parse_filter("geometry.outers:1", TR)
    assert f.lo == 1.0 and f.hi == 1.0


def test_geometry_metric_column(spark):
    rows = [(1, 50.0, 10.0), (2, 2000.0, 300.0), (3, 0.0, 700.0)]
    df = spark.createDataFrame(rows, "id long, area double, length double")
    f = parse_filter("area:(100..1E5)", TR)
    assert [r["id"] for r in df.filter(f.osm_column()).collect()] == [2]
    f = parse_filter("length:(500..)", TR)
    assert [r["id"] for r in df.filter(f.osm_column()).collect()] == [3]


def test_contribution_filters(spark):
    rows = [(1, 10, 100), (2, 42, 200), (3, 50, 300)]
    df = spark.createDataFrame(rows, "id long, changeset long, contrib_uid long")
    f = parse_filter("changeset:42", TR)
    assert [r["id"] for r in df.filter(f.osm_column()).collect()] == [2]
    f = parse_filter("changeset:(10,50)", TR)
    assert sorted(r["id"] for r in df.filter(f.osm_column()).collect()) == [1, 3]
    f = parse_filter("contributor:(150..350)", TR)
    assert sorted(r["id"] for r in df.filter(f.osm_column()).collect()) == [2, 3]


def test_geometry_type_on_wkt(spark):
    rows = [
        (1, "POINT (1 2)"),
        (2, "LINESTRING (0 0, 1 1)"),
        (3, "POLYGON ((0 0, 1 0, 1 1, 0 0))"),
        (4, "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))"),
        (5, "GEOMETRYCOLLECTION (POINT (1 2))"),
    ]
    df = spark.createDataFrame(rows, "id long, wkt string")
    assert [r["id"] for r in df.filter(parse_filter("geometry:point", TR).osm_column()).collect()] == [1]
    assert [r["id"] for r in df.filter(parse_filter("geometry:line", TR).osm_column()).collect()] == [2]
    got = sorted(r["id"] for r in df.filter(parse_filter("geometry:polygon", TR).osm_column()).collect())
    assert got == [3, 4]
    assert [r["id"] for r in df.filter(parse_filter("geometry:other", TR).osm_column()).collect()] == [5]


def test_parse_errors():
    # "" is NOT an error: it parses to the constant-true filter
    # (ParseTest.testEmptyFilter; see test_filter_parse.py)
    for bad in ["and", "building=", "type:spaceship", "id:(", "building=yes or"]:
        with pytest.raises((FilterParseError, ValueError)):
            parse_filter(bad, TR)


def test_complex_real_world(ents):
    # the reference README's "buildings" example
    f = parse_filter("building=* and building!=no and type:way", TR)
    assert ids(ents, f) == [2]
