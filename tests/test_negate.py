"""1:1 port of the reference's NegateTest
(oshdb-filter/src/test/java/.../filter/NegateTest.java): `negate()` on
every filter kind inverts the match on every sample entity, double
negation restores the original, and the binary operators push negation
down De Morgan-style (AndOperator.negate() -> OrOperator of negated
operands and vice versa).

Structural translation: the reference encodes "not equals" as dual
classes (TagFilterEquals <-> TagFilterNotEquals); this engine encodes
it as NotOp(TagEquals), so the dual-class assertions become NotOp
wrap/unwrap assertions — semantics identical (ParseTest pins the
parser side).
"""

from __future__ import annotations

import pytest

from oshdb_spark.filters.dsl import (
    AndOp,
    ConstantFilter,
    NotOp,
    OrOp,
    TagTranslator,
    parse_filter,
)

TR = TagTranslator(
    keys={"building": 2, "highway": 3},
    values={
        ("highway", "residential"): 1,
        ("highway", "track"): 2,
        ("building", "yes"): 3,
    },
)

# one row per OSM type + geometry kind (testAllOSMTypes /
# testAllGeometryTypes sample entities)
ROWS = [
    (1, "node", {3: 1}, "POINT (1 1)", 0.0, 0.0, 10, 100),
    (2, "way", {3: 2}, "LINESTRING (0 0, 1 1)", 0.0, 1.0, 11, 101),
    (3, "way", {2: 3}, "POLYGON ((0 0, 1 0, 1 1, 0 0))", 1.0, 4.0, 12, 102),
    (4, "relation", {2: 3}, "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))",
     1.0, 4.0, 13, 103),
    (5, "relation", {}, "GEOMETRYCOLLECTION (POINT (1 1))", 0.0, 0.0,
     14, 104),
]

SCHEMA = (
    "id long, type string, tags map<int,int>, wkt string, area double, "
    "length double, changeset long, contrib_uid int"
)


@pytest.fixture(scope="module")
def ents(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _assert_inverts(ents, expr):
    """expression.applyOSM(e) != negation.applyOSM(e) for every sample
    entity, and double negation restores the original."""
    neg = expr.negate()
    got = ents.select(
        expr.osm_column().alias("a"),
        neg.osm_column().alias("b"),
        neg.negate().osm_column().alias("c"),
    ).collect()
    for r in got:
        assert bool(r["a"]) != bool(r["b"])
        assert bool(r["a"]) == bool(r["c"])


@pytest.mark.parametrize(
    "selector",
    [
        "highway=residential",      # testTagFilterEquals
        "highway!=residential",     # testTagFilterNotEquals
        "highway=*",                # testTagFilterEqualsAny
        "highway!=*",               # testTagFilterNotEqualsAny
        "highway in (residential, track)",  # testTagFilterEqualsAnyOf
        "id:1",                     # testIdEqualsFilter
        "id:(1,3)",                 # testIdEqualsAnyOfFilter
        "id:(1..3)",                # testIdInRangeFilter
        "type:node",                # testTypeFilter
        "geometry:point",           # testGeometryTypePoint
        "geometry:line",            # testGeometryTypeLine
        "geometry:polygon",         # testGeometryTypePolygon
        "geometry:other",           # testGeometryTypeOther
    ],
)
def test_negate_inverts(ents, selector):
    _assert_inverts(ents, parse_filter(selector, TR))


def test_not_equals_structure():
    """TagFilterEquals.negate() is the not-equals form and vice versa —
    here: NotOp wrap/unwrap."""
    eq = parse_filter("highway=residential", TR)
    neq = eq.negate()
    assert isinstance(neq, NotOp) and neq.child is eq
    assert neq.negate() is eq


def test_and_operator(ents):
    """testAndOperator: negation of AND is OR of the negated operands."""
    expr = parse_filter("type:node and type:way", TR)
    assert isinstance(expr, AndOp)
    neg = expr.negate()
    assert isinstance(neg, OrOp)
    _assert_inverts(ents, expr.left)
    _assert_inverts(ents, expr.right)
    # the pushed-down operands are the negations of the originals
    got = ents.select(
        expr.left.osm_column().alias("a"),
        neg.left.osm_column().alias("na"),
        expr.right.osm_column().alias("b"),
        neg.right.osm_column().alias("nb"),
    ).collect()
    for r in got:
        assert bool(r["a"]) != bool(r["na"])
        assert bool(r["b"]) != bool(r["nb"])


def test_or_operator(ents):
    """testOrOperator: negation of OR is AND of the negated operands."""
    expr = parse_filter("type:node or type:way", TR)
    assert isinstance(expr, OrOp)
    neg = expr.negate()
    assert isinstance(neg, AndOp)
    got = ents.select(
        expr.osm_column().alias("a"), neg.osm_column().alias("b")
    ).collect()
    for r in got:
        assert bool(r["a"]) != bool(r["b"])


def test_constant(ents):
    """testConstant: the constant filter flips its state."""
    expr = ConstantFilter(True)
    neg = expr.negate()
    assert isinstance(neg, ConstantFilter)
    assert neg.state is False
    got = ents.select(
        expr.osm_column().alias("a"), neg.osm_column().alias("b")
    ).collect()
    for r in got:
        assert bool(r["a"]) != bool(r["b"])


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
