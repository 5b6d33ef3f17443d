"""Filter-DSL grammar parity.

1:1 port of ParseTest.java (reference oshdb-filter): every accepted
syntax form maps to the analogous AST node in filters/dsl.py.  Where the
reference's AST differs structurally (e.g. `highway!=x` parses to a
dedicated TagFilterNotEquals while we build NotOp(TagEquals) — identical
semantics via negation, FilterParser.java builds the same pairs), the
test asserts our equivalent shape.  Deviation: `contributor:` filters
need an opt-in flag in the reference parser; our parser always accepts
them and the view layer decides applicability.
"""

from __future__ import annotations

import pytest

from oshdb_spark.filters.dsl import (
    AndOp,
    ConstantFilter,
    ContributionColFilter,
    FilterParseError,
    GeometryMetricFilter,
    GeometryTypeFilter,
    IdFilter,
    NotOp,
    OrOp,
    TagEquals,
    TagEqualsAny,
    TagIn,
    TagTranslator,
    TypeFilter,
    parse_filter,
)

K = {"highway": 1, "name": 2, "addr:street": 3, "building": 4}
V = {("highway", "residential"): 1, ("highway", "track"): 2,
     ("name", "Colorado River"): 1, ("name", "a0_-:"): 2,
     ("addr:street", "Hauptstraße"): 1, ("building", "yes"): 1}
TR = TagTranslator(keys=K, values=V)


def _p(s):
    return parse_filter(s, TR)


class TestTagFilters:
    def test_tag_filter_equals(self):
        e = _p("highway=residential")
        assert isinstance(e, TagEquals)
        assert (e.key, e.value) == ("highway", "residential")

    def test_tag_filter_strings(self):
        # key with colon; quoted value; whitespace around '='; allowed
        # bare-word characters a-z A-Z 0-9 _ - :
        assert isinstance(_p('addr:street="Hauptstraße"'), TagEquals)
        assert isinstance(_p('name = "Colorado River"'), TagEquals)
        assert isinstance(_p("name=a0_-:"), TagEquals)

    def test_tag_filter_equals_any(self):
        e = _p("highway=*")
        assert isinstance(e, TagEqualsAny)
        assert e.key == "highway"

    def test_tag_filter_not_equals(self):
        e = _p("highway!=residential")
        assert isinstance(e, NotOp) and isinstance(e.child, TagEquals)

    def test_tag_filter_not_equals_any(self):
        e = _p("highway!=*")
        assert isinstance(e, NotOp) and isinstance(e.child, TagEqualsAny)

    def test_tag_filter_equals_any_of(self):
        e = _p("highway in (residential, track)")
        assert isinstance(e, TagIn)
        assert e.key == "highway"
        assert sorted(e.values) == ["residential", "track"]

    def test_tag_filter_not_equals_any_of(self):
        e = _p("not highway in (residential, track)")
        assert isinstance(e, NotOp) and isinstance(e.child, TagIn)


class TestIdFilters:
    def test_id_filter_equals(self):
        e = _p("id:123")
        assert isinstance(e, IdFilter)
        assert e.ids == [(None, 123)]

    def test_id_type_filter_equals(self):
        e = _p("id:node/123")
        assert isinstance(e, IdFilter)
        assert e.ids == [("node", 123)]

    def test_id_filter_not_equals(self):
        e = _p("not id:123")
        assert isinstance(e, NotOp) and isinstance(e.child, IdFilter)

    def test_id_filter_equals_any_of(self):
        e = _p("id:(1,2,3)")
        assert isinstance(e, IdFilter)
        assert e.ids == [(None, 1), (None, 2), (None, 3)]

    def test_id_type_filter_equals_any_of(self):
        e = _p("id:(node/1,way/2)")
        assert isinstance(e, IdFilter)
        assert e.ids == [("node", 1), ("way", 2)]

    def test_id_filter_in_range(self):
        e = _p("id:(1..3)")
        assert isinstance(e, IdFilter) and (e.lo, e.hi) == (1, 3)
        e = _p("id:(..3)")
        assert isinstance(e, IdFilter) and (e.lo, e.hi) == (None, 3)
        e = _p("id:(1..)")
        assert isinstance(e, IdFilter) and (e.lo, e.hi) == (1, None)
        # reverse order normalizes (IdRange.java:22-25)
        e = _p("id:(3..1)")
        assert isinstance(e, IdFilter) and (e.lo, e.hi) == (1, 3)


class TestTypeAndBooleans:
    def test_type_filter(self):
        e = _p("type:node")
        assert isinstance(e, TypeFilter) and e.osm_type == "node"
        assert _p("type:way").osm_type == "way"
        assert _p("type:relation").osm_type == "relation"

    def test_and_operator(self):
        e = _p("highway=residential and name=*")
        assert isinstance(e, AndOp)
        assert isinstance(e.left, TagEquals)
        assert isinstance(e.right, TagEqualsAny)

    def test_or_operator(self):
        e = _p("highway=residential or name=*")
        assert isinstance(e, OrOp)
        assert isinstance(e.left, TagEquals)
        assert isinstance(e.right, TagEqualsAny)

    def test_padding_whitespace(self):
        assert isinstance(_p(" type:node "), TypeFilter)

    def test_parentheses(self):
        for s in (
            "type:way and (highway=residential or highway=track)",
            "type:way and ( highway=residential or highway=track )",
            "(type:way)and(highway=residential or highway=track)",
        ):
            e = _p(s)
            assert isinstance(e, AndOp)
            assert isinstance(e.left, TypeFilter)
            assert isinstance(e.right, OrOp)

    @pytest.mark.parametrize("empty", ["", " ", "\t", "\n", " \n "])
    def test_empty_filter(self, empty):
        e = _p(empty)
        assert isinstance(e, ConstantFilter)
        assert e.state is True


class TestGeometryFilters:
    @pytest.mark.parametrize("gt", ["point", "line", "polygon", "other"])
    def test_geometry_type_filter(self, gt):
        e = _p(f"geometry:{gt}")
        assert isinstance(e, GeometryTypeFilter)
        assert e.geom_type == gt

    def test_geometry_filter_area(self):
        e = _p("area:(1..10)")
        assert isinstance(e, GeometryMetricFilter)
        assert (e.metric, e.lo, e.hi) == ("area", 1.0, 10.0)
        assert isinstance(_p("area:(1.1..10.0)"), GeometryMetricFilter)
        assert isinstance(_p("area:(1.E-6..10.0)"), GeometryMetricFilter)
        e = _p("area:(1..)")
        assert (e.lo, e.hi) == (1.0, None)
        e = _p("area:(..1)")
        assert (e.lo, e.hi) == (None, 1.0)

    def test_geometry_filter_length(self):
        e = _p("length:(1..10)")
        assert isinstance(e, GeometryMetricFilter) and e.metric == "length"

    def test_geometry_filter_perimeter(self):
        e = _p("perimeter:(1..10)")
        assert isinstance(e, GeometryMetricFilter) and e.metric == "perimeter"

    def test_geometry_filter_vertices(self):
        e = _p("geometry.vertices:(1..10)")
        assert isinstance(e, GeometryMetricFilter) and e.metric == "vertices"

    def test_geometry_filter_outers(self):
        e = _p("geometry.outers:2")
        assert isinstance(e, GeometryMetricFilter)
        assert (e.metric, e.lo, e.hi) == ("outers", 2.0, 2.0)
        assert isinstance(_p("geometry.outers:(1..10)"), GeometryMetricFilter)

    def test_geometry_filter_inners(self):
        e = _p("geometry.inners:0")
        assert isinstance(e, GeometryMetricFilter)
        assert (e.metric, e.lo, e.hi) == ("inners", 0.0, 0.0)
        assert isinstance(_p("geometry.inners:(1..10)"), GeometryMetricFilter)

    def test_geometry_filter_roundness(self):
        e = _p("geometry.roundness:(0.8..)")
        assert isinstance(e, GeometryMetricFilter) and e.metric == "roundness"

    def test_geometry_filter_squareness(self):
        e = _p("geometry.squareness:(0.8..)")
        assert isinstance(e, GeometryMetricFilter) and e.metric == "squareness"


class TestContributionFilters:
    def test_changeset_id_filter(self):
        e = _p("changeset:42")
        assert isinstance(e, ContributionColFilter)
        assert e.col == "changeset" and e.ids == [42]

    def test_changeset_id_list_filter(self):
        e = _p("changeset:(1,2,3)")
        assert isinstance(e, ContributionColFilter)
        assert e.ids == [1, 2, 3]

    def test_changeset_id_range_filter(self):
        e = _p("changeset:(10..12)")
        assert isinstance(e, ContributionColFilter)
        assert (e.lo, e.hi) == (10, 12)

    def test_contributor_id_filter(self):
        e = _p("contributor:1")
        assert isinstance(e, ContributionColFilter)
        assert e.col == "contrib_uid" and e.ids == [1]

    def test_contributor_id_list_filter(self):
        e = _p("contributor:(1,2,3)")
        assert isinstance(e, ContributionColFilter) and e.ids == [1, 2, 3]

    def test_contributor_id_range_filter(self):
        e = _p("contributor:(10..12)")
        assert isinstance(e, ContributionColFilter)
        assert (e.lo, e.hi) == (10, 12)


class TestErrors:
    @pytest.mark.parametrize("bad", [
        "type:building",  # not an OSM type
        "geometry:square",  # not a geometry type
        "highway=residential and",  # dangling operator
        "((highway=residential)",  # unbalanced parens
        "id:",  # missing operand
    ])
    def test_rejected(self, bad):
        with pytest.raises(FilterParseError):
            _p(bad)
