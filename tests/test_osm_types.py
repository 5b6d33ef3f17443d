"""1:1 ports of the reference's OSM/OSH value-type test suites:

* OSHDBTagTest.java, OSHDBTagsTest.java, OSHDBRoleTest.java
  (/root/reference/oshdb/src/test/java/org/heigit/ohsome/oshdb/)
* OSMNodeTest.java, OSMWayTest.java, OSMRelationTest.java, OSMMemberTest.java
  (.../oshdb/osm/)
* OSHNodeTest.java, OSHWayTest.java, OSHRelationTest.java (.../oshdb/osh/)

Serialization round-trips use pickle in place of ObjectOutputStream.
The final test exercises the columnar bridge (entity_from_row) against the
real entities extraction on the shared testdata, so the object layer stays
wired to the engine rather than being an island.
"""

import pickle

import pytest

from oshdb_spark.osm_types import (
    OSHDBRole,
    OSHDBTag,
    OSHDBTagKey,
    OSHDBTags,
    OSHNode,
    OSHRelation,
    OSHWay,
    OSM,
    OSMMember,
    OSMType,
    entity_from_row,
)

USER_A = 1
TAGS_A = [1, 1]
LONLAT_A = [86756350, 494186210]
LONLAT_B = [87153340, 494102830]


# ---------------------------------------------------------------------- tag


class TestOSHDBTag:
    def test_basic(self):
        tag = OSHDBTag(10, 20)
        assert tag.get_key() == 10
        assert tag.get_value() == 20

    def test_comparable(self):
        tag = OSHDBTag(10, 10)
        assert tag.compare_to(OSHDBTag(10, 10)) == 0
        assert tag.compare_to(OSHDBTag(5, 10)) > 0
        assert tag.compare_to(OSHDBTag(10, 5)) > 0
        assert tag.compare_to(OSHDBTag(20, 10)) < 0
        assert tag.compare_to(OSHDBTag(10, 15)) < 0

    def test_hash_equal(self):
        tag = OSHDBTag(10, 10)
        assert tag == tag
        assert tag == OSHDBTag(10, 10)
        assert hash(tag) == hash(OSHDBTag(10, 10))
        assert tag != OSHDBTag(10, 20)
        assert tag != OSHDBTag(20, 10)
        assert tag != str(tag)


# --------------------------------------------------------------------- role


class TestOSHDBRole:
    def test_empty_role(self):
        empty = OSHDBRole.of(-1)
        assert empty.get_id() == -1
        assert empty == OSHDBRole.EMPTY

    @pytest.mark.parametrize(
        "role_id", [-2, -1, 0, 1, 3, 5, 15, 256, 525, 2**31 - 1]
    )
    def test_hash_code_and_equals(self, role_id):
        expected = OSHDBRole.of(role_id)
        role = OSHDBRole.of(role_id)
        assert role == role
        assert expected == role
        assert hash(expected) == hash(role)
        assert OSHDBRole.of(2) != role

    def test_not_equals_other_type(self):
        unexpect = OSHDBRole.of(2)
        assert unexpect != str(unexpect)


# --------------------------------------------------------------------- tags


class TestOSHDBTags:
    kvs = [1, 2, 2, 3, 4, 5]

    def test_array_has_tag_key(self):
        tags = OSHDBTags.of(self.kvs)
        assert tags.has_tag_key(OSHDBTagKey(2))
        assert not tags.has_tag_key(OSHDBTagKey(3))
        assert not tags.has_tag_key(5)

    def test_array_has_tag_key_excluding(self):
        tags = OSHDBTags.of(self.kvs)
        assert tags.has_tag_key_excluding(2, [1, 2, 4])
        assert not tags.has_tag_key_excluding(2, [3])
        assert not tags.has_tag_key_excluding(3, [])
        assert not tags.has_tag_key_excluding(5, [])

    def test_array_has_tag_value(self):
        tags = OSHDBTags.of(self.kvs)
        assert tags.has_tag(1, 2)
        assert not tags.has_tag(2, 2)
        assert not tags.has_tag(3, 4)
        assert not tags.has_tag(5, 6)

    def test_immutable_add(self):
        tags = OSHDBTags.of(self.kvs)
        with pytest.raises(TypeError):
            tags.add(OSHDBTag(5, 6))

    def test_immutable_remove(self):
        tags = OSHDBTags.of(self.kvs)
        with pytest.raises(TypeError):
            tags.remove_if(lambda tag: tag.get_key() == 2)

    def test_array_equality(self):
        tags = OSHDBTags.of([2, 2, 4, 4])
        assert tags == tags
        assert tags == OSHDBTags.of([2, 2, 4, 4])
        assert tags == {OSHDBTag(2, 2), OSHDBTag(4, 4)}
        assert tags != OSHDBTags.of([1, 1, 4, 4])
        assert tags != [OSHDBTag(2, 2), OSHDBTag(4, 4)]

    def test_empty(self):
        assert OSHDBTags.empty() == OSHDBTags.of([])
        assert len(OSHDBTags.empty()) == 0


# ------------------------------------------------------------------- member


class TestOSMMember:
    def test_get_id(self):
        assert OSMMember(1, OSMType.WAY, 1).get_id() == 1

    def test_get_type(self):
        assert OSMMember(1, OSMType.WAY, 1).get_type() == OSMType.WAY

    def test_get_role_id(self):
        assert OSMMember(1, OSMType.WAY, 1).get_role().get_id() == 1

    def test_get_data_explicit_null(self):
        assert OSMMember(1, OSMType.WAY, 1, None).get_entity() is None

    def test_get_data_implicit_null(self):
        assert OSMMember(1, OSMType.WAY, 1).get_entity() is None

    def test_to_string(self):
        assert repr(OSMMember(1, OSMType.WAY, 1)) == "T:way ID:1 R:1"

    def test_equals_and_hash(self):
        member = OSMMember(1234, OSMType.NODE, 1)
        assert member == member
        assert member == OSMMember(1234, OSMType.NODE, 1)
        assert hash(member) == hash(OSMMember(1234, OSMType.NODE, 1))

    @pytest.mark.parametrize(
        "mid,mtype,role",
        [
            (1234, OSMType.WAY, 1),
            (1234, OSMType.RELATION, 1),
            (1234, OSMType.NODE, 2),
            (23, OSMType.NODE, 1),
        ],
    )
    def test_not_equals(self, mid, mtype, role):
        assert OSMMember(1234, OSMType.NODE, 1) != OSMMember(mid, mtype, role)


class TestOSMType:
    def test_from_int(self):
        assert OSMType.from_int(0) == OSMType.NODE
        assert OSMType.from_int(1) == OSMType.WAY
        assert OSMType.from_int(2) == OSMType.RELATION
        with pytest.raises(ValueError):
            OSMType.from_int(3)

    def test_to_string(self):
        assert str(OSMType.NODE) == "node"
        assert str(OSMType.RELATION) == "relation"

    def test_int_value(self):
        assert OSMType.WAY.int_value() == 1


# --------------------------------------------------------------------- node


class TestOSMNode:
    def test_get_longitude(self):
        instance = OSM.node(1, 1, 1, 1, 1, [], 1000000000, 1)
        assert instance.get_longitude() == pytest.approx(100.0, abs=0.0)

    def test_get_latitude(self):
        instance = OSM.node(1, 1, 1, 1, 1, [], 1000000000, 1000000000)
        assert instance.get_latitude() == pytest.approx(100.0, abs=0.0)

    def test_get_lon_lat(self):
        instance = OSM.node(1, 1, 1, 1, 1, [], 1000000000, 1000000000)
        assert instance.get_lon() == 1000000000
        assert instance.get_lat() == 1000000000

    def test_to_string(self):
        instance = OSM.node(1, 1, 1, 1, 1, [], 1100000000, 100000000)
        assert repr(instance) == (
            "NODE: ID:1 V:+1+ TS:1 CS:1 VIS:true UID:1 TAGS:[]"
            " 110.0000000:10.0000000"
        )

    def test_equals(self):
        o = OSM.node(1, 1, 1, 1, 1, [1, 1, 2, 2, 3, 3], 1000000000, 1000000000)
        instance = OSM.node(1, 1, 1, 1, 1, [1, 1, 2, 2, 3, 3], 1000000000, 1000000000)
        assert instance == o

    def test_equals2(self):
        o = OSM.node(2, 1, 1, 1, 1, [1, 1, 2, 2, 3, 3], 1000000000, 1000000000)
        instance = OSM.node(1, 1, 1, 1, 1, [1, 1, 2, 2, 3, 3], 1000000000, 1000000000)
        assert instance != o

    def test_getters(self):
        instance = OSM.node(1, 1, 1, 1, 1, [], 1000000000, 1000000000)
        assert instance.get_id() == 1
        assert instance.get_version() == 1
        assert instance.get_epoch_second() == 1
        assert instance.get_changeset_id() == 1
        assert instance.get_user_id() == 1

    def test_is_visible(self):
        assert OSM.node(1, 1, 1, 1, 1, [], 1000000000, 1000000000).is_visible()
        assert not OSM.node(1, -1, 1, 1, 1, [], 1000000000, 1000000000).is_visible()

    def test_get_tags(self):
        instance = OSM.node(1, 1, 1, 1, 1, [], 1000000000, 1000000000)
        assert instance.get_tags() == OSHDBTags.empty()

    def test_has_tag_key(self):
        instance = OSM.node(1, 1, 1, 1, 1, [], 1000000000, 1000000000)
        assert not instance.get_tags().has_tag_key(1)

        instance = OSM.node(1, 1, 1, 1, 1, [1, 1, 2, 2, 3, 3], 1000000000, 1000000000)
        assert instance.get_tags().has_tag_key(1)

        instance = OSM.node(1, 1, 1, 1, 1, [1, 2, 2, 2, 3, 3], 1000000000, 1000000000)
        assert not instance.get_tags().has_tag_key_excluding(1, [2, 3])

        instance = OSM.node(1, 1, 1, 1, 1, [1, 1, 2, 2, 3, 3], 1000000000, 1000000000)
        assert instance.get_tags().has_tag_key_excluding(1, [2, 3])

        instance = OSM.node(1, 1, 1, 1, 1, [2, 1, 3, 3], 1000000000, 1000000000)
        assert not instance.get_tags().has_tag_key_excluding(1, [1, 3])

    def test_has_tag_value(self):
        instance = OSM.node(1, 1, 1, 1, 1, [1, 2, 2, 3], 1000000000, 1000000000)
        assert not instance.get_tags().has_tag(1, 1)
        instance = OSM.node(1, 1, 1, 1, 1, [1, 1, 2, 3], 1000000000, 1000000000)
        assert instance.get_tags().has_tag(1, 1)

    def test_equals_to_osm_node(self):
        kw = dict(
            id=123, version=1, timestamp=310172400000, changeset=4444,
            user_id=23, tags=[1, 1, 2, 2, 3, 3], lon=86809727, lat=494094984,
        )
        assert OSM.node(**kw) == OSM.node(**kw)


# ---------------------------------------------------------------------- way


class TestOSMWay:
    def test_get_refs(self):
        part = OSMMember(1, OSMType.NODE, 1)
        instance = OSM.way(1, 1, 1, 1, 1, [], [part, part])
        assert list(instance.get_members()) == [part, part]

        instance = OSM.way(1, 1, 1, 1, 1, [], [])
        assert list(instance.get_members()) == []

        instance = OSM.way(1, 1, 1, 1, 1, [], None)
        assert instance.get_members() is None

    def test_getters(self):
        part = OSMMember(1, OSMType.NODE, 1)
        instance = OSM.way(1, 1, 1, 1, 1, [], [part, part])
        assert instance.get_id() == 1
        assert instance.get_version() == 1
        assert instance.get_epoch_second() == 1
        assert instance.get_changeset_id() == 1
        assert instance.get_user_id() == 1

    def test_is_visible(self):
        part = OSMMember(1, OSMType.NODE, 1)
        assert OSM.way(1, 1, 1, 1, 1, [], [part, part]).is_visible()
        assert not OSM.way(1, -1, 1, 1, 1, [], [part, part]).is_visible()

    def test_get_tags(self):
        part = OSMMember(1, OSMType.NODE, 1)
        instance = OSM.way(1, 1, 1, 1, 1, [1, 1], [part, part])
        assert instance.get_tags() == OSHDBTags.of([1, 1])

    def test_has_tag_key(self):
        part = OSMMember(1, OSMType.NODE, 1)
        instance = OSM.way(1, 1, 1, 1, 1, [], [part, part])
        assert not instance.get_tags().has_tag_key(1)

        instance = OSM.way(1, 1, 1, 1, 1, [1, 1, 2, 2, 3, 3], [part, part])
        assert instance.get_tags().has_tag_key(1)

        instance = OSM.way(1, 1, 1, 1, 1, [1, 2, 2, 2, 3, 3], [part, part])
        assert not instance.get_tags().has_tag_key_excluding(1, [2, 3])

        instance = OSM.way(1, 1, 1, 1, 1, [1, 1, 2, 2, 3, 3], [part, part])
        assert instance.get_tags().has_tag_key_excluding(1, [2, 3])

        instance = OSM.way(1, 1, 1, 1, 1, [2, 1, 3, 3], [part, part])
        assert not instance.get_tags().has_tag_key_excluding(1, [1, 3])

    def test_has_tag_value(self):
        part = OSMMember(1, OSMType.NODE, 1)
        instance = OSM.way(1, 1, 1, 1, 1, [1, 2, 2, 3], [part, part])
        assert not instance.get_tags().has_tag(1, 1)
        instance = OSM.way(1, 1, 1, 1, 1, [1, 1, 2, 3], [part, part])
        assert instance.get_tags().has_tag(1, 1)


# ----------------------------------------------------------------- relation


class TestOSMRelation:
    part = OSMMember(1, OSMType.WAY, 1)

    def rel(self, version=2, tags=(1, 1, 2, 2)):
        return OSM.relation(1, version, 1, 1, 1, list(tags), [self.part, self.part])

    def test_get_members(self):
        assert list(self.rel(1).get_members()) == [self.part, self.part]

    def test_getters(self):
        instance = self.rel()
        assert instance.get_id() == 1
        assert instance.get_version() == 2
        assert instance.get_epoch_second() == 1
        assert instance.get_changeset_id() == 1
        assert instance.get_user_id() == 1

    def test_is_visible(self):
        assert self.rel(2).is_visible()
        assert not self.rel(-2).is_visible()

    def test_get_tags(self):
        assert self.rel().get_tags() == OSHDBTags.of([1, 1, 2, 2])

    def test_has_tag_key(self):
        assert not self.rel(2, []).get_tags().has_tag_key(1)
        assert self.rel(1, [1, 1, 2, 2, 3, 3]).get_tags().has_tag_key(1)
        assert not self.rel(1, [1, 2, 2, 2, 3, 3]).get_tags().has_tag_key_excluding(1, [2, 3])
        assert self.rel(1, [1, 1, 2, 2, 3, 3]).get_tags().has_tag_key_excluding(1, [2, 3])

    def test_has_tag_value(self):
        assert not self.rel(1, [1, 2, 2, 3]).get_tags().has_tag(1, 1)
        assert self.rel(1, [1, 1, 2, 3]).get_tags().has_tag(1, 1)


# ------------------------------------------------------------------ OSHNode


def build_osh_node(*versions):
    return OSHNode.build(list(versions))


class TestOSHNode:
    def test_build_and_serialize(self):
        hnode = build_osh_node(
            OSM.node(123, 1, 1, 0, USER_A, TAGS_A, LONLAT_A[0], LONLAT_A[1]),
            OSM.node(123, -2, 2, 0, USER_A, TAGS_A, LONLAT_A[0], LONLAT_A[1]),
        )
        assert hnode is not None
        v = list(hnode.get_versions())
        assert len(v) == 2

        blob = pickle.dumps(hnode)
        assert len(blob) > 0
        new_node = pickle.loads(blob)
        assert hnode.get_id() == new_node.get_id()
        assert len(hnode.get_versions()) == len(new_node.get_versions())

    def test_to_string(self):
        instance = build_osh_node(
            OSM.node(123, 2, 2, 0, USER_A, TAGS_A, LONLAT_A[0], LONLAT_A[1]),
            OSM.node(123, 1, 1, 0, USER_A, TAGS_A, LONLAT_B[0], LONLAT_B[1]),
        )
        assert repr(instance) == (
            "OSHNode ID:123 Vmax:+2+ Creation:1"
            " BBox:(49.410283,8.675635),(49.418621,8.715334)"
        )

    def test_hash_code_equals(self):
        expected = build_osh_node(OSM.node(123, 1, 1, 0, USER_A, TAGS_A, 0, 0))
        a = build_osh_node(OSM.node(123, 1, 1, 0, USER_A, TAGS_A, 0, 0))
        b = build_osh_node(OSM.node(444, 1, 2, 0, USER_A, TAGS_A, 0, 0))
        assert hash(expected) == hash(a)
        assert hash(expected) != hash(b)
        assert expected == a
        assert expected != b


# ------------------------------------------------------------------- OSHWay


class TestOSHWay:
    node100 = build_osh_node(
        OSM.node(100, 1, 1, 0, 123, [1, 2], 494094984, 86809727))
    node102 = build_osh_node(
        OSM.node(102, 1, 1, 0, 123, [2, 1], 494094984, 86809727))
    node104 = build_osh_node(
        OSM.node(104, 1, 1, 0, 123, [2, 4], 494094984, 86809727))

    def test_get_nodes_and_serialize(self):
        hway = OSHWay.build(
            [
                OSM.way(123, 1, 3333, 4444, 23, [1, 1, 2, 1], [
                    OSMMember(102, OSMType.NODE, 0),
                    OSMMember(104, OSMType.NODE, 0)]),
                OSM.way(123, 3, 3333, 4444, 23, [1, 1, 2, 2], [
                    OSMMember(100, OSMType.NODE, 0),
                    OSMMember(104, OSMType.NODE, 0)]),
            ],
            [self.node100, self.node102, self.node104],
        )
        assert hway is not None
        assert len(hway.get_nodes()) == 3

        blob = pickle.dumps(hway)
        assert len(blob) > 0
        new_way = pickle.loads(blob)
        assert hway.get_id() == new_way.get_id()
        assert len(hway.get_versions()) == len(new_way.get_versions())

    def test_with_missing_node(self):
        hway = OSHWay.build(
            [
                OSM.way(123, 3, 3333, 4444, 23, [1, 1, 2, 2], [
                    OSMMember(100, OSMType.NODE, 0),
                    OSMMember(104, OSMType.NODE, 0)]),
                OSM.way(123, 1, 3333, 4444, 23, [1, 1, 2, 1], [
                    OSMMember(102, OSMType.NODE, 0),
                    OSMMember(104, OSMType.NODE, 0)]),
            ],
            [self.node100, self.node104],
        )
        assert len(hway.get_nodes()) == 2

        itr = iter(hway.get_versions())
        way = next(itr)
        members = way.get_members()
        assert len(members) == 2
        assert members[0].get_id() == 100
        assert members[1].get_id() == 104

        way = next(itr)
        members = way.get_members()
        assert len(members) == 2
        assert members[0].get_id() == 102
        assert members[1].get_id() == 104

    def test_to_string(self):
        instance = OSHWay.build(
            [
                OSM.way(123, 1, 3333, 4444, 23, [1, 1, 2, 1], [
                    OSMMember(102, OSMType.NODE, 0),
                    OSMMember(104, OSMType.NODE, 0)]),
                OSM.way(123, 3, 3333, 4444, 23, [1, 1, 2, 2], [
                    OSMMember(100, OSMType.NODE, 0),
                    OSMMember(104, OSMType.NODE, 0)]),
            ],
            [self.node100, self.node102, self.node104],
        )
        assert repr(instance) == (
            "OSHWay ID:123 Vmax:+3+ Creation:3333"
            " BBox:(8.680973,49.409498),(8.680973,49.409498)"
        )

    def test_hash_code_equals(self):
        expected = OSHWay.build([OSM.way(123, 1, 3333, 4444, 23, [], [])], [])
        a = OSHWay.build([OSM.way(123, 1, 3333, 4444, 23, [], [])], [])
        b = OSHWay.build([OSM.way(444, 1, 3333, 4444, 23, [], [])], [])
        assert hash(expected) == hash(a)
        assert hash(expected) != hash(b)
        assert expected == a
        assert expected != b


# -------------------------------------------------------------- OSHRelation


class TestOSHRelation:
    node100 = build_osh_node(
        OSM.node(100, 1, 1, 0, 123, [1, 2], 494094980, 86809720))
    node102 = build_osh_node(
        OSM.node(102, 1, 1, 0, 123, [2, 1], 494094970, 86809730))
    node104 = build_osh_node(
        OSM.node(104, 1, 1, 0, 123, [2, 4], 494094960, 86809740))

    way200 = OSHWay.build(
        [OSM.way(200, 1, 3333, 4444, 23, [1, 2], [
            OSMMember(100, OSMType.NODE, 0),
            OSMMember(104, OSMType.NODE, 0)])],
        [node100, node104],
    )
    way202 = OSHWay.build(
        [OSM.way(202, 1, 3333, 4444, 23, [1, 2], [
            OSMMember(100, OSMType.NODE, 0),
            OSMMember(102, OSMType.NODE, 0)])],
        [node100, node102],
    )

    def test_get_nodes(self):
        hrelation = OSHRelation.build(
            [OSM.relation(300, 1, 3333, 4444, 23, [], [
                OSMMember(100, OSMType.NODE, 0),
                OSMMember(102, OSMType.NODE, 0),
                OSMMember(104, OSMType.NODE, 0)])],
            [self.node100, self.node102, self.node104],
            [],
        )
        assert len(hrelation.get_nodes()) == 3

    def test_with_missing_node(self):
        hrelation = OSHRelation.build(
            [OSM.relation(300, 1, 3333, 4444, 23, [], [
                OSMMember(100, OSMType.NODE, 0),
                OSMMember(102, OSMType.NODE, 0),
                OSMMember(104, OSMType.NODE, 0)])],
            [self.node100, self.node104],
            [],
        )
        assert len(hrelation.get_nodes()) == 2

        r = next(iter(hrelation.get_versions()))
        members = r.get_members()
        assert len(members) == 3
        assert members[0].get_id() == 100
        assert members[0].get_entity() is not None
        assert members[1].get_id() == 102
        assert members[1].get_entity() is None
        assert members[2].get_id() == 104
        assert members[2].get_entity() is not None

    def test_get_ways(self):
        hrelation = OSHRelation.build(
            [OSM.relation(300, 1, 3333, 4444, 23, [], [
                OSMMember(200, OSMType.WAY, 0),
                OSMMember(202, OSMType.WAY, 0)])],
            [],
            [self.way200, self.way202],
            200, 1000, 1000, 1000,
        )
        assert len(hrelation.get_ways()) == 2

    def test_compact_and_serialize(self):
        hrelation = OSHRelation.build(
            [OSM.relation(300, 1, 3333, 4444, 23, [], [
                OSMMember(100, OSMType.NODE, 0),
                OSMMember(102, OSMType.NODE, 0),
                OSMMember(104, OSMType.NODE, 0),
                OSMMember(200, OSMType.WAY, 0),
                OSMMember(202, OSMType.WAY, 0)])],
            [self.node100, self.node102, self.node104],
            [self.way200, self.way202],
            200, 1000, 1000, 1000,
        )
        nodes = hrelation.get_nodes()
        assert len(nodes) == 3
        for i, (nid, src) in enumerate(
            [(100, self.node100), (102, self.node102), (104, self.node104)]
        ):
            assert nodes[i].get_id() == nid
            assert (
                next(iter(nodes[i].get_versions())).get_lon()
                == next(iter(src.get_versions())).get_lon()
            )

        ways = hrelation.get_ways()
        assert len(ways) == 2
        assert ways[0].get_id() == 200
        assert (
            next(iter(ways[0].get_nodes()[0].get_versions())).get_lon()
            == next(iter(self.way200.get_nodes()[0].get_versions())).get_lon()
        )

        blob = pickle.dumps(hrelation)
        assert len(blob) > 0
        new_relation = pickle.loads(blob)
        assert hrelation.get_id() == new_relation.get_id()
        assert len(hrelation.get_versions()) == len(new_relation.get_versions())


# ----------------------------------------------------- columnar bridge test


def test_entity_from_row_bridge(spark, docs_parquet):
    """Lift real extracted entity rows into objects; check field parity."""
    from oshdb_spark.sources.entities import extract_entities

    path, _, _ = docs_parquet
    ents = extract_entities(spark.read.parquet(path))
    rows = (
        ents.filter("type = 'node'").limit(3).collect()
        + ents.filter("type = 'way'").limit(2).collect()
        + ents.filter("type = 'relation'").limit(2).collect()
    )
    assert rows, "fixture should produce entity rows"
    for row in rows:
        obj = entity_from_row(row)
        assert obj.get_id() == row["id"]
        assert str(obj.get_type()) == row["type"]
        assert obj.get_version() == row["version"]
        assert obj.is_visible() == row["visible"]
        assert obj.get_epoch_second() == row["ts"]
        assert obj.get_changeset_id() == row["changeset"]
        assert obj.get_user_id() == row["uid"]
        for k, v in (row["tags"] or {}).items():
            assert obj.get_tags().has_tag(int(k), int(v))
        if row["type"] == "node":
            assert obj.get_lon() == row["lon"]
            assert obj.get_lat() == row["lat"]
        elif row["type"] == "way":
            assert [m.get_id() for m in obj.get_members()] == list(row["refs"] or [])
        else:
            assert [m.get_id() for m in obj.get_members()] == [
                m["ref"] for m in (row["members"] or [])
            ]


class TestOSHEntity:
    def test_hash_code_equals_cross_type(self):
        # OSHEntityTest.java: equality is (type, id) — a node and a relation
        # with the same id are different entities
        expected = build_osh_node(OSM.node(123, 1, 1, 0, 1, [], 0, 0))
        a = build_osh_node(OSM.node(123, 1, 1, 0, 1, [], 0, 0))
        b = OSHRelation.build(
            [OSM.relation(123, 1, 3333, 4444, 23, [], [])], [], []
        )
        assert hash(expected) == hash(a)
        assert hash(expected) != hash(b)
        assert expected == a
        assert expected != b
