"""Keytable builder + JSON-config TagInterpreter (DefaultTagInterpreter /
JdbcTagTranslator parity).

Reference semantics:
  * keytables are frequency-ordered string->int dictionaries built from
    data (data-model.md "Keytables"; JdbcTagTranslator.java)
  * DefaultTagInterpreter.java:47-140 parses polygon-features.json:
    "all" = any value except "no"; "whitelist" = listed values (plus the
    "no" id — reference quirk); "blacklist" = all but listed values;
    relations match type=multipolygon/boundary
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oshdb_spark.geometry.taginterpreter import interpreter_from_json
from oshdb_spark.sources.keytables import (
    build_keytables,
    encode_tags,
    keytable_frames,
)

AREA_JSON = [
    {"key": "building", "polygon": "all"},
    {"key": "highway", "polygon": "whitelist", "values": ["services", "rest_area"]},
    {"key": "natural", "polygon": "blacklist", "values": ["coastline", "tree_row"]},
    {"key": "absent_key", "polygon": "all"},
]
UNINTERESTING_JSON = ["created_by", "source"]

RING = [1, 2, 3, 1]  # closed, 4 refs


def _tag_rows():
    # frequencies: building (5) > highway (4) > natural (3) > type (2) > ...
    rows = []
    rows += [("building", "yes")] * 3 + [("building", "no")] * 2
    rows += [("highway", "residential")] * 2 + [("highway", "services")] * 1
    rows += [("highway", "rest_area")] * 1
    rows += [("natural", "water")] * 2 + [("natural", "coastline")] * 1
    rows += [("type", "multipolygon")] * 1 + [("type", "boundary")] * 1
    rows += [("area", "no")] * 1
    rows += [("created_by", "editor")] * 1
    return rows


def test_build_keytables_frequency_order(spark):
    tr = build_keytables(spark.createDataFrame(_tag_rows(), "key string, value string"))
    # most frequent key gets id 0
    assert tr.key_id("building") == 0
    assert tr.key_id("highway") == 1
    assert tr.key_id("natural") == 2
    # per-key value ids, most frequent first
    assert tr.value_id("building", "yes") == 0
    assert tr.value_id("building", "no") == 1
    assert tr.value_id("highway", "residential") == 0
    assert tr.value_id("nope", "x") is None


def test_interpreter_from_json_semantics(spark):
    tr = build_keytables(spark.createDataFrame(_tag_rows(), "key string, value string"))
    ti = interpreter_from_json(AREA_JSON, UNINTERESTING_JSON, tr)

    def tags(*pairs):
        return {
            tr.key_id(k): tr.value_id(k, v) for k, v in pairs
        }

    # "all": any building value except "no"
    assert ti.way_is_area(RING, tags(("building", "yes")))
    assert not ti.way_is_area(RING, tags(("building", "no")))
    # whitelist: services/rest_area yes, residential no
    assert ti.way_is_area(RING, tags(("highway", "services")))
    assert not ti.way_is_area(RING, tags(("highway", "residential")))
    # blacklist: water yes, coastline no
    assert ti.way_is_area(RING, tags(("natural", "water")))
    assert not ti.way_is_area(RING, tags(("natural", "coastline")))
    # area=no veto beats any allowlist match
    assert not ti.way_is_area(RING, tags(("building", "yes"), ("area", "no")))
    # open ring is never an area
    assert not ti.way_is_area([1, 2, 3], tags(("building", "yes")))
    # relations: type=multipolygon / type=boundary
    assert ti.relation_is_area(tags(("type", "multipolygon")))
    assert ti.relation_is_area(tags(("type", "boundary")))
    assert not ti.relation_is_area(tags(("building", "yes")))
    # uninteresting keys
    assert not ti.has_interesting_tag_key(tags(("created_by", "editor")))
    assert ti.has_interesting_tag_key(tags(("building", "yes")))


def test_interpreter_loads_reference_format_file(tmp_path):
    """The real polygon-features.json schema round-trips through a file."""
    import json

    p = tmp_path / "polygon-features.json"
    p.write_text(json.dumps(AREA_JSON))
    u = tmp_path / "uninteresting.json"
    u.write_text(json.dumps(UNINTERESTING_JSON))
    from oshdb_spark.filters.dsl import TagTranslator

    tr = TagTranslator(
        keys={"building": 0, "area": 1},
        values={("building", "yes"): 0, ("building", "no"): 1, ("area", "no"): 0},
    )
    ti = interpreter_from_json(str(p), str(u), tr)
    assert ti.way_is_area(RING, {0: 0})
    assert not ti.way_is_area(RING, {0: 1})


def test_encode_tags_and_dsl_end_to_end(spark):
    """Raw string tags -> keytables -> int-coded map -> DSL filter through
    the generated translator: the full real-data path."""
    tr = build_keytables(spark.createDataFrame(_tag_rows(), "key string, value string"))
    ents = spark.createDataFrame(
        [
            (1, {"building": "yes"}),
            (2, {"building": "no"}),
            (3, {"highway": "services", "building": "yes"}),
            (4, {"unknown_key": "x"}),
            (5, {}),
        ],
        "id long, str_tags map<string,string>",
    )
    coded = encode_tags(ents, spark, tr)
    from oshdb_spark.filters.dsl import parse_filter

    node = parse_filter('building=yes', translator=tr)
    got = sorted(r["id"] for r in coded.filter(node.osm_column()).collect())
    assert got == [1, 3]
    node2 = parse_filter("building=*", translator=tr)
    got2 = sorted(r["id"] for r in coded.filter(node2.osm_column()).collect())
    assert got2 == [1, 2, 3]
    # unknown strings drop out of the coded map
    row4 = coded.filter("id = 4").collect()[0]
    assert row4["tags"] == {}


def test_keytable_frames_broadcastable(spark):
    tr = build_keytables(spark.createDataFrame(_tag_rows(), "key string, value string"))
    keys, vals = keytable_frames(spark, tr)
    assert keys.count() == len(tr.keys)
    assert vals.count() == len(tr.values)


# ---------------------------------------------------------------------------
# AbstractTagTranslatorTest.java port (oshdb-util/src/test/java/.../
# tagtranslator/AbstractTagTranslatorTest.java:37-120): forward tag/key/
# role lookups return None when absent (empty Optional), reverse lookups
# round-trip, roles int-code through their own frequency-ordered table.
# The reference pins ids against its H2 test-data file; here the fixture
# is synthesized so the frequency ordering yields a known id assignment.
# ---------------------------------------------------------------------------


def _role_rows():
    # frequencies: outer (4) > inner (2) > from (1) == to (1, name tiebreak)
    return (
        [("outer",)] * 4 + [("inner",)] * 2 + [("from",)] + [("to",)]
    )


def test_tag_translator_round_trip(spark):
    tr = build_keytables(
        spark.createDataFrame(_tag_rows(), "key string, value string")
    )
    # testTag2Int: OSMTag -> OSHDBTag
    assert tr.tag_id("building", "yes") == (0, 0)
    # testTags2Int: batch = per-pair forward lookups
    batch = {
        ("building", "yes"): tr.tag_id("building", "yes"),
        ("building", "no"): tr.tag_id("building", "no"),
        ("highway", "residential"): tr.tag_id("highway", "residential"),
    }
    assert all(v is not None for v in batch.values())
    # testTag2String / testTags2String: reverse round-trips
    for (k, v), tid in batch.items():
        assert tr.lookup_tag(*tid) == (k, v)
    # testKey2Int + unknown -> None (empty Optional)
    assert tr.key_id("building") == 0
    assert tr.key_id("not_in_data") is None
    assert tr.tag_id("building", "not_a_value") is None


def test_role_translator(spark):
    from oshdb_spark.sources.keytables import build_role_table

    tr = build_keytables(
        spark.createDataFrame(_tag_rows(), "key string, value string")
    )
    tr.roles.update(
        build_role_table(spark.createDataFrame(_role_rows(), "role string"))
    )
    # testRole2Int: frequency order outer=0, inner=1, from=2, to=3
    assert tr.role_id("outer") == 0
    assert tr.role_id("inner") == 1
    assert tr.role_id("from") == 2
    assert tr.role_id("to") == 3
    assert tr.role_id("via") is None
    # testRole2String
    assert tr.lookup_role(1) == "inner"


def test_encode_member_roles(spark):
    from oshdb_spark.filters.dsl import TagTranslator
    from oshdb_spark.sources.keytables import encode_member_roles

    tr = TagTranslator(roles={"outer": 0, "inner": 1})
    df = spark.createDataFrame(
        [
            (
                1,
                [
                    {"type": "way", "ref": 10, "role": "outer"},
                    {"type": "way", "ref": 11, "role": "inner"},
                    {"type": "node", "ref": 12, "role": "mystery"},
                ],
            )
        ],
        "id long, members array<struct<type:string,ref:long,role:string>>",
    )
    out = encode_member_roles(df, tr).collect()[0]["members"]
    assert [(m["type"], m["ref"], m["role"]) for m in out] == [
        ("way", 10, 0),
        ("way", 11, 1),
        ("node", 12, -1),  # unknown role flags, not drops
    ]


# ---------------------------------------------------------------------------
# CachedTagTranslator (CachedTagTranslatorTest.java: the abstract suite body
# re-run through the caching wrapper, plus the cache-behavior contracts)
# ---------------------------------------------------------------------------


def _cached(spark, **kw):
    from oshdb_spark.filters.dsl import CachedTagTranslator
    from oshdb_spark.sources.keytables import build_role_table

    tr = build_keytables(
        spark.createDataFrame(_tag_rows(), "key string, value string")
    )
    tr.roles.update(
        build_role_table(spark.createDataFrame(_role_rows(), "role string"))
    )
    return CachedTagTranslator(tr, **kw)


def test_cached_translator_round_trip(spark):
    # AbstractTagTranslatorTest body through the wrapper (CachedTagTranslatorTest)
    tr = _cached(spark)
    assert tr.tag_id("building", "yes") == (0, 0)
    batch = {
        ("building", "yes"): tr.tag_id("building", "yes"),
        ("building", "no"): tr.tag_id("building", "no"),
        ("highway", "residential"): tr.tag_id("highway", "residential"),
    }
    assert all(v is not None for v in batch.values())
    for (k, v), tid in batch.items():
        assert tr.lookup_tag(*tid) == (k, v)
    assert tr.key_id("building") == 0
    assert tr.key_id("not_in_data") is None
    assert tr.tag_id("building", "not_a_value") is None
    assert tr.role_id("outer") == 0
    assert tr.role_id("via") is None
    assert tr.lookup_role(1) == "inner"


def test_cached_translator_forward_warms_reverse(spark):
    # getOSHDBTagOf's ifPresent(put): a forward hit serves the reverse
    # lookup from cache (CachedTagTranslator.java:33-37)
    tr = _cached(spark)
    tid = tr.tag_id("building", "yes")
    assert tid in tr._tag_cache
    assert tr.lookup_tag(*tid) == ("building", "yes")


def test_cached_translator_eviction_bounds(spark):
    # weigher = 2 bytes per value char against max_bytes_values; role cache
    # bounded by entry count (CachedTagTranslator.java:11-17)
    tr = _cached(spark, max_bytes_values=2 * len("residential"), max_num_roles=2)
    tr.lookup_tag(*tr.source.tag_id("building", "yes"))
    tr.lookup_tag(*tr.source.tag_id("highway", "residential"))  # evicts "yes"
    assert tr._tag_bytes <= 2 * len("residential")
    assert len(tr._tag_cache) == 1
    for rid in (0, 1, 2):
        tr.lookup_role(rid)
    assert len(tr._role_cache) == 2
    # evicted entries still resolve through the source
    assert tr.lookup_tag(*tr.source.tag_id("building", "yes")) == ("building", "yes")
    assert tr.lookup_role(0) == "outer"
