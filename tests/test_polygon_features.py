"""Bundled real-world interpreter config (geometry/polygon_features.py)
through the DefaultTagInterpreter-parity loader: area decisions for real
OSM tag sets must match DefaultTagInterpreter + polygon-features.json
(DefaultTagInterpreter.java:47-140; data = public osm-polygon-features).
Pure Python — no Spark session needed."""

from __future__ import annotations

from oshdb_spark.filters.dsl import TagTranslator
from oshdb_spark.geometry.polygon_features import (
    POLYGON_FEATURES,
    UNINTERESTING_TAG_KEYS,
    osm_tag_interpreter,
)
from oshdb_spark.geometry.taginterpreter import _old_style_relation


def _translator() -> TagTranslator:
    """Real-world keytable covering every string the tests exercise."""
    keys: dict[str, int] = {}
    values: dict[tuple[str, str], int] = {}

    def add(key: str, *vals: str) -> None:
        keys.setdefault(key, len(keys))
        for v in vals:
            if (key, v) not in values:
                values[(key, v)] = sum(1 for kk, _ in values if kk == key)

    add("building", "yes", "no", "house")
    add("highway", "residential", "services", "rest_area", "elevator")
    add("natural", "water", "coastline", "cliff", "wood", "tree_row")
    add("landuse", "forest", "residential")
    add("waterway", "river", "riverbank", "dam", "dock")
    add("man_made", "pipeline", "tower", "cutline")
    add("aeroway", "taxiway", "aerodrome")
    add("barrier", "wall", "fence", "hedge")
    add("railway", "rail", "platform", "station")
    add("area", "yes", "no")
    add("type", "multipolygon", "boundary", "route")
    add("leisure", "park")
    add("power", "line", "plant", "generator")
    for k in UNINTERESTING_TAG_KEYS:
        add(k, "x")
    return TagTranslator(keys=keys, values=values)


TR = _translator()
TI = osm_tag_interpreter(TR)
RING = [1, 2, 3, 1]  # closed


def _tags(**kv: str) -> dict[int, int]:
    out = {}
    for k, v in kv.items():
        k = k.replace("__", ":")
        out[TR.key_id(k)] = TR.value_id(k, v)
    return out


class TestRealWorldAreaDecisions:
    def test_all_mode(self):
        assert TI.way_is_area(RING, _tags(building="yes"))
        assert TI.way_is_area(RING, _tags(building="house"))
        # "all" excludes the value "no" (InvertedHashSet with "no")
        assert not TI.way_is_area(RING, _tags(building="no"))

    def test_blacklist_mode(self):
        assert TI.way_is_area(RING, _tags(natural="water"))
        assert TI.way_is_area(RING, _tags(natural="wood"))
        assert not TI.way_is_area(RING, _tags(natural="coastline"))
        assert not TI.way_is_area(RING, _tags(natural="tree_row"))
        assert not TI.way_is_area(RING, _tags(man_made="pipeline"))
        assert TI.way_is_area(RING, _tags(man_made="tower"))
        assert not TI.way_is_area(RING, _tags(aeroway="taxiway"))
        assert TI.way_is_area(RING, _tags(aeroway="aerodrome"))

    def test_whitelist_mode(self):
        assert not TI.way_is_area(RING, _tags(highway="residential"))
        assert TI.way_is_area(RING, _tags(highway="services"))
        assert TI.way_is_area(RING, _tags(highway="rest_area"))
        assert not TI.way_is_area(RING, _tags(waterway="river"))
        assert TI.way_is_area(RING, _tags(waterway="riverbank"))
        assert not TI.way_is_area(RING, _tags(railway="rail"))
        assert TI.way_is_area(RING, _tags(railway="platform"))
        assert not TI.way_is_area(RING, _tags(power="line"))
        assert TI.way_is_area(RING, _tags(power="plant"))

    def test_area_no_overrides_everything(self):
        t = _tags(building="yes", area="no")
        assert not TI.way_is_area(RING, t)

    def test_unclosed_never_area(self):
        assert not TI.way_is_area([1, 2, 3], _tags(building="yes"))
        assert not TI.way_is_area([1, 2, 1], _tags(building="yes"))

    def test_untagged_not_area(self):
        assert not TI.way_is_area(RING, {})
        assert not TI.way_is_area(RING, _tags(barrier="fence"))

    def test_relation_area(self):
        assert TI.relation_is_area(_tags(type="multipolygon"))
        assert TI.relation_is_area(_tags(type="boundary"))
        assert not TI.relation_is_area(_tags(type="route"))
        assert not TI.relation_is_area({})


class TestOldStyleWithRealConfig:
    def test_plain_multipolygon_is_old_style(self):
        members = [("way", "outer"), ("way", "inner")]
        assert _old_style_relation(TI, members, _tags(type="multipolygon"))

    def test_semantic_tag_makes_new_style(self):
        members = [("way", "outer"), ("way", "inner")]
        t = _tags(type="multipolygon", building="yes")
        assert not _old_style_relation(TI, members, t)

    def test_uninteresting_keys_stay_old_style(self):
        members = [("way", "outer")]
        t = _tags(type="multipolygon", source="x", created_by="x")
        assert _old_style_relation(TI, members, t)

    def test_two_outers_not_old_style(self):
        members = [("way", "outer"), ("way", "outer")]
        assert not _old_style_relation(TI, members, _tags(type="multipolygon"))


def test_config_covers_reference_key_set():
    """The bundled list carries every key the reference's
    polygon-features.json carries (27 entries) and the full
    uninteresting set (9 keys)."""
    keys = {e["key"] for e in POLYGON_FEATURES}
    assert len(POLYGON_FEATURES) == 27
    for k in ("building", "highway", "natural", "landuse", "waterway",
              "amenity", "leisure", "barrier", "railway", "area",
              "boundary", "man_made", "power", "place", "shop", "aeroway",
              "tourism", "historic", "public_transport", "office",
              "building:part", "military", "ruins", "area:highway",
              "craft", "golf", "indoor"):
        assert k in keys
    assert len(UNINTERESTING_TAG_KEYS) == 9
    assert "created_by" in UNINTERESTING_TAG_KEYS


def test_with_osm_config_end_to_end(spark):
    """OSHDB.with_osm_config: snapshot geometry decisions driven by the
    bundled real-world config through real string keytables — building=yes
    ring becomes a Polygon, natural=coastline ring stays a LineString."""
    from oshdb_spark.api import OSHDB, SnapshotView
    from oshdb_spark.geometry.model import from_wkt

    schema = (
        "doc_id string, id long, type string, version int, visible boolean, "
        "ts long, changeset long, uid int, tags map<int,int>, lon long, "
        "lat long, refs array<long>, "
        "members array<struct<type:string,ref:long,role:string>>"
    )
    t0 = 100
    k = TR.key_id
    v = TR.value_id
    sq = [(1, 0, 0), (2, 10, 0), (3, 10, 10), (4, 0, 10)]
    rows = [
        ("d", nid, "node", 1, True, t0, 0, 0, {}, x * 10_000_000,
         y * 10_000_000, None, None)
        for nid, x, y in sq
    ]
    rows.append(("d", 20, "way", 1, True, t0, 0, 0,
                 {k("building"): v("building", "yes")}, None, None,
                 [1, 2, 3, 4, 1], None))
    rows.append(("d", 21, "way", 1, True, t0, 0, 0,
                 {k("natural"): v("natural", "coastline")}, None, None,
                 [1, 2, 3, 4, 1], None))
    ents = spark.createDataFrame(rows, schema)
    db = OSHDB.with_osm_config(spark, ents, TR)
    out = {
        r["id"]: from_wkt(r["wkt"])["type"]
        for r in SnapshotView.on(db)
        .timestamps([t0 + 1])
        .dataframe()
        .filter("type = 'way'")
        .collect()
    }
    assert out[20] == "Polygon"
    assert out[21] == "LineString"
