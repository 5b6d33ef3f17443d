"""Bundled real-world area-decision config.

The data below is the public osm-polygon-features list (community
project `osmlab/osm-polygon-features`, license CC0/public data; the
reference bundles the same list as
oshdb-util/src/main/resources/json/polygon-features.json and the
uninteresting-keys set as json/uninterestingTags.json —
DefaultTagInterpreter.java:36-39).  Re-encoded as Python literals so it
ships to executors with the package zip like any other module.

`osm_tag_interpreter(translator)` builds the production TagInterpreter
from this config through the string<->int keytables, closing the
ETL -> filter loop: keytables built from data (sources/keytables.py),
interpreter + DSL predicates compiled against them.
"""

from __future__ import annotations

# polygon-features.json-format entries: "all" = every value except "no",
# "whitelist"/"blacklist" = listed values are/aren't areas
POLYGON_FEATURES: list[dict] = [
    {"key": "building", "polygon": "all"},
    {"key": "highway", "polygon": "whitelist",
     "values": ["services", "rest_area", "escape", "elevator"]},
    {"key": "natural", "polygon": "blacklist",
     "values": ["coastline", "cliff", "ridge", "arete", "tree_row"]},
    {"key": "landuse", "polygon": "all"},
    {"key": "waterway", "polygon": "whitelist",
     "values": ["riverbank", "dock", "boatyard", "dam"]},
    {"key": "amenity", "polygon": "all"},
    {"key": "leisure", "polygon": "all"},
    {"key": "barrier", "polygon": "whitelist",
     "values": ["city_wall", "ditch", "hedge", "retaining_wall", "wall",
                "spikes"]},
    {"key": "railway", "polygon": "whitelist",
     "values": ["station", "turntable", "roundhouse", "platform"]},
    {"key": "area", "polygon": "all"},
    {"key": "boundary", "polygon": "all"},
    {"key": "man_made", "polygon": "blacklist",
     "values": ["cutline", "embankment", "pipeline"]},
    {"key": "power", "polygon": "whitelist",
     "values": ["plant", "substation", "generator", "transformer"]},
    {"key": "place", "polygon": "all"},
    {"key": "shop", "polygon": "all"},
    {"key": "aeroway", "polygon": "blacklist", "values": ["taxiway"]},
    {"key": "tourism", "polygon": "all"},
    {"key": "historic", "polygon": "all"},
    {"key": "public_transport", "polygon": "all"},
    {"key": "office", "polygon": "all"},
    {"key": "building:part", "polygon": "all"},
    {"key": "military", "polygon": "all"},
    {"key": "ruins", "polygon": "all"},
    {"key": "area:highway", "polygon": "all"},
    {"key": "craft", "polygon": "all"},
    {"key": "golf", "polygon": "all"},
    {"key": "indoor", "polygon": "all"},
]

# uninterestingTags.json-format: metadata-only keys that never make a
# relation "interesting" (old-style multipolygon detection etc.)
UNINTERESTING_TAG_KEYS: list[str] = [
    "source",
    "source_ref",
    "source:ref",
    "history",
    "attribution",
    "created_by",
    "tiger:county",
    "tiger:tlid",
    "tiger:upload_uuid",
]


def osm_tag_interpreter(translator):
    """The production interpreter: bundled osm-polygon-features config
    resolved through the given TagTranslator (data-built keytables from
    sources/keytables.py, or any string<->int mapping with key_id/tag_id).
    This is what DefaultTagInterpreter(translator) constructs in the
    reference (DefaultTagInterpreter.java:47-140)."""
    from oshdb_spark.geometry.taginterpreter import interpreter_from_json

    return interpreter_from_json(
        POLYGON_FEATURES, UNINTERESTING_TAG_KEYS, translator
    )
