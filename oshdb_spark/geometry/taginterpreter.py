"""Area/line decision rules for ways and relations.

Reproduces the semantics of the reference's tag interpreter
(/root/reference/oshdb-util/src/main/java/org/heigit/ohsome/oshdb/util/taginterpreter/BaseTagInterpreter.java:48-158,
DefaultTagInterpreter.java:36-39):

  * a way is an area iff it forms a closed ring with >= 4 node refs, does
    NOT carry the `area=no` tag, and has at least one tag in the
    polygon-features allowlist;
  * a relation is an area iff it has a tag in the relation allowlist
    (typically type=multipolygon / type=boundary); `area=no` is NOT checked;
  * multipolygon outer members: role == outer or role == "" (historic data);
    inner members: role == inner.

Tags here are int-coded (key:int, value:int) like the reference's keytable
encoding; the allowlists map key -> set of values, or key -> ALL_VALUES for
keys where any value makes an area (polygon-features.json "default: true").
"""

from __future__ import annotations

from dataclasses import dataclass, field

ALL_VALUES = "*"


@dataclass(frozen=True)
class InvertedValues:
    """Match every value EXCEPT the excluded set — the reference's
    InvertedHashSet used for polygon="all" (all but value "no") and
    polygon="blacklist" entries (DefaultTagInterpreter.java:66-99)."""

    excluded: frozenset = frozenset()

    def __contains__(self, v) -> bool:
        return v not in self.excluded

# role int codes used across the engine (reference stores roles int-coded via
# keytables; these three are fixed by convention in our synthetic data)
ROLE_OUTER = 0
ROLE_INNER = 1
ROLE_EMPTY = 2


@dataclass(frozen=True)
class TagInterpreter:
    area_no_tag: tuple[int, int] | None = None
    way_area_tags: dict[int, object] = field(default_factory=dict)
    relation_area_tags: dict[int, object] = field(default_factory=dict)
    uninteresting_tag_keys: frozenset[int] = frozenset()
    outer_role: int = ROLE_OUTER
    inner_role: int = ROLE_INNER
    empty_role: int = ROLE_EMPTY

    def _match(self, allow: dict, tags: dict[int, int]) -> bool:
        for k, v in tags.items():
            vals = allow.get(k)
            if vals is None:
                continue
            if vals == ALL_VALUES or v in vals:  # InvertedValues: not-excluded
                return True
        return False

    def way_is_area(self, refs: list[int], tags: dict[int, int]) -> bool:
        """BaseTagInterpreter.isArea for ways (closed ring >= 4 refs + tags)."""
        if len(refs) < 4 or refs[0] != refs[-1]:
            return False
        if self.area_no_tag is not None:
            k, v = self.area_no_tag
            if tags.get(k) == v:
                return False
        return self._match(self.way_area_tags, tags)

    def relation_is_area(self, tags: dict[int, int]) -> bool:
        return self._match(self.relation_area_tags, tags)

    def is_outer_member(self, member_type: str, role: int) -> bool:
        return member_type == "way" and role in (self.outer_role, self.empty_role)

    def is_inner_member(self, member_type: str, role: int) -> bool:
        return member_type == "way" and role == self.inner_role

    def has_interesting_tag_key(self, tags: dict[int, int]) -> bool:
        return any(k not in self.uninteresting_tag_keys for k in tags)


# Tag-key conventions for the synthetic docs tables (see sources/docs.py):
#   key 1 = "area"      (value 0 = "no")
#   key 2 = "building"  (any value -> area)
#   key 3 = "highway"   (linear)
#   key 4 = "type"      (value 1 = "multipolygon", value 2 = "boundary")
#   key 5 = "landuse"   (any value -> area)
#   key 6 = "natural"   (any value -> area)
#   key 9 = "created_by" (uninteresting)
TAG_AREA = 1
VAL_NO = 0
TAG_BUILDING = 2
TAG_HIGHWAY = 3
TAG_TYPE = 4
VAL_MULTIPOLYGON = 1
VAL_BOUNDARY = 2
TAG_LANDUSE = 5
TAG_NATURAL = 6
TAG_CREATED_BY = 9


def default_tag_interpreter() -> TagInterpreter:
    """Interpreter for the synthetic data's tag-key conventions (mirrors the
    role of DefaultTagInterpreter + polygon-features.json in the reference)."""
    return TagInterpreter(
        area_no_tag=(TAG_AREA, VAL_NO),
        way_area_tags={
            TAG_BUILDING: ALL_VALUES,
            TAG_LANDUSE: ALL_VALUES,
            TAG_NATURAL: ALL_VALUES,
            TAG_AREA: {1},  # area=yes
        },
        relation_area_tags={TAG_TYPE: {VAL_MULTIPOLYGON, VAL_BOUNDARY}},
        uninteresting_tag_keys=frozenset({TAG_CREATED_BY}),
    )


# ---------------------------------------------------------------------------
# polygon-features.json loading (DefaultTagInterpreter parity)
# ---------------------------------------------------------------------------


def interpreter_from_json(
    area_tags,
    uninteresting_keys,
    translator,
) -> TagInterpreter:
    """Build a TagInterpreter from polygon-features.json-format config +
    an uninterestingTags.json-format key list, resolved through a
    TagTranslator (string<->int keytables).

    Parity: DefaultTagInterpreter.java:47-140 —
      * polygon "all"       -> match any value EXCEPT "no" (InvertedHashSet)
      * polygon "whitelist" -> listed value ids, PLUS the id of "no" when
        present (reference quirk preserved verbatim,
        DefaultTagInterpreter.java:74-86)
      * polygon "blacklist" -> any value except the listed ids
      * relations: hardcoded type=multipolygon / type=boundary
      * keys/values missing from the keytables are skipped (ifPresent)

    ``area_tags`` / ``uninteresting_keys``: parsed JSON (list) or a path /
    JSON string.
    """
    import json as _json
    import os as _os

    def _load(x):
        if isinstance(x, (list, tuple)):
            return x
        if isinstance(x, str) and _os.path.exists(x):
            with open(x) as f:
                return _json.load(f)
        return _json.loads(x)

    area_tags = _load(area_tags)
    uninteresting_keys = _load(uninteresting_keys)

    way_area: dict[int, object] = {}
    for entry in area_tags:
        key = entry["key"]
        kid = translator.key_id(key)
        if kid is None:
            continue
        mode = entry["polygon"]
        if mode == "all":
            no_id = translator.value_id(key, "no")
            way_area[kid] = InvertedValues(
                frozenset(() if no_id is None else (no_id,))
            )
        elif mode == "whitelist":
            ids = {
                vid
                for v in entry.get("values", ())
                if (vid := translator.value_id(key, v)) is not None
            }
            no_id = translator.value_id(key, "no")
            if no_id is not None:
                ids.add(no_id)
            way_area[kid] = frozenset(ids)
        elif mode == "blacklist":
            ids = {
                vid
                for v in entry.get("values", ())
                if (vid := translator.value_id(key, v)) is not None
            }
            way_area[kid] = InvertedValues(frozenset(ids))
        else:
            raise ValueError(f"unknown polygon mode {mode!r} for key {key!r}")

    type_key = translator.key_id("type")
    rel_vals = {
        vid
        for v in ("multipolygon", "boundary")
        if (vid := translator.value_id("type", v)) is not None
    }
    relation_area = {type_key: rel_vals} if type_key is not None and rel_vals else {}

    area_kid = translator.key_id("area")
    area_no_vid = translator.value_id("area", "no")
    area_no = (
        (area_kid, area_no_vid)
        if area_kid is not None and area_no_vid is not None
        else None
    )

    uninteresting = frozenset(
        kid
        for k in uninteresting_keys
        if (kid := translator.key_id(k)) is not None
    )
    return TagInterpreter(
        area_no_tag=area_no,
        way_area_tags=way_area,
        relation_area_tags=relation_area,
        uninteresting_tag_keys=uninteresting,
    )


def _old_style_relation(
    interpreter: TagInterpreter,
    member_pairs: list[tuple[str, str]],
    tags: dict[int, int],
) -> bool:
    """BaseTagInterpreter.isOldStyleMultipolygon (BaseTagInterpreter.java:108-134):
    exactly ONE way member with role "outer" (the empty role does NOT
    count here), and every relation tag is either a relation-area tag
    (type=multipolygon/boundary) or an uninteresting key — i.e. the
    semantic tags live on the outer way, old-style."""
    outer_ways = sum(1 for t, r in member_pairs if t == "way" and r == "outer")
    if outer_ways != 1:
        return False
    for k, v in tags.items():
        vals = interpreter.relation_area_tags.get(k)
        if vals is not None and (vals == ALL_VALUES or v in vals):
            continue
        if k in interpreter.uninteresting_tag_keys:
            continue
        return False
    return True
