"""Public OSM/OSH value types — the reference's user-facing object API.

The engine is columnar (entities live in DataFrames; see
``sources/entities.py``), but the reference hands users *objects* inside
``map``/``filter`` lambdas: ``snapshot.getEntity().getTags().hasTagKey(k)``.
This module ports that surface 1:1 so a user switching from the reference
can keep those lambdas verbatim inside ``transform()`` / ``stream()``
consumers, and so the reference's value-type test suites port directly:

* ``OSHDBTag`` / ``OSHDBTagKey`` / ``OSHDBTags``
  (/root/reference/oshdb/src/main/java/org/heigit/ohsome/oshdb/OSHDBTag.java,
  util/OSHDBTagKey.java, OSHDBTags.java)
* ``OSHDBRole`` (OSHDBRole.java)
* ``OSMType`` / ``OSMMember`` (osm/OSMType.java, osm/OSMMember.java)
* ``OSM.node/way/relation`` single-version entities (osm/OSM.java:25-127)
* ``OSHNode/OSHWay/OSHRelation`` full-history containers
  (osh/impl/OSHNodeImpl.java, OSHWayImpl.java, OSHRelationImpl.java,
  OSHEntityImpl.java:358-372,478-494) — semantics only: the reference's
  delta-encoded byte blobs are exactly what the columnar store replaces,
  so these containers hold plain version lists; serialization parity is
  pickle instead of ObjectOutputStream.

``entity_from_row`` bridges the columnar world: it lifts one row of the
normalized entities DataFrame (sources/entities.py PAYLOAD_SCHEMA) into the
matching OSM* object.
"""

from __future__ import annotations

import enum
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple


def to_wgs84(fixed: int) -> float:
    """OSMCoordinates.toWgs84 (OSMCoordinates.java): 1e-7 fixed-point."""
    return fixed * 1e-7


class OSMType(enum.Enum):
    """osm/OSMType.java:1-42 — int-coded entity type, lowercase toString."""

    NODE = 0
    WAY = 1
    RELATION = 2

    @staticmethod
    def from_int(value: int) -> "OSMType":
        for t in OSMType:
            if t.value == value:
                return t
        raise ValueError(
            "Unknown OSMType! Should be between 0 and 2, got [%d]" % value
        )

    def int_value(self) -> int:
        return self.value

    def __str__(self) -> str:
        return self.name.lower()


class OSHDBTag:
    """OSHDBTag.java:1-56 — int key/value pair, ordered by (key, value)."""

    __slots__ = ("key", "value")

    def __init__(self, key: int, value: int):
        self.key = int(key)
        self.value = int(value)

    def get_key(self) -> int:
        return self.key

    def get_value(self) -> int:
        return self.value

    def compare_to(self, other: "OSHDBTag") -> int:
        return (self.key - other.key) or (self.value - other.value)

    def __lt__(self, other: "OSHDBTag") -> bool:
        return (self.key, self.value) < (other.key, other.value)

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, OSHDBTag)
            and other.key == self.key
            and other.value == self.value
        )

    def __hash__(self) -> int:
        return hash((self.key, self.value))

    def __repr__(self) -> str:
        return f"{self.key}={self.value}"


class OSHDBTagKey:
    """util/OSHDBTagKey.java:1-35."""

    __slots__ = ("key",)

    def __init__(self, key: int):
        self.key = int(key)

    def to_int(self) -> int:
        return self.key

    def is_present_in_keytables(self) -> bool:
        return self.key >= 0

    def __eq__(self, other: object) -> bool:
        return isinstance(other, OSHDBTagKey) and other.key == self.key

    def __hash__(self) -> int:
        return self.key

    def __repr__(self) -> str:
        return str(self.key)


class OSHDBTags:
    """OSHDBTags.java:1-153 — immutable set-view over a flat [k,v,...] array.

    Keys are assumed sorted ascending (the storage order), which the
    ``has_tag_key*`` scans exploit with an early exit exactly like the
    reference (IntArrayOSHDBTags.hasTagKey:84-99).  Equality: raw-array
    compare against another OSHDBTags, set-semantics compare against a
    set/frozenset (AbstractSet.equals), never equal to a list.
    """

    __slots__ = ("_kvs",)

    def __init__(self, kvs: Sequence[int]):
        if len(kvs) % 2:
            raise ValueError("kv array must have even length")
        self._kvs = tuple(int(x) for x in kvs)

    @staticmethod
    def of(kvs: Sequence[int]) -> "OSHDBTags":
        return OSHDBTags(kvs)

    _EMPTY: "OSHDBTags" = None  # type: ignore[assignment]

    @staticmethod
    def empty() -> "OSHDBTags":
        return _EMPTY_TAGS

    def __len__(self) -> int:
        return len(self._kvs) // 2

    def __iter__(self) -> Iterator[OSHDBTag]:
        for i in range(0, len(self._kvs), 2):
            yield OSHDBTag(self._kvs[i], self._kvs[i + 1])

    def __contains__(self, item: object) -> bool:
        return isinstance(item, OSHDBTag) and self.has_tag(item)

    def has_tag_key(self, key) -> bool:
        if isinstance(key, OSHDBTagKey):
            key = key.to_int()
        kvs = self._kvs
        for i in range(0, len(kvs), 2):
            if kvs[i] < key:
                continue
            return kvs[i] == key
        return False

    def has_tag_key_excluding(self, key: int, uninteresting: Sequence[int]) -> bool:
        kvs = self._kvs
        for i in range(0, len(kvs), 2):
            if kvs[i] < key:
                continue
            if kvs[i] == key:
                return kvs[i + 1] not in tuple(uninteresting)
            return False
        return False

    def has_tag(self, key_or_tag, value: Optional[int] = None) -> bool:
        # hasTag scans without the sorted early-exit (OSHDBTags.java:128-136)
        if isinstance(key_or_tag, OSHDBTag):
            key, val = key_or_tag.key, key_or_tag.value
        else:
            key, val = int(key_or_tag), int(value)  # type: ignore[arg-type]
        kvs = self._kvs
        for i in range(0, len(kvs), 2):
            if kvs[i] == key:
                return kvs[i + 1] == val
        return False

    def add(self, tag: OSHDBTag) -> None:
        raise TypeError("OSHDBTags is immutable (UnsupportedOperationException)")

    def remove_if(self, predicate) -> None:
        raise TypeError("OSHDBTags is immutable (UnsupportedOperationException)")

    def __eq__(self, other: object) -> bool:
        if other is self:
            return True
        if isinstance(other, OSHDBTags):
            return self._kvs == other._kvs
        if isinstance(other, (set, frozenset)):
            return set(self) == other
        return NotImplemented

    def __hash__(self) -> int:
        return hash(self._kvs)

    def __repr__(self) -> str:
        return "[" + ", ".join(repr(t) for t in self) + "]"


_EMPTY_TAGS = OSHDBTags(())


class OSHDBRole:
    """OSHDBRole.java:1-76 — int-coded member role; of(-1) is EMPTY."""

    __slots__ = ("role",)

    EMPTY: "OSHDBRole" = None  # type: ignore[assignment]

    def __init__(self, role: int):
        self.role = int(role)

    @staticmethod
    def of(role_id: int) -> "OSHDBRole":
        if role_id == -1:
            return OSHDBRole.EMPTY
        return OSHDBRole(role_id)

    def get_id(self) -> int:
        return self.role

    def __eq__(self, other: object) -> bool:
        return isinstance(other, OSHDBRole) and other.role == self.role

    def __hash__(self) -> int:
        return hash(self.role)

    def __repr__(self) -> str:
        return str(self.role)


OSHDBRole.EMPTY = OSHDBRole(-1)


class OSMMember:
    """osm/OSMMember.java:1-70 — typed, roled reference to a member entity."""

    __slots__ = ("id", "type", "role", "entity")

    def __init__(
        self,
        member_id: int,
        member_type: OSMType,
        role_id: int,
        entity: Optional["OSHEntity"] = None,
    ):
        self.id = int(member_id)
        self.type = member_type
        self.role = OSHDBRole.of(role_id)
        self.entity = entity

    def get_id(self) -> int:
        return self.id

    def get_type(self) -> OSMType:
        return self.type

    def get_role(self) -> OSHDBRole:
        return self.role

    def get_entity(self) -> Optional["OSHEntity"]:
        return self.entity

    def __eq__(self, other: object) -> bool:
        # entity is deliberately excluded (transient in the reference)
        return (
            isinstance(other, OSMMember)
            and other.type == self.type
            and other.id == self.id
            and other.role == self.role
        )

    def __hash__(self) -> int:
        return hash((self.type, self.id, self.role.get_id()))

    def __repr__(self) -> str:
        return f"T:{self.type} ID:{self.id} R:{self.role.get_id()}"


class OSMEntity:
    """osm/OSM.java:74-160 Entity base — version sign encodes visibility."""

    __slots__ = ("id", "_version", "timestamp", "changeset_id", "user_id", "tags")

    def __init__(self, id, version, timestamp, changeset, user_id, tags):
        self.id = int(id)
        self._version = int(version)
        self.timestamp = int(timestamp)
        self.changeset_id = int(changeset)
        self.user_id = int(user_id)
        self.tags = tags if isinstance(tags, OSHDBTags) else OSHDBTags.of(tags)

    def get_type(self) -> OSMType:
        raise NotImplementedError

    def get_id(self) -> int:
        return self.id

    def get_version(self) -> int:
        return abs(self._version)

    def get_epoch_second(self) -> int:
        return self.timestamp

    def get_changeset_id(self) -> int:
        return self.changeset_id

    def get_user_id(self) -> int:
        return self.user_id

    def is_visible(self) -> bool:
        return self._version >= 0

    def get_tags(self) -> OSHDBTags:
        return self.tags

    def _base_str(self) -> str:
        # "ID:%d V:+%d+ TS:%d CS:%d VIS:%s UID:%d TAGS:%S" (OSM.java:152-156);
        # %S upper-cases the tags string (digits/'='/brackets: a no-op here)
        return (
            f"ID:{self.id} V:+{self.get_version()}+ TS:{self.timestamp}"
            f" CS:{self.changeset_id} VIS:{str(self.is_visible()).lower()}"
            f" UID:{self.user_id} TAGS:{repr(self.tags).upper()}"
        )

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, OSMEntity)
            and self.get_type() == other.get_type()
            and self.id == other.get_id()
            and self.get_version() == other.get_version()
        )

    def __hash__(self) -> int:
        return hash((self.get_type(), self.id, self.get_version()))


class OSMNode(OSMEntity):
    """osm/OSM.java:162-228 Node — 1e-7 fixed-point lon/lat."""

    __slots__ = ("longitude", "latitude")

    def __init__(self, id, version, timestamp, changeset, user_id, tags, lon, lat):
        super().__init__(id, version, timestamp, changeset, user_id, tags)
        self.longitude = int(lon)
        self.latitude = int(lat)

    def get_type(self) -> OSMType:
        return OSMType.NODE

    def get_longitude(self) -> float:
        return to_wgs84(self.longitude)

    def get_latitude(self) -> float:
        return to_wgs84(self.latitude)

    def get_lon(self) -> int:
        return self.longitude

    def get_lat(self) -> int:
        return self.latitude

    def __eq__(self, other: object) -> bool:
        return (
            super().__eq__(other)
            and isinstance(other, OSMNode)
            and self.latitude == other.get_lat()
            and self.longitude == other.get_lon()
        )

    def __hash__(self) -> int:
        return hash((super().__hash__(), self.latitude, self.longitude))

    def __repr__(self) -> str:
        return (
            f"NODE: {self._base_str()}"
            f" {self.get_longitude():.7f}:{self.get_latitude():.7f}"
        )


def _members_str(members: Optional[Sequence[OSMMember]]) -> str:
    if members is None:
        return "null"
    return "[" + ", ".join(repr(m) for m in members) + "]"


class OSMWay(OSMEntity):
    """osm/OSM.java:230-296 Way — ordered node members."""

    __slots__ = ("members",)

    def __init__(self, id, version, timestamp, changeset, user_id, tags, refs):
        super().__init__(id, version, timestamp, changeset, user_id, tags)
        self.members = None if refs is None else tuple(refs)

    def get_type(self) -> OSMType:
        return OSMType.WAY

    def get_members(self) -> Optional[Tuple[OSMMember, ...]]:
        return self.members

    def get_member_entities(self, timestamp) -> Iterator["OSMNode"]:
        for m in self.members or ():
            if m.entity is not None:
                version = m.entity.get_by_timestamp(timestamp)
                if version is not None:
                    yield version

    def __eq__(self, other: object) -> bool:
        return (
            super().__eq__(other)
            and isinstance(other, OSMWay)
            and self.members == other.get_members()
        )

    def __hash__(self) -> int:
        return hash((super().__hash__(), self.members))

    def __repr__(self) -> str:
        return f"WAY-> {self._base_str()} Refs:{_members_str(self.members)}"


class OSMRelation(OSMEntity):
    """osm/OSM.java:298-376 Relation — typed, roled members."""

    __slots__ = ("members",)

    def __init__(self, id, version, timestamp, changeset, user_id, tags, members):
        super().__init__(id, version, timestamp, changeset, user_id, tags)
        self.members = None if members is None else tuple(members)

    def get_type(self) -> OSMType:
        return OSMType.RELATION

    def get_members(self) -> Optional[Tuple[OSMMember, ...]]:
        return self.members

    def get_member_entities(self, timestamp, member_filter=None) -> Iterator[OSMEntity]:
        for m in self.members or ():
            if member_filter is not None and not member_filter(m):
                continue
            if m.entity is not None:
                version = m.entity.get_by_timestamp(timestamp)
                if version is not None:
                    yield version

    def __eq__(self, other: object) -> bool:
        return (
            super().__eq__(other)
            and isinstance(other, OSMRelation)
            and self.members == other.get_members()
        )

    def __hash__(self) -> int:
        return hash((super().__hash__(), self.members))

    def __repr__(self) -> str:
        return f"Relation-> {self._base_str()} Mem:{_members_str(self.members)}"


class OSM:
    """osm/OSM.java:19-72 factory namespace."""

    node = OSMNode
    way = OSMWay
    relation = OSMRelation


# ---------------------------------------------------------------------------
# OSH full-history containers
# ---------------------------------------------------------------------------


class OSHEntity:
    """osh/impl/OSHEntityImpl.java — semantics-only port.

    Versions iterate NEWEST-first (toString at OSHEntityImpl.java:478-482
    takes Vmax from the first iterated element and Creation from the last);
    equality/hashCode are (type, id) (OSHEntityImpl.java:356-372); the bbox
    spans every version's coordinates.  The reference's delta-encoded byte
    layout is intentionally not ported — the columnar store is that layer.
    """

    __slots__ = ("id", "_versions", "min_lon", "min_lat", "max_lon", "max_lat")

    def __init__(self, id: int, versions: List[OSMEntity]):
        self.id = int(id)
        # newest first: descending (version, timestamp)
        self._versions = tuple(
            sorted(
                versions,
                key=lambda v: (v.get_version(), v.get_epoch_second()),
                reverse=True,
            )
        )
        self.min_lon = self.min_lat = self.max_lon = self.max_lat = 0

    def get_type(self) -> OSMType:
        raise NotImplementedError

    def get_id(self) -> int:
        return self.id

    def get_versions(self) -> Tuple[OSMEntity, ...]:
        return self._versions

    def get_by_timestamp(self, timestamp) -> Optional[OSMEntity]:
        """OSHEntities.getByTimestamp: latest version at or before ts."""
        ts = getattr(timestamp, "epoch_second", timestamp)
        for v in self._versions:  # newest first
            if v.get_epoch_second() <= ts:
                return v
        return None

    def _set_bbox(self, coords: Iterable[Tuple[int, int]]) -> None:
        pts = list(coords)
        if not pts:
            return
        self.min_lon = min(p[0] for p in pts)
        self.max_lon = max(p[0] for p in pts)
        self.min_lat = min(p[1] for p in pts)
        self.max_lat = max(p[1] for p in pts)

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, OSHEntity)
            and self.get_type() == other.get_type()
            and self.id == other.get_id()
        )

    def __hash__(self) -> int:
        return hash((self.get_type(), self.id))

    def _base_str(self) -> str:
        vs = self._versions
        return (
            f"ID:{self.id} Vmax:+{vs[0].get_version()}+"
            f" Creation:{vs[-1].get_epoch_second()}"
            f" BBox:({to_wgs84(self.min_lat):f},{to_wgs84(self.min_lon):f}),"
            f"({to_wgs84(self.max_lat):f},{to_wgs84(self.max_lon):f})"
        )


class OSHNode(OSHEntity):
    """osh/impl/OSHNodeImpl.java — build + toString 'OSHNode %s'."""

    __slots__ = ()

    @staticmethod
    def build(versions: List[OSMNode], **_bases) -> "OSHNode":
        if not versions:
            raise ValueError("versions must not be empty")
        node = OSHNode(versions[0].get_id(), versions)
        node._set_bbox((v.get_lon(), v.get_lat()) for v in node.get_versions())
        return node

    def get_type(self) -> OSMType:
        return OSMType.NODE

    def __repr__(self) -> str:
        return f"OSHNode {self._base_str()}"


def _wire_members(
    members: Optional[Sequence[OSMMember]],
    by_key: dict,
) -> Optional[Tuple[OSMMember, ...]]:
    if members is None:
        return None
    return tuple(
        OSMMember(m.id, m.type, m.role.get_id(), by_key.get((m.type, m.id)))
        for m in members
    )


def _entity_coords(ent: "OSHEntity") -> Iterator[Tuple[int, int]]:
    if isinstance(ent, OSHNode):
        for v in ent.get_versions():
            yield (v.get_lon(), v.get_lat())
    else:
        if ent.max_lon or ent.min_lon or ent.max_lat or ent.min_lat:
            yield (ent.min_lon, ent.min_lat)
            yield (ent.max_lon, ent.max_lat)


class OSHWay(OSHEntity):
    """osh/impl/OSHWayImpl.java — node members resolved at build time."""

    __slots__ = ("_nodes",)

    @staticmethod
    def build(versions: List[OSMWay], nodes: List[OSHNode], **_bases) -> "OSHWay":
        if not versions:
            raise ValueError("versions must not be empty")
        by_key = {(n.get_type(), n.get_id()): n for n in nodes}
        wired = [
            OSMWay(
                v.get_id(),
                v._version,
                v.get_epoch_second(),
                v.get_changeset_id(),
                v.get_user_id(),
                v.get_tags(),
                _wire_members(v.get_members(), by_key),
            )
            for v in versions
        ]
        way = OSHWay(versions[0].get_id(), wired)
        referenced = {
            (m.type, m.id) for v in wired for m in (v.get_members() or ())
        }
        way._nodes = tuple(
            sorted(
                (n for n in nodes if (n.get_type(), n.get_id()) in referenced),
                key=lambda n: n.get_id(),
            )
        )
        way._set_bbox(
            pt for n in way._nodes for pt in _entity_coords(n)
        )
        return way

    def get_type(self) -> OSMType:
        return OSMType.WAY

    def get_nodes(self) -> Tuple[OSHNode, ...]:
        return self._nodes

    def __repr__(self) -> str:
        return f"OSHWay {self._base_str()}"


class OSHRelation(OSHEntity):
    """osh/impl/OSHRelationImpl.java — node + way members."""

    __slots__ = ("_nodes", "_ways")

    @staticmethod
    def build(
        versions: List[OSMRelation],
        nodes: List[OSHNode],
        ways: List[OSHWay],
        *_bases,
        **_kw,
    ) -> "OSHRelation":
        if not versions:
            raise ValueError("versions must not be empty")
        by_key = {(e.get_type(), e.get_id()): e for e in [*nodes, *ways]}
        wired = [
            OSMRelation(
                v.get_id(),
                v._version,
                v.get_epoch_second(),
                v.get_changeset_id(),
                v.get_user_id(),
                v.get_tags(),
                _wire_members(v.get_members(), by_key),
            )
            for v in versions
        ]
        rel = OSHRelation(versions[0].get_id(), wired)
        referenced = {
            (m.type, m.id) for v in wired for m in (v.get_members() or ())
        }
        rel._nodes = tuple(
            sorted(
                (n for n in nodes if (n.get_type(), n.get_id()) in referenced),
                key=lambda n: n.get_id(),
            )
        )
        rel._ways = tuple(
            sorted(
                (w for w in ways if (w.get_type(), w.get_id()) in referenced),
                key=lambda w: w.get_id(),
            )
        )
        rel._set_bbox(
            pt
            for ent in [*rel._nodes, *rel._ways]
            for pt in _entity_coords(ent)
        )
        return rel

    def get_type(self) -> OSMType:
        return OSMType.RELATION

    def get_nodes(self) -> Tuple[OSHNode, ...]:
        return self._nodes

    def get_ways(self) -> Tuple[OSHWay, ...]:
        return self._ways

    def __repr__(self) -> str:
        return f"OSHRelation {self._base_str()}"


# ---------------------------------------------------------------------------
# Columnar bridge
# ---------------------------------------------------------------------------

_TYPE_BY_NAME = {"node": OSMType.NODE, "way": OSMType.WAY, "relation": OSMType.RELATION}


def entity_from_row(row, role_ids: Optional[dict] = None) -> OSMEntity:
    """Lift one normalized entities-DataFrame row (sources/entities.py
    PAYLOAD_SCHEMA) into the matching OSM* object.

    ``role_ids`` maps role strings to int ids (``sources.keytables.
    build_role_table`` collected); unknown/absent roles get -1 (EMPTY),
    matching ``encode_member_roles``'s unknown-role flag.
    """
    d = row.asDict() if hasattr(row, "asDict") else dict(row)
    tags = {int(k): int(v) for k, v in (d.get("tags") or {}).items()}
    kvs = [x for k in sorted(tags) for x in (k, tags[k])]
    version = int(d["version"])
    signed = version if d.get("visible", True) else -version
    common = (d["id"], signed, d["ts"], d["changeset"], d["uid"], kvs)
    t = _TYPE_BY_NAME[d["type"]]
    if t is OSMType.NODE:
        return OSMNode(*common, d.get("lon") or 0, d.get("lat") or 0)
    if t is OSMType.WAY:
        refs = d.get("refs") or []
        members = tuple(OSMMember(r, OSMType.NODE, 0) for r in refs)
        return OSMWay(*common, members)
    roles = role_ids or {}
    members = tuple(
        OSMMember(
            m["ref"] if isinstance(m, dict) else m.ref,
            _TYPE_BY_NAME[(m["type"] if isinstance(m, dict) else m.type)],
            roles.get((m["role"] if isinstance(m, dict) else m.role), -1),
        )
        for m in (d.get("members") or [])
    )
    return OSMRelation(*common, members)
