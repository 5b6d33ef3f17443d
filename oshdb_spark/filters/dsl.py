"""OSHDB filter DSL -> Catalyst Column trees.

Grammar from the reference (oshdb-filter/README.md:57-107; parser
oshdb-filter/src/main/java/org/heigit/ohsome/oshdb/filter/FilterParser.java:330-349,
precedence () > not > and > or):

  expr     := or
  or       := and ("or" and)*
  and      := not ("and" not)*
  not      := "not" not | primary
  primary  := "(" expr ")" | selector
  selector := key "=" (value | "*")            TagFilterEquals / EqualsAny
            | key "!=" (value | "*")           TagFilterNotEquals / NotEqualsAny
            | key "in" "(" value ("," value)* ")"   TagFilterEqualsAnyOf
            | "type" ":" osmtype               TypeFilter
            | "id" ":" (id | type/id | "(" list-or-range ")")   IdFilter*
            | "geometry" ":" geomtype          GeometryTypeFilter
            | ("area"|"length"|"perimeter") ":" "(" range ")"   GeometryFilter
            | "geometry.vertices" ":" range, geometry.outers/inners/
              roundness/squareness             GeometryFilter subtypes
            | "changeset" ":" ...              ChangesetIdFilter* (contribution)
            | "contributor" ":" ...            ContributorUserIdFilter*

Each AST node compiles to
  * ``osm_column(cols)``  — per-version predicate over the normalized
    entities schema (applyOSM, FilterExpression.java); tags are int-coded via
    a TagTranslator (keytables, TagTranslator.java:17-60) — an unknown
    key/value makes equals-filters constant-false (reference semantics:
    missing keytable entry can never match);
  * ``osm_types()``       — the OSM type-set narrowing used by the reference
    optimizer's DNF rewrite (MapReducer.java:1910-1935,
    GeometryTypeFilter.getOSMTypes GeometryTypeFilter.java:91-99): AND
    intersects, OR unions, NOT is conservative (full set);
  * geometry-metric selectors additionally reference geometry-stage columns
    (geom_type/area/length/...) present after the snapshot/contribution view.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

ALL_TYPES = frozenset({"node", "way", "relation"})


class FilterParseError(ValueError):
    pass


@dataclass
class TagTranslator:
    """String keys/values/roles <-> int codes (keytables).

    Mirrors the reference's TagTranslator surface
    (oshdb-util/.../tagtranslator/TagTranslator.java and its
    AbstractTagTranslatorTest): forward lookups return None for strings
    absent from the keytables (the reference's empty Optional), reverse
    lookups (`lookup_*`) raise KeyError for unknown ids (the reference
    throws on ids missing from the keytables)."""

    keys: dict[str, int] = field(default_factory=dict)
    values: dict[tuple[str, str], int] = field(default_factory=dict)
    roles: dict[str, int] = field(default_factory=dict)

    def key_id(self, key: str) -> int | None:
        return self.keys.get(key)

    def value_id(self, key: str, value: str) -> int | None:
        return self.values.get((key, value))

    def tag_id(self, key: str, value: str) -> tuple[int, int] | None:
        """OSMTag -> OSHDBTag (getOSHDBTagOf): (key_id, value_id) or None."""
        ki = self.keys.get(key)
        vi = self.values.get((key, value))
        return None if ki is None or vi is None else (ki, vi)

    def role_id(self, role: str) -> int | None:
        """OSMRole -> OSHDBRole (getOSHDBRoleOf)."""
        return self.roles.get(role)

    # -- reverse lookups (lookupTag / lookupRole) -------------------------

    def lookup_key(self, key_id: int) -> str:
        return self._rev_keys()[key_id]

    def lookup_tag(self, key_id: int, value_id: int) -> tuple[str, str]:
        return self._rev_values()[(key_id, value_id)]

    def lookup_role(self, role_id: int) -> str:
        return self._rev_roles()[role_id]

    def _rev_keys(self) -> dict[int, str]:
        cached = getattr(self, "__rev_keys", None)
        if cached is None or len(cached) != len(self.keys):
            cached = {i: k for k, i in self.keys.items()}
            object.__setattr__(self, "__rev_keys", cached)
        return cached

    def _rev_values(self) -> dict[tuple[int, int], tuple[str, str]]:
        cached = getattr(self, "__rev_values", None)
        if cached is None or len(cached) != len(self.values):
            cached = {
                (self.keys[k], i): (k, v) for (k, v), i in self.values.items()
            }
            object.__setattr__(self, "__rev_values", cached)
        return cached

    def _rev_roles(self) -> dict[int, str]:
        cached = getattr(self, "__rev_roles", None)
        if cached is None or len(cached) != len(self.roles):
            cached = {i: r for r, i in self.roles.items()}
            object.__setattr__(self, "__rev_roles", cached)
        return cached


class CachedTagTranslator:
    """Size-bounded caching wrapper over any TagTranslator — the analog of
    the reference's CachedTagTranslator
    (oshdb-util/.../tagtranslator/CachedTagTranslator.java:1-80 and its
    CachedTagTranslatorTest): reverse lookups (`lookup_tag`/`lookup_role`)
    populate LRU caches, the tag cache weighted by the value string's
    UTF-16 byte size (``len(value) * 2`` — the reference's weigher) against
    ``max_bytes_values``, the role cache by entry count against
    ``max_num_roles``; forward ``tag_id`` hits ALSO warm the reverse cache
    (getOSHDBTagOf's ``ifPresent(put)``).  Forward lookups themselves are
    never cached — the source translator is already a dictionary here, so
    only the reverse maps (rebuilt per miss in the reference's JDBC
    translator) benefit.
    """

    def __init__(self, source: "TagTranslator", max_bytes_values: int = 1 << 20,
                 max_num_roles: int = 1024):
        from collections import OrderedDict

        self.source = source
        self.max_bytes_values = int(max_bytes_values)
        self.max_num_roles = int(max_num_roles)
        self._tag_cache: "OrderedDict[tuple[int,int], tuple[str,str]]" = OrderedDict()
        self._tag_bytes = 0
        self._role_cache: "OrderedDict[int, str]" = OrderedDict()

    # -- forward (delegated; tag_id warms the reverse cache) --------------
    def key_id(self, key):
        return self.source.key_id(key)

    def value_id(self, key, value):
        return self.source.value_id(key, value)

    def tag_id(self, key, value):
        tid = self.source.tag_id(key, value)
        if tid is not None:
            self._put_tag(tid, (key, value))
        return tid

    def role_id(self, role):
        return self.source.role_id(role)

    # -- reverse (cached) --------------------------------------------------
    def lookup_tag(self, key_id, value_id):
        tid = (key_id, value_id)
        hit = self._tag_cache.get(tid)
        if hit is not None:
            self._tag_cache.move_to_end(tid)
            return hit
        tag = self.source.lookup_tag(key_id, value_id)
        self._put_tag(tid, tag)
        return tag

    def lookup_key(self, key_id):
        return self.source.lookup_key(key_id)

    def lookup_role(self, role_id):
        hit = self._role_cache.get(role_id)
        if hit is not None:
            self._role_cache.move_to_end(role_id)
            return hit
        role = self.source.lookup_role(role_id)
        self._role_cache[role_id] = role
        while len(self._role_cache) > self.max_num_roles:
            self._role_cache.popitem(last=False)
        return role

    def _put_tag(self, tid, tag):
        if tid in self._tag_cache:
            self._tag_cache.move_to_end(tid)
            return
        self._tag_cache[tid] = tag
        self._tag_bytes += len(tag[1]) * 2
        while self._tag_bytes > self.max_bytes_values and self._tag_cache:
            _, (__, evicted_value) = self._tag_cache.popitem(last=False)
            self._tag_bytes -= len(evicted_value) * 2

    # the DSL compiler reads these dictionaries directly on the fixture path
    @property
    def keys(self):
        return self.source.keys

    @property
    def values(self):
        return self.source.values

    @property
    def roles(self):
        return self.source.roles


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

_GEOM_TYPE_OSM = {
    "point": frozenset({"node"}),
    "line": frozenset({"way"}),
    "polygon": frozenset({"way", "relation"}),
    "other": frozenset({"relation"}),
}

# geometry WKT prefix -> DSL geometry type
_GEOM_TYPE_COND = {
    "point": ["POINT"],
    "line": ["LINESTRING", "MULTILINESTRING"],
    "polygon": ["POLYGON", "MULTIPOLYGON"],
    "other": ["GEOMETRYCOLLECTION", "MULTIPOINT"],
}

# packed-geometry header byte (geometry/model.py _GTYPE_CODE) per DSL type
_GEOM_TYPE_PACKED = {
    "point": [1],
    "line": [2, 3],
    "polygon": [4, 5],
    "other": [6],
}

_METRIC_COLS = {
    "area": "area",
    "length": "length",
    "perimeter": "length",  # perimeter of polygons == boundary length column
    # derived metrics: views attach these columns lazily (one Arrow pass,
    # operators/geometry_ops.geometry_metrics_udf) only when the compiled
    # filter tree references them — the columnar analog of the reference's
    # lazy geometry evaluation (GeometryFilter.java:8-34 subclasses
    # Vertices/OuterRings/InnerRings/Roundness/Squareness)
    "vertices": "g_vertices",
    "outers": "g_outers",
    "inners": "g_inners",
    "roundness": "g_roundness",
    "squareness": "g_squareness",
}

# metrics whose columns are not part of the base view output and must be
# derived from the built geometry on demand
DERIVED_METRICS = {"vertices", "outers", "inners", "roundness", "squareness"}


def compile_with_packed_geom(node: "Node") -> Column:
    """Compile a filter tree for CONTRIBUTION event states, where
    ways/relations carry packed binary geometry and a null wkt:
    GeometryTypeFilter nodes use their packed-header fallback
    (geom_column); everything else compiles as usual.  Fixes
    geometry:-type selectors silently matching nothing on the
    contribution view (ApplyOSMContributionTest.testBasicFallback)."""
    if isinstance(node, GeometryTypeFilter):
        return node.geom_column()
    if isinstance(node, AndOp):
        return compile_with_packed_geom(node.left) & compile_with_packed_geom(
            node.right
        )
    if isinstance(node, OrOp):
        return compile_with_packed_geom(node.left) | compile_with_packed_geom(
            node.right
        )
    if isinstance(node, NotOp):
        return ~compile_with_packed_geom(node.child)
    return node.osm_column()


def osh_prefilter(node: "Node"):
    """Per-version upper-bound Column for the reference's applyOSH coarse
    prefilter (oshdb-filter FilterInternal.applyOSH; ApplyOSHTest.java):
    if NO version of an entity satisfies this bound, no query row can ever
    come from that entity, so ANY-over-versions of the bound prunes whole
    histories BEFORE member resolution and geometry construction.

    Exact for tag/id/type leaves (they read only version-local columns);
    geometry/metric/contribution leaves are bounded by TRUE (not
    evaluable pre-geometry — the reference's applyOSH also returns true
    for them); a negation is exact iff its child is, else TRUE.

    Returns None when the bound is trivially TRUE (no prune possible).
    """
    col, _ = _osh_upper_bound(node)
    return col


def _osh_upper_bound(node: "Node"):
    """-> (Column | None, exact). None means literal TRUE."""
    if isinstance(node, (TagEquals, TagEqualsAny, TagIn, TypeFilter, IdFilter)):
        return node.osm_column(), True
    if isinstance(node, ConstantFilter):
        return (None, True) if node.state else (F.lit(False), True)
    if isinstance(node, AndOp):
        a, ea = _osh_upper_bound(node.left)
        b, eb = _osh_upper_bound(node.right)
        if a is None:
            return b, ea and eb
        if b is None:
            return a, ea and eb
        return a & b, ea and eb
    if isinstance(node, OrOp):
        a, ea = _osh_upper_bound(node.left)
        b, eb = _osh_upper_bound(node.right)
        if a is None or b is None:
            return None, False
        return a | b, ea and eb
    if isinstance(node, NotOp):
        c, ec = _osh_upper_bound(node.child)
        if ec:
            return (F.lit(False) if c is None else ~c), True
        return None, False
    return None, False


def metrics_needed(node: "Node") -> set[str]:
    """Derived geometry metrics referenced anywhere in a filter tree."""
    out: set[str] = set()
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, GeometryMetricFilter) and n.metric in DERIVED_METRICS:
            out.add(n.metric)
        for attr in ("left", "right", "child"):
            c = getattr(n, attr, None)
            if c is not None:
                stack.append(c)
    return out


class Node:
    def osm_column(self) -> Column:
        raise NotImplementedError

    def osm_types(self) -> frozenset[str]:
        return ALL_TYPES

    def negate(self) -> "Node":
        return NotOp(self)


@dataclass
class ConstantFilter(Node):
    """The empty filter parses to constant true (FilterParser.java: an
    empty/whitespace-only string is the match-everything filter)."""

    state: bool = True

    def osm_column(self) -> Column:
        return F.lit(self.state)

    def negate(self) -> "Node":
        return ConstantFilter(not self.state)


@dataclass
class TagEquals(Node):
    key: str
    value: str
    tr: TagTranslator

    def osm_column(self) -> Column:
        k = self.tr.key_id(self.key)
        v = self.tr.value_id(self.key, self.value)
        if k is None or v is None:
            return F.lit(False)
        return F.coalesce(
            F.element_at(F.col("tags"), F.lit(k)) == F.lit(v), F.lit(False)
        )


@dataclass
class TagEqualsAny(Node):
    key: str
    tr: TagTranslator

    def osm_column(self) -> Column:
        k = self.tr.key_id(self.key)
        if k is None:
            return F.lit(False)
        return F.map_contains_key(F.col("tags"), F.lit(k))


@dataclass
class TagIn(Node):
    key: str
    values: list[str]
    tr: TagTranslator

    def osm_column(self) -> Column:
        k = self.tr.key_id(self.key)
        if k is None:
            return F.lit(False)
        ids = [
            self.tr.value_id(self.key, v)
            for v in self.values
            if self.tr.value_id(self.key, v) is not None
        ]
        if not ids:
            return F.lit(False)
        return F.coalesce(
            F.element_at(F.col("tags"), F.lit(k)).isin(ids), F.lit(False)
        )


@dataclass
class TypeFilter(Node):
    osm_type: str

    def osm_column(self) -> Column:
        return F.col("type") == F.lit(self.osm_type)

    def osm_types(self) -> frozenset[str]:
        return frozenset({self.osm_type})


@dataclass
class IdFilter(Node):
    """id equals / any-of / range; entries may be (type, id) pairs."""

    ids: list[tuple[str | None, int]] | None = None  # equals / any-of
    lo: int | None = None  # range (inclusive); None = open
    hi: int | None = None

    def osm_column(self) -> Column:
        if self.ids is not None:
            typed = [(t, i) for t, i in self.ids if t is not None]
            untyped = [i for t, i in self.ids if t is None]
            cond = F.lit(False)
            if untyped:
                cond = cond | F.col("id").isin(untyped)
            for t, i in typed:
                cond = cond | ((F.col("type") == t) & (F.col("id") == i))
            return cond
        cond = F.lit(True)
        if self.lo is not None:
            cond = cond & (F.col("id") >= self.lo)
        if self.hi is not None:
            cond = cond & (F.col("id") <= self.hi)
        return cond

    def osm_types(self) -> frozenset[str]:
        if self.ids is not None and all(t is not None for t, _ in self.ids):
            return frozenset(t for t, _ in self.ids)
        return ALL_TYPES


@dataclass
class GeometryTypeFilter(Node):
    geom_type: str

    def osm_column(self) -> Column:
        # geometry-stage predicate: WKT prefix match on the built geometry
        prefixes = _GEOM_TYPE_COND[self.geom_type]
        cond = F.lit(False)
        for p in prefixes:
            cond = cond | F.col("wkt").startswith(p + " ") | (F.col("wkt") == p + " EMPTY")
        if self.geom_type == "polygon":
            # exclude MULTIPOLYGON being matched by POLYGON prefix is fine
            # (both are polygonal); 'other' excludes them
            pass
        return cond

    def geom_column(self) -> Column:
        """Like osm_column, but for dataframes where ways/relations carry
        the PACKED geometry (binary `geom`, null `wkt` — contribution
        event states): falls back to the packed header's gtype byte
        (geometry/model.py byte-0 codes) when wkt is null.  JVM-side
        either way — one substring per row, no decode."""
        codes = _GEOM_TYPE_PACKED[self.geom_type]
        head = F.expr("substring(geom, 1, 1)")
        packed = F.lit(False)
        for c in codes:
            packed = packed | (head == F.expr(f"X'{c:02x}'"))
        return F.when(F.col("wkt").isNotNull(), self.osm_column()).otherwise(
            F.coalesce(packed, F.lit(False))
        )

    def osm_types(self) -> frozenset[str]:
        return _GEOM_TYPE_OSM[self.geom_type]


@dataclass
class GeometryMetricFilter(Node):
    metric: str  # area | length | perimeter | vertices | ...
    lo: float | None
    hi: float | None

    def osm_column(self) -> Column:
        col = _METRIC_COLS[self.metric]
        cond = F.lit(True)
        if self.lo is not None:
            cond = cond & (F.col(col) >= self.lo)
        if self.hi is not None:
            cond = cond & (F.col(col) <= self.hi)
        return cond

    def osm_types(self) -> frozenset[str]:
        if self.metric in ("area", "perimeter"):
            return frozenset({"way", "relation"})
        return ALL_TYPES


@dataclass
class ContributionColFilter(Node):
    """changeset:… / contributor:… (contribution view only)."""

    col: str  # changeset | contrib_uid
    ids: list[int] | None = None
    lo: int | None = None
    hi: int | None = None

    def osm_column(self) -> Column:
        if self.ids is not None:
            return F.col(self.col).isin(self.ids)
        cond = F.lit(True)
        if self.lo is not None:
            cond = cond & (F.col(self.col) >= self.lo)
        if self.hi is not None:
            cond = cond & (F.col(self.col) <= self.hi)
        return cond


@dataclass
class AndOp(Node):
    left: Node
    right: Node

    def osm_column(self) -> Column:
        return self.left.osm_column() & self.right.osm_column()

    def osm_types(self) -> frozenset[str]:
        return self.left.osm_types() & self.right.osm_types()

    def negate(self) -> "Node":
        # De Morgan push-down (AndOperator.negate -> OrOperator of the
        # negated operands, BinaryOperator.java / NegateTest.java)
        return OrOp(self.left.negate(), self.right.negate())


@dataclass
class OrOp(Node):
    left: Node
    right: Node

    def osm_column(self) -> Column:
        return self.left.osm_column() | self.right.osm_column()

    def osm_types(self) -> frozenset[str]:
        return self.left.osm_types() | self.right.osm_types()

    def negate(self) -> "Node":
        # De Morgan push-down (OrOperator.negate -> AndOperator of the
        # negated operands, BinaryOperator.java / NegateTest.java)
        return AndOp(self.left.negate(), self.right.negate())


@dataclass
class NotOp(Node):
    child: Node

    def osm_column(self) -> Column:
        return ~self.child.osm_column()

    def osm_types(self) -> frozenset[str]:
        return ALL_TYPES  # conservative (reference: negation widens)

    def negate(self) -> "Node":
        # double negation elimination (FilterExpression.negate contract,
        # NegateTest.java: negation of a negation is the original filter)
        return self.child


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    \s*(
      "(?:[^"\\]|\\.)*"        # quoted string
    | !=                       # not-equals
    | \.\.                     # range dots
    | [()=:,]                  # punctuation
    | [A-Za-z0-9_\-.:*+/]+     # bare word (may contain : - . * /)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "in"}


def _tokenize(text: str) -> list[str]:
    tokens, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise FilterParseError(f"unexpected character at {pos}: {text[pos:]!r}")
        tokens.append(m.group(1))
        pos = m.end()
    return tokens


def _unquote(tok: str) -> str:
    if tok.startswith('"') and tok.endswith('"'):
        return tok[1:-1].replace('\\"', '"').replace("\\\\", "\\")
    return tok


# ---------------------------------------------------------------------------
# parser (recursive descent)
# ---------------------------------------------------------------------------


class _Parser:
    def __init__(self, tokens: list[str], tr: TagTranslator):
        self.toks = tokens
        self.i = 0
        self.tr = tr

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def pop(self) -> str:
        if self.i >= len(self.toks):
            raise FilterParseError("unexpected end of filter")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, tok: str) -> None:
        t = self.pop()
        if t != tok:
            raise FilterParseError(f"expected {tok!r}, got {t!r}")

    def parse(self) -> Node:
        node = self.parse_or()
        if self.peek() is not None:
            raise FilterParseError(f"trailing tokens: {self.toks[self.i:]}")
        return node

    def parse_or(self) -> Node:
        node = self.parse_and()
        while self.peek() == "or":
            self.pop()
            node = OrOp(node, self.parse_and())
        return node

    def parse_and(self) -> Node:
        node = self.parse_not()
        while self.peek() == "and":
            self.pop()
            node = AndOp(node, self.parse_not())
        return node

    def parse_not(self) -> Node:
        if self.peek() == "not":
            self.pop()
            return NotOp(self.parse_not())
        return self.parse_primary()

    def parse_primary(self) -> Node:
        if self.peek() == "(":
            self.pop()
            node = self.parse_or()
            self.expect(")")
            return node
        return self.parse_selector()

    # -- selectors ----------------------------------------------------------

    _KEYWORD_SELECTORS = frozenset(
        {
            "type", "id", "geometry", "area", "length", "perimeter",
            "changeset", "contributor", "geometry.vertices", "geometry.outers",
            "geometry.inners", "geometry.roundness", "geometry.squareness",
        }
    )

    def parse_selector(self) -> Node:
        tok = self.pop()
        word = _unquote(tok)

        # keyword selectors: the tokenizer keeps colons inside bare words, so
        # `type:node` is one token; `type : node` is three
        head, sep, rest = word.partition(":")
        if sep and head in self._KEYWORD_SELECTORS:
            if not rest and self.peek() != "(":
                rest = _unquote(self.pop())
            return self._keyword_selector(head, rest)
        if word in self._KEYWORD_SELECTORS and self.peek() == ":":
            self.pop()
            rest = "" if self.peek() == "(" else _unquote(self.pop())
            return self._keyword_selector(word, rest)
        # tag selector
        key = word
        nxt = self.peek()
        if nxt == "=":
            self.pop()
            val = _unquote(self.pop())
            if val == "*":
                return TagEqualsAny(key, self.tr)
            return TagEquals(key, val, self.tr)
        if nxt == "!=":
            self.pop()
            val = _unquote(self.pop())
            if val == "*":
                return NotOp(TagEqualsAny(key, self.tr))
            return NotOp(TagEquals(key, val, self.tr))
        if nxt == "in":
            self.pop()
            self.expect("(")
            vals = [_unquote(self.pop())]
            while self.peek() == ",":
                self.pop()
                vals.append(_unquote(self.pop()))
            self.expect(")")
            return TagIn(key, vals, self.tr)
        raise FilterParseError(f"cannot parse selector at {word!r} (next: {nxt!r})")

    def _keyword_selector(self, head: str, rest: str) -> Node:
        if head == "type":
            if rest not in ALL_TYPES:
                raise FilterParseError(f"unknown osm type {rest!r}")
            return TypeFilter(rest)
        if head == "geometry":
            if rest not in _GEOM_TYPE_OSM:
                raise FilterParseError(f"unknown geometry type {rest!r}")
            return GeometryTypeFilter(rest)
        if head == "id":
            return self._id_selector(rest)
        if head in ("area", "length", "perimeter") or head.startswith("geometry."):
            metric = head.split(".", 1)[-1] if head.startswith("geometry.") else head
            lo, hi = self._range_or_number(rest)
            return GeometryMetricFilter(metric, lo, hi)
        if head in ("changeset", "contributor"):
            col = "changeset" if head == "changeset" else "contrib_uid"
            if rest:
                return ContributionColFilter(col, ids=[int(rest)])
            lo, hi, ids = self._paren_list_or_range()
            if ids is not None:
                return ContributionColFilter(col, ids=[i for _, i in ids])
            lo = int(lo) if lo else None
            hi = int(hi) if hi else None
            if lo is not None and hi is not None and lo > hi:
                lo, hi = hi, lo  # IdRange normalizes (IdRange.java:22-25)
            return ContributionColFilter(col, lo=lo, hi=hi)
        raise FilterParseError(f"unknown selector {head!r}")

    def _id_selector(self, rest: str) -> Node:
        if rest:
            if "/" in rest:
                t, i = rest.split("/", 1)
                return IdFilter(ids=[(t, int(i))])
            return IdFilter(ids=[(None, int(rest))])
        lo, hi, ids = self._paren_list_or_range()
        if ids is not None:
            return IdFilter(ids=ids)
        lo = int(lo) if lo is not None else None
        hi = int(hi) if hi is not None else None
        if lo is not None and hi is not None and lo > hi:
            lo, hi = hi, lo  # IdRange normalizes (IdRange.java:22-25)
        return IdFilter(lo=lo, hi=hi)

    def _paren_list_or_range(self):
        """Parse '( a,b,c )' or '( a..b )'; returns (lo, hi, ids).

        Ranges like '1..3' or '123.4..1E6' arrive as single word tokens
        (dots are word characters); re-join whatever sits inside the parens
        and interpret the joined string.
        """
        self.expect("(")
        parts: list[str] = []
        while self.peek() is not None and self.peek() != ")":
            parts.append(self.pop())
        self.expect(")")
        s = "".join(parts)
        if ".." in s and "," not in s:
            lo, _, hi = s.partition("..")
            return (lo or None), (hi or None), None
        ids = []
        for it in s.split(","):
            it = _unquote(it.strip())
            if "/" in it:
                t, i = it.split("/", 1)
                ids.append((t, int(i)))
            else:
                ids.append((None, int(it)))
        return None, None, ids

    def _range_or_number(self, rest: str) -> tuple[float | None, float | None]:
        if rest and not rest.startswith("("):
            return float(rest), float(rest)
        # range comes as following tokens: ( a .. b )
        lo, hi, ids = self._paren_list_or_range()
        if ids is not None:
            if len(ids) == 1:
                v = float(ids[0][1])
                return v, v
            raise FilterParseError("expected range, got list")
        return (
            float(lo) if lo is not None else None,
            float(hi) if hi is not None else None,
        )


def parse_filter(text: str, translator: TagTranslator | None = None) -> Node:
    """Parse a filter DSL string into an AST of Column-compiling nodes.

    An empty (or whitespace-only) filter is the match-everything constant
    (FilterParser.java / ParseTest.testEmptyFilter).
    """
    tr = translator or TagTranslator()
    tokens = _tokenize(text)
    if not tokens:
        return ConstantFilter(True)
    return _Parser(tokens, tr).parse()
