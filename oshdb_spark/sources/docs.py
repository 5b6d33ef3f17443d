"""Deterministic generator for the interleaved text+media docs table.

Input contract (BASELINE.json:15 / FIXTURES.md §1):

    docs(doc_id string,
         spans array<struct<kind string, text string, media_ref string,
                            offset int>>)

One document carries ONE version of ONE geospatial entity, as a JSON payload
split across 1..4 ``text`` spans interleaved with 0..3 ``media`` spans.  The
engine must reassemble the payload from the text spans (in offset order) and
must carry the span sequence through byte-identically (span-sequence
equality invariant).

The generated world mirrors the reference's OSM data model
(/root/reference/oshdb/src/main/java/org/heigit/ohsome/oshdb/osm/):
node/way/relation entities with versioned histories, int-coded tags,
1e-7 fixed-point coordinates, deletions (visible=false), tag-only and
geometry-only edits, multi-edit changesets (for contribution squashing),
and spatial skew (clustered "cities" for salted-join testing) plus border /
anti-meridian / pole specials.

Everything is seeded and order-deterministic: same (seed, n_docs) => same
bytes.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

# fraction of feature budget per entity kind
_P_NODE = 0.55
_P_WAY = 0.35
# remainder: relations

# tag-key conventions (see geometry/taginterpreter.py)
TAG_AREA = 1
TAG_BUILDING = 2
TAG_HIGHWAY = 3
TAG_TYPE = 4
TAG_LANDUSE = 5
TAG_NATURAL = 6
TAG_NAME = 7
TAG_AMENITY = 8
TAG_CREATED_BY = 9
VAL_MULTIPOLYGON = 1

T0 = 1262304000  # 2010-01-01T00:00Z
T_SPAN = 10 * 365 * 86400  # ten years of history

# skewed spatial clusters: (lon, lat, stddev_deg, weight)
CITIES = [
    (8.67, 49.39, 0.05, 0.30),   # "Heidelberg" — hot cell
    (-74.0, 40.7, 0.08, 0.15),
    (139.7, 35.7, 0.08, 0.15),
    (151.2, -33.9, 0.10, 0.10),
    (37.6, 55.8, 0.10, 0.10),
]
_UNIFORM_W = 1.0 - sum(c[3] for c in CITIES)


@dataclass
class World:
    """Ground-truth entity tables (one row per entity VERSION)."""

    nodes: pd.DataFrame = field(default_factory=pd.DataFrame)
    ways: pd.DataFrame = field(default_factory=pd.DataFrame)
    relations: pd.DataFrame = field(default_factory=pd.DataFrame)


class DocsGenerator:
    def __init__(self, n_features: int = 1000, seed: int = 42):
        self.n_features = max(n_features, 30)
        self.rs = np.random.RandomState(seed)
        self.seed = seed
        self._next_node_id = 1
        self._next_way_id = 1
        self._next_rel_id = 1
        self._next_changeset = 1

    # ---------------- spatial sampling ----------------

    def _sample_positions(self, n: int) -> np.ndarray:
        """(n, 2) lon/lat degrees with city clustering (skew)."""
        weights = np.array([c[3] for c in CITIES] + [_UNIFORM_W])
        choice = self.rs.choice(len(weights), size=n, p=weights)
        lon = np.empty(n)
        lat = np.empty(n)
        for i, (clon, clat, std, _) in enumerate(CITIES):
            m = choice == i
            k = int(m.sum())
            lon[m] = clon + self.rs.normal(0, std, k)
            lat[m] = clat + self.rs.normal(0, std, k)
        m = choice == len(CITIES)
        k = int(m.sum())
        lon[m] = self.rs.uniform(-179.9, 179.9, k)
        lat[m] = self.rs.uniform(-85, 85, k)
        np.clip(lon, -179.9999999, 179.9999999, out=lon)
        np.clip(lat, -89.9999999, 89.9999999, out=lat)
        return np.column_stack((lon, lat))

    def _timestamps(self, n_versions: int) -> list[int]:
        ts = np.sort(self.rs.randint(T0, T0 + T_SPAN, n_versions))
        # ensure strictly increasing
        for i in range(1, n_versions):
            if ts[i] <= ts[i - 1]:
                ts[i] = ts[i - 1] + 3600
        return [int(t) for t in ts]

    # ---------------- entity builders ----------------

    def _node_rows(self, nid, lon, lat, versions):
        """versions: list of dicts(ts, visible, tags, dlon, dlat, changeset, uid)"""
        rows = []
        for v, spec in enumerate(versions, start=1):
            rows.append(
                dict(
                    id=nid,
                    type="node",
                    version=v,
                    visible=spec.get("visible", True),
                    ts=spec["ts"],
                    changeset=spec["changeset"],
                    uid=spec["uid"],
                    tags=spec.get("tags", {}),
                    lon=int(round((lon + spec.get("dlon", 0.0)) * 1e7)),
                    lat=int(round((lat + spec.get("dlat", 0.0)) * 1e7)),
                )
            )
        return rows

    def _gen_standalone_nodes(self, n: int) -> list[dict]:
        pos = self._sample_positions(n)
        rows = []
        for i in range(n):
            nid = self._next_node_id
            self._next_node_id += 1
            nv = int(self.rs.choice([1, 1, 1, 2, 3]))
            tss = self._timestamps(nv)
            versions = []
            for v in range(nv):
                spec = dict(
                    ts=tss[v],
                    changeset=self._next_changeset,
                    uid=int(self.rs.randint(1, 50)),
                )
                self._next_changeset += 1
                tags = {TAG_AMENITY: int(self.rs.randint(1, 20))}
                if self.rs.rand() < 0.3:
                    tags[TAG_NAME] = int(self.rs.randint(1, 1000))
                if v == nv - 1 and self.rs.rand() < 0.08:
                    spec["visible"] = False  # deleted in last version
                if v > 0 and self.rs.rand() < 0.5:
                    # geometry-only change (move)
                    spec["dlon"] = float(self.rs.normal(0, 0.001))
                    spec["dlat"] = float(self.rs.normal(0, 0.001))
                spec["tags"] = tags
                versions.append(spec)
            rows.extend(self._node_rows(nid, pos[i, 0], pos[i, 1], versions))
        return rows

    def _gen_special_nodes(self) -> list[dict]:
        """Border / anti-meridian / pole cases (XYGrid edge rules)."""
        specials = [
            (0.0, 0.0),              # on cell borders at every zoom
            (180.0, 0.0),            # +180 wrap
            (-180.0, 0.0),
            (179.9999999, 51.3),     # just west of the anti-meridian
            (-179.9999999, 51.3),
            (12.0, 90.0),            # north pole rule
            (12.0, -90.0),
            (90.0, 45.0),            # zoom-1/2 border
        ]
        rows = []
        for lon, lat in specials:
            nid = self._next_node_id
            self._next_node_id += 1
            rows.extend(
                self._node_rows(
                    nid,
                    lon,
                    lat,
                    [
                        dict(
                            ts=T0 + 86400,
                            changeset=self._next_changeset,
                            uid=1,
                            tags={TAG_NAME: nid},
                        )
                    ],
                )
            )
            self._next_changeset += 1
        return rows

    def _make_ring_coords(self, center, radius, k):
        ang = np.linspace(0, 2 * np.pi, k, endpoint=False)
        lon = center[0] + radius * np.cos(ang)
        lat = center[1] + radius * np.sin(ang) * 0.7
        return np.column_stack((lon, lat))

    def _gen_way(self, closed: bool, node_rows: list, with_history: bool):
        """Create member nodes + the way itself; returns way rows."""
        wid = self._next_way_id
        self._next_way_id += 1
        center = self._sample_positions(1)[0]
        k = int(self.rs.randint(4, 9))
        if closed:
            coords = self._make_ring_coords(center, 0.002 + 0.01 * self.rs.rand(), k)
        else:
            steps = self.rs.normal(0, 0.003, (k, 2)).cumsum(axis=0)
            coords = center[None, :] + steps
        member_ids = []
        cs0 = self._next_changeset
        self._next_changeset += 1
        t_create = self._timestamps(1)[0]
        uid = int(self.rs.randint(1, 50))
        move_member = with_history and self.rs.rand() < 0.6
        t_move = t_create + int(self.rs.randint(86400, T_SPAN // 2))
        cs_move = None
        for j in range(k):
            nid = self._next_node_id
            self._next_node_id += 1
            member_ids.append(nid)
            versions = [dict(ts=t_create, changeset=cs0, uid=uid, tags={})]
            if move_member and j == 0:
                if cs_move is None:
                    cs_move = self._next_changeset
                    self._next_changeset += 1
                versions.append(
                    dict(
                        ts=t_move,
                        changeset=cs_move,
                        uid=uid,
                        tags={},
                        dlon=0.0005,
                        dlat=0.0005,
                    )
                )
            node_rows.extend(
                self._node_rows(nid, coords[j, 0], coords[j, 1], versions)
            )
        refs = member_ids + [member_ids[0]] if closed else member_ids
        if closed:
            tags = {TAG_BUILDING: int(self.rs.randint(1, 5))}
            if self.rs.rand() < 0.05:
                tags[TAG_AREA] = 0  # area=no override case
        else:
            tags = {TAG_HIGHWAY: int(self.rs.randint(1, 8))}
        way_rows = [
            dict(
                id=wid,
                type="way",
                version=1,
                visible=True,
                ts=t_create,
                changeset=cs0,
                uid=uid,
                tags=tags,
                refs=refs,
            )
        ]
        if with_history and self.rs.rand() < 0.5:
            # tag-only change in a second version (same changeset sometimes ->
            # squashing case uses cs_move when present)
            t2 = t_move + int(self.rs.randint(3600, 10 * 86400))
            cs2 = cs_move if cs_move is not None and self.rs.rand() < 0.4 else self._next_changeset
            if cs2 != cs_move:
                self._next_changeset += 1
            tags2 = dict(tags)
            tags2[TAG_NAME] = int(self.rs.randint(1, 1000))
            way_rows.append(
                dict(
                    id=wid,
                    type="way",
                    version=2,
                    visible=self.rs.rand() > 0.05,
                    ts=t2,
                    changeset=cs2,
                    uid=int(self.rs.randint(1, 50)),
                    tags=tags2,
                    refs=refs,
                )
            )
        return way_rows, member_ids, refs, center

    def _gen_relation(self, node_rows, way_rows_all):
        """Multipolygon relation: 2 outer half-rings + 1 inner ring."""
        rid = self._next_rel_id
        self._next_rel_id += 1
        center = self._sample_positions(1)[0]
        radius = 0.01 + 0.02 * self.rs.rand()
        k = 8
        ring = self._make_ring_coords(center, radius, k)
        ring = np.vstack([ring, ring[0]])  # closed, k+1 coords
        cs = self._next_changeset
        self._next_changeset += 1
        t_create = self._timestamps(1)[0]
        uid = int(self.rs.randint(1, 50))

        def mk_way_from_coords(coords, shared_first=None, shared_last=None):
            wid = self._next_way_id
            self._next_way_id += 1
            nids = []
            for j, (lon, lat) in enumerate(coords):
                if shared_first is not None and j == 0:
                    nids.append(shared_first)
                    continue
                if shared_last is not None and j == len(coords) - 1:
                    nids.append(shared_last)
                    continue
                nid = self._next_node_id
                self._next_node_id += 1
                nids.append(nid)
                node_rows.extend(
                    self._node_rows(
                        nid, lon, lat, [dict(ts=t_create, changeset=cs, uid=uid, tags={})]
                    )
                )
            way_rows_all.append(
                dict(
                    id=wid,
                    type="way",
                    version=1,
                    visible=True,
                    ts=t_create,
                    changeset=cs,
                    uid=uid,
                    tags={},
                    refs=nids,
                )
            )
            return wid, nids

        # split the closed ring into two open halves sharing endpoints
        half = k // 2
        w1, n1 = mk_way_from_coords(ring[: half + 1])
        w2, n2 = mk_way_from_coords(
            ring[half:], shared_first=n1[-1], shared_last=n1[0]
        )
        # inner ring (hole), one closed way
        inner = self._make_ring_coords(center, radius * 0.4, 5)
        inner = np.vstack([inner, inner[0]])
        w3, _ = mk_way_from_coords(inner[:-1])
        # close it: refs must end at start node
        way_rows_all[-1]["refs"] = way_rows_all[-1]["refs"] + [
            way_rows_all[-1]["refs"][0]
        ]
        members = [
            {"type": "way", "ref": w1, "role": "outer"},
            {"type": "way", "ref": w2, "role": "outer"},
            {"type": "way", "ref": w3, "role": "inner"},
        ]
        return [
            dict(
                id=rid,
                type="relation",
                version=1,
                visible=True,
                ts=t_create,
                changeset=cs,
                uid=uid,
                tags={TAG_TYPE: VAL_MULTIPOLYGON, TAG_NAME: rid},
                members=members,
            )
        ]

    # ---------------- world + docs ----------------

    def generate_world(self) -> World:
        n = self.n_features
        n_nodes = int(n * _P_NODE)
        n_ways = int(n * _P_WAY)
        n_rels = max(1, n - n_nodes - n_ways)

        node_rows: list[dict] = []
        way_rows: list[dict] = []
        rel_rows: list[dict] = []

        node_rows.extend(self._gen_standalone_nodes(n_nodes))
        node_rows.extend(self._gen_special_nodes())
        for i in range(n_ways):
            closed = self.rs.rand() < 0.6
            wr, _, _, _ = self._gen_way(closed, node_rows, with_history=True)
            way_rows.extend(wr)
        for _ in range(n_rels):
            rel_rows.extend(self._gen_relation(node_rows, way_rows))

        nodes = pd.DataFrame(node_rows)
        ways = pd.DataFrame(way_rows)
        rels = pd.DataFrame(rel_rows)
        return World(nodes=nodes, ways=ways, relations=rels)

    # ---------------- doc rendering ----------------

    def render_docs(self, world: World) -> pd.DataFrame:
        """One doc per entity version; JSON payload split into interleaved
        spans.  Deterministic given the generator's seed."""
        payloads: list[tuple[str, str]] = []  # (sort_key, json)
        for df, kind in (
            (world.nodes, "node"),
            (world.ways, "way"),
            (world.relations, "relation"),
        ):
            for row in df.itertuples(index=False):
                d = {
                    "id": int(row.id),
                    "type": kind,
                    "version": int(row.version),
                    "visible": bool(row.visible),
                    "ts": int(row.ts),
                    "changeset": int(row.changeset),
                    "uid": int(row.uid),
                    "tags": {str(k): int(v) for k, v in (row.tags or {}).items()},
                }
                if kind == "node":
                    d["lon"] = int(row.lon)
                    d["lat"] = int(row.lat)
                elif kind == "way":
                    d["refs"] = [int(r) for r in row.refs]
                else:
                    d["members"] = row.members
                key = f"{kind}/{int(row.id):012d}/v{int(row.version):04d}"
                payloads.append((key, json.dumps(d, sort_keys=True)))
        payloads.sort()

        doc_ids = []
        spans_col = []
        # doc-level RNG derived from content hash -> stable under re-ordering
        for i, (key, payload) in enumerate(payloads):
            h = hashlib.sha256(f"{self.seed}:{key}".encode()).digest()
            r0, r1, r2 = h[0], h[1], h[2]
            n_text = 1 + r0 % 4
            n_media = r1 % 4
            cuts = sorted(
                {1 + (h[3 + j] * 251 + h[7 + j]) % max(1, len(payload) - 1)
                 for j in range(n_text - 1)}
            )
            pieces = []
            prev = 0
            for c in cuts:
                pieces.append(payload[prev:c])
                prev = c
            pieces.append(payload[prev:])
            spans = []
            offset = 0
            media_slots = set(
                (h[11 + j] % (len(pieces) + 1)) for j in range(n_media)
            )
            for p_idx, piece in enumerate(pieces):
                if p_idx in media_slots:
                    spans.append(
                        {
                            "kind": "media",
                            "text": "",
                            "media_ref": self._media_ref(h, p_idx),
                            "offset": offset,
                        }
                    )
                    offset += 1
                spans.append(
                    {"kind": "text", "text": piece, "media_ref": "", "offset": offset}
                )
                offset += 1
            if len(pieces) in media_slots:
                spans.append(
                    {
                        "kind": "media",
                        "text": "",
                        "media_ref": self._media_ref(h, len(pieces)),
                        "offset": offset,
                    }
                )
            doc_ids.append("d" + hashlib.sha256(key.encode()).hexdigest()[:16])
            spans_col.append(spans)
        return pd.DataFrame({"doc_id": doc_ids, "spans": spans_col})

    @staticmethod
    def _media_ref(h: bytes, slot: int) -> str:
        if h[15 + slot % 8] % 2 == 0:
            z = h[16 + slot % 8] % 15
            x = h[17 + slot % 8]
            y = h[18 + slot % 8]
            return f"raster://tile/{z}/{x}/{y}"
        return "blob://" + h.hex()[:40]


def generate_docs(n_features: int = 1000, seed: int = 42):
    """Returns (docs_pdf, world) — the docs table and its ground truth."""
    gen = DocsGenerator(n_features=n_features, seed=seed)
    world = gen.generate_world()
    docs = gen.render_docs(world)
    return docs, world


DOCS_SPARK_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind string, text string, media_ref string, offset int>>"
)


def write_docs_parquet(path: str, n_features: int = 1000, seed: int = 42):
    """Materialize the docs table as parquet (pyarrow; no Spark needed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs, world = generate_docs(n_features=n_features, seed=seed)
    span_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    table = pa.table(
        {
            "doc_id": pa.array(docs["doc_id"], pa.string()),
            "spans": pa.array(docs["spans"].tolist(), span_type),
        }
    )
    # small row groups: parquet splits only at row-group boundaries, and a
    # single giant group serializes every scan regardless of core count
    pq.write_table(table, path, row_group_size=8192)
    return docs, world


def synthesize_bench_docs(spark, n_docs: int):
    """Spark-native deterministic docs generator for large-scale benching.

    Same (doc_id, spans) shape and JSON payload schema as the pandas world
    generator, but built entirely from ``spark.range`` + JVM expressions so
    10^7+ docs synthesize in seconds, distributed (the pandas generator is
    driver-side and tops out around 10^6).  Content is simpler — one node
    entity per doc, pseudo-random coords/versions via integer hashing —
    which is exactly what the tile/join throughput benchmark exercises.
    Payload is split into two text spans interleaved with one media span
    (offset-ordered), so the span-reassembly path is exercised too.
    """
    from pyspark.sql import functions as F

    df = spark.range(n_docs).select(
        F.col("id"),
        F.format_string("bench-%012d", F.col("id")).alias("doc_id"),
        # deterministic pseudo-random fixed-point coords + metadata
        (F.pmod(F.xxhash64(F.col("id")), F.lit(3_600_000_000)) - 1_800_000_000).alias("lon"),
        (F.pmod(F.xxhash64(F.col("id") + 1), F.lit(1_700_000_000)) - 850_000_000).alias("lat"),
        (F.pmod(F.col("id"), F.lit(5)) + 1).cast("int").alias("version"),
        (F.lit(1_200_000_000) + F.pmod(F.xxhash64(F.col("id") + 2), F.lit(300_000_000))).alias("ts"),
        F.pmod(F.col("id"), F.lit(100_000)).alias("changeset"),
        F.pmod(F.col("id"), F.lit(5_000)).cast("int").alias("uid"),
    )
    payload = F.format_string(
        '{"id": %d, "type": "node", "version": %d, "visible": true,'
        ' "ts": %d, "changeset": %d, "uid": %d, "tags": {"2": 1},'
        ' "lon": %d, "lat": %d, "refs": null, "members": null}',
        F.col("id"), F.col("version"), F.col("ts"), F.col("changeset"),
        F.col("uid"), F.col("lon"), F.col("lat"),
    )
    half = F.floor(F.length(payload) / 2).cast("int")
    spans = F.array(
        F.struct(
            F.lit("text").alias("kind"),
            payload.substr(F.lit(1), half).alias("text"),
            F.lit("").alias("media_ref"),
            F.lit(0).alias("offset"),
        ),
        F.struct(
            F.lit("media").alias("kind"),
            F.lit("").alias("text"),
            F.format_string("media://%s/img0", F.col("doc_id")).alias("media_ref"),
            half.alias("offset"),
        ),
        F.struct(
            F.lit("text").alias("kind"),
            payload.substr(half + 1, F.length(payload)).alias("text"),
            F.lit("").alias("media_ref"),
            (half + 1).alias("offset"),
        ),
    )
    return df.select("doc_id", spans.alias("spans"))


def synthesize_relation_docs(spark, n_rels: int):
    """Spark-native RELATION-HEAVY deterministic docs (BENCH relation
    fixture, r4 verdict Next #8): for each k of ``n_rels``, 8 nodes + 2
    closed ways (an outer and an inner square ring) + 1 multipolygon
    relation — relations are 1/11 (~9%) of entities, vs ~0.3% in OSM,
    so the per-relation Python ring-assembly cost dominates and becomes
    a tracked number instead of an estimate.

    Same doc shape as ``synthesize_bench_docs`` (3 interleaved spans);
    geometry: disjoint squares on a grid (outer half-size 8000 fp,
    inner 2400 fp, 20000 fp pitch), every ring closed, winding left to
    the assembler's normalization."""
    from pyspark.sql import functions as F

    NODE_B, WAY_B, REL_B = 1_000_000_000, 2_000_000_000, 3_000_000_000
    TS = "1250000000"

    def doc_of(df, payload):
        half = F.floor(F.length(payload) / 2).cast("int")
        spans = F.array(
            F.struct(
                F.lit("text").alias("kind"),
                payload.substr(F.lit(1), half).alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            ),
            F.struct(
                F.lit("media").alias("kind"),
                F.lit("").alias("text"),
                F.format_string("media://%s/img0", F.col("doc_id")).alias("media_ref"),
                half.alias("offset"),
            ),
            F.struct(
                F.lit("text").alias("kind"),
                payload.substr(half + 1, F.length(payload)).alias("text"),
                F.lit("").alias("media_ref"),
                (half + 1).alias("offset"),
            ),
        )
        return df.select("doc_id", spans.alias("spans"))

    # nodes: 8 per relation; corners 0-3 outer ring, 4-7 inner ring
    nd = spark.range(n_rels * 8).select(
        F.col("id").alias("i"),
        (F.col("id") / 8).cast("long").alias("k"),
        F.pmod(F.col("id"), F.lit(8)).alias("c"),
    )
    cx = (F.pmod(F.col("k"), F.lit(10000)) * 20000 - 100_000_000)
    cy = ((F.col("k") / 10000).cast("long") * 20000 - 50_000_000)
    hs = F.when(F.col("c") < 4, 8000).otherwise(2400)
    corner = F.pmod(F.col("c"), F.lit(4))
    sx = F.when(corner.isin(1, 2), 1).otherwise(-1)
    sy = F.when(corner >= 2, 1).otherwise(-1)
    nodes = nd.select(
        F.format_string("rel-n-%012d", F.col("i")).alias("doc_id"),
        F.format_string(
            '{"id": %d, "type": "node", "version": 1, "visible": true,'
            ' "ts": ' + TS + ', "changeset": 1, "uid": 1, "tags": {},'
            ' "lon": %d, "lat": %d, "refs": null, "members": null}',
            F.col("i") + NODE_B, cx + sx * hs, cy + sy * hs,
        ).alias("payload"),
    )
    # ways: 2 per relation (outer j%2==0, inner j%2==1), closed rings
    wy = spark.range(n_rels * 2).select(
        F.col("id").alias("j"), (F.col("id") / 2).cast("long").alias("k")
    )
    base = F.col("k") * 8 + F.when(F.pmod(F.col("j"), F.lit(2)) == 1, 4).otherwise(0) + NODE_B
    ways = wy.select(
        F.format_string("rel-w-%012d", F.col("j")).alias("doc_id"),
        F.format_string(
            '{"id": %d, "type": "way", "version": 1, "visible": true,'
            ' "ts": ' + TS + ', "changeset": 1, "uid": 1, "tags": {},'
            ' "lon": null, "lat": null,'
            ' "refs": [%d, %d, %d, %d, %d], "members": null}',
            F.col("j") + WAY_B, base, base + 1, base + 2, base + 3, base,
        ).alias("payload"),
    )
    # relations: type=multipolygon (tag key 4 value 1), outer + inner member
    rl = spark.range(n_rels).select(F.col("id").alias("k"))
    rels = rl.select(
        F.format_string("rel-r-%012d", F.col("k")).alias("doc_id"),
        F.format_string(
            '{"id": %d, "type": "relation", "version": 1, "visible": true,'
            ' "ts": ' + TS + ', "changeset": 1, "uid": 1, "tags": {"4": 1},'
            ' "lon": null, "lat": null, "refs": null, "members":'
            ' [{"type": "way", "ref": %d, "role": "outer"},'
            '  {"type": "way", "ref": %d, "role": "inner"}]}',
            F.col("k") + REL_B, F.col("k") * 2 + WAY_B, F.col("k") * 2 + 1 + WAY_B,
        ).alias("payload"),
    )
    out = None
    for df in (nodes, ways, rels):
        d = doc_of(df, F.col("payload"))
        out = d if out is None else out.unionByName(d)
    return out
