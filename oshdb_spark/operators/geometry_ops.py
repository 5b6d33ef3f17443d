"""Arrow-batched geometry construction / clipping / measurement UDFs.

These are the engine's only Python-side kernels on the hot path; each call
processes a whole Arrow record batch with the numpy kernels from
oshdb_spark.geometry (no per-row Python beyond list plumbing for the
variable-length ring structures).

Semantics: OSHDBGeometryBuilder (see geometry/builder.py citations) for
construction, CellIterator.constructClippedGeometry (CellIterator.java:417-459)
for clipping short-circuits, Geo.java formulas for measures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from oshdb_spark.geometry import (
    area_of,
    clip_to_bbox,
    from_wkt,
    is_empty,
    length_of,
    to_wkt,
)
from oshdb_spark.geometry.builder import (
    build_relation_geometry,
    build_way_geometry,
)
from oshdb_spark.geometry.model import bounds, point
from oshdb_spark.geometry.pip import bbox_in_polygon, bbox_outside_polygon, points_in_polygon
from oshdb_spark.geometry.taginterpreter import (
    ROLE_EMPTY,
    ROLE_INNER,
    ROLE_OUTER,
    TagInterpreter,
    default_tag_interpreter,
)

GEOM_RESULT_SCHEMA = "wkt string, area double, length double"
# geometry build results carry the geometry bbox so downstream clipping can
# classify inside/outside JVM-side and invoke Python only on border rows
GEOM_BBOX_SCHEMA = (
    "wkt string, area double, length double,"
    " minx double, miny double, maxx double, maxy double"
)


def _is_empty_geom(g) -> bool:
    return is_empty(g)


def _measure(geom) -> tuple[str, float, float]:
    return to_wkt(geom), area_of(geom), length_of(geom)


def _measure_bbox(geom):
    w, a, l = _measure(geom)
    b = bounds(geom)
    if b is None:
        return w, a, l, None, None, None, None
    return w, a, l, b[0], b[1], b[2], b[3]


def node_geometry_cols(lon_col, lat_col, visible_col):
    """Node geometry as pure Columns: POINT WKT (no UDF needed)."""
    lon_deg = lon_col.cast("double") / 1e7
    lat_deg = lat_col.cast("double") / 1e7
    wkt = F.concat(
        F.lit("POINT ("),
        lon_deg.cast("string"),
        F.lit(" "),
        lat_deg.cast("string"),
        F.lit(")"),
    )
    return F.when(visible_col, wkt).otherwise(F.lit("POINT EMPTY"))


def way_geometry_udf(interpreter: TagInterpreter | None = None):
    """(visible, tags, refs, line) -> struct(wkt, area, length).

    `line` = array<struct<nid long, lon double, lat double>> — the way's
    member nodes resolved at the snapshot timestamp, in ref order, visible
    only (missing members already dropped by the left join upstream).
    """
    from oshdb_spark.session import ensure_package_on_workers
    ensure_package_on_workers()
    ti = interpreter or default_tag_interpreter()

    @F.pandas_udf(GEOM_BBOX_SCHEMA)
    def _udf(
        visible: pd.Series, tags: pd.Series, refs: pd.Series, line: pd.Series
    ) -> pd.DataFrame:
        rows = []
        for vis, tg, rf, ln in zip(visible, tags, refs, line):
            tag_map = {int(k): int(v) for k, v in (tg or {}).items()}
            rf = list(rf) if rf is not None and len(rf) else []
            nodes = (
                [(int(p["nid"]), float(p["lon"]), float(p["lat"])) for p in ln]
                if ln is not None and len(ln)
                else []
            )
            is_area = ti.way_is_area(rf, tag_map)
            g = build_way_geometry(bool(vis), is_area, nodes)
            rows.append(_measure_bbox(g))
        return pd.DataFrame(
            rows, columns=["wkt", "area", "length", "minx", "miny", "maxx", "maxy"]
        )

    return _udf


def relation_geometry_udf(interpreter: TagInterpreter | None = None):
    """(visible, tags, members) -> struct(wkt, area, length).

    `members` = array<struct<role string, mtype string,
                             line array<struct<nid long, lon double, lat double>>>>
    — each member way's resolved node line at the timestamp (null line for
    missing/invisible members), in member order.
    """
    from oshdb_spark.session import ensure_package_on_workers
    ensure_package_on_workers()
    ti = interpreter or default_tag_interpreter()
    role_code = {"outer": ROLE_OUTER, "inner": ROLE_INNER, "": ROLE_EMPTY}

    @F.pandas_udf(GEOM_BBOX_SCHEMA)
    def _udf(
        visible: pd.Series, tags: pd.Series, members: pd.Series
    ) -> pd.DataFrame:
        rows = []
        for vis, tg, mems in zip(visible, tags, members):
            tag_map = {int(k): int(v) for k, v in (tg or {}).items()}
            member_lines = []
            for m in (mems if mems is not None and len(mems) else []):
                # unknown roles (label/platform/...) get their own code —
                # they are NOT outer members (only outer/"" are,
                # BaseTagInterpreter role ids); collapsing them to the
                # empty role would wrongly promote them to ring material
                role = role_code.get(m["role"], -1)
                mtype = m["mtype"]
                ln = m["line"]
                nodes = (
                    [(int(p["nid"]), float(p["lon"]), float(p["lat"])) for p in ln]
                    if ln is not None and len(ln)
                    else None
                )
                if ti.is_outer_member(mtype, role):
                    kind = "outer"
                elif ti.is_inner_member(mtype, role):
                    kind = "inner"
                else:
                    kind = "other"
                geom = None
                if mtype == "node" and nodes:
                    geom = point(nodes[0][1], nodes[0][2])
                elif mtype == "relation":
                    # nested relation member: the child's prebuilt geometry
                    # (one nesting level per resolution pass,
                    # OSHDBGeometryBuilderInternal.java:305-358)
                    mw = m["m_wkt"] if "m_wkt" in m else None
                    if mw:
                        child = from_wkt(mw)
                        if not _is_empty_geom(child):
                            geom = child
                member_lines.append({"kind": kind, "nodes": nodes, "geom": geom})
            g = build_relation_geometry(
                bool(vis), ti.relation_is_area(tag_map), member_lines
            )
            rows.append(_measure_bbox(g))
        return pd.DataFrame(
            rows, columns=["wkt", "area", "length", "minx", "miny", "maxx", "maxy"]
        )

    return _udf


CLIP_RESULT_SCHEMA = "clipped_wkt string, clipped_area double, clipped_length double"


def clip_udf(bbox_deg: tuple[float, float, float, float]):
    """wkt -> struct(clipped_wkt, clipped_area, clipped_length).

    Applies the reference's short-circuits (CellIterator.java:417-459):
    geometry bbox fully inside the clip box -> identity (no clip work);
    fully outside -> typed empty.
    """
    from oshdb_spark.session import ensure_package_on_workers
    ensure_package_on_workers()
    minx, miny, maxx, maxy = bbox_deg

    @F.pandas_udf(CLIP_RESULT_SCHEMA)
    def _udf(wkt: pd.Series) -> pd.DataFrame:
        out_w, out_a, out_l = [], [], []
        for w in wkt:
            if w is None:
                # null passthrough: callers gate the UDF with
                # F.when(border, wkt) so non-border rows ride through the
                # Arrow batch as nulls at near-zero kernel cost
                out_w.append(None)
                out_a.append(None)
                out_l.append(None)
                continue
            g = from_wkt(w)
            b = bounds(g)
            if b is None:
                clipped = g
            elif b[0] >= minx and b[1] >= miny and b[2] <= maxx and b[3] <= maxy:
                clipped = g  # fully inside: identity
            elif b[2] < minx or b[0] > maxx or b[3] < miny or b[1] > maxy:
                clipped = {"type": g["type"], "coordinates": []}  # fully outside
            else:
                clipped = clip_to_bbox(g, bbox_deg)
            cw, ca, cl = _measure(clipped)
            out_w.append(cw)
            out_a.append(ca)
            out_l.append(cl)
        return pd.DataFrame(
            {"clipped_wkt": out_w, "clipped_area": out_a, "clipped_length": out_l}
        )

    return _udf


def clip_polygon_udf(polygon_geom: dict):
    """wkt -> struct(clipped_wkt, clipped_area, clipped_length) against an
    ARBITRARY (Multi)Polygon AOI — non-convex, holes, multi parts.

    Convex AOIs take the direct Sutherland-Hodgman/Cyrus-Beck path; the
    general case goes through the driver-side triangle decomposition
    (geometry/polyclip.PreparedPolygon — the FastPolygonOperations analog,
    fip/FastPolygonOperations.java:26-60).  Both apply the bbox
    inside/outside short-circuits before any clip work
    (CellIterator.java:417-459).
    """
    from oshdb_spark.session import ensure_package_on_workers

    ensure_package_on_workers()
    from oshdb_spark.geometry.clip import clip_to_convex_polygon, is_convex_polygon
    from oshdb_spark.geometry.model import bounds as _bounds
    from oshdb_spark.geometry.polyclip import PreparedPolygon, clip_to_polygon

    pb = _bounds(polygon_geom)
    convex = is_convex_polygon(polygon_geom)
    prepared = None if convex else PreparedPolygon(polygon_geom)

    @F.pandas_udf(CLIP_RESULT_SCHEMA)
    def _udf(wkt: pd.Series) -> pd.DataFrame:
        out_w, out_a, out_l = [], [], []
        for w in wkt:
            g = from_wkt(w)
            b = bounds(g)
            if b is None or pb is None or b[2] < pb[0] or b[0] > pb[2] or b[3] < pb[1] or b[1] > pb[3]:
                clipped = {"type": g["type"], "coordinates": []}
            elif convex:
                clipped = clip_to_convex_polygon(g, polygon_geom)
            else:
                clipped = clip_to_polygon(g, prepared)
            cw, ca, cl = _measure(clipped)
            out_w.append(cw)
            out_a.append(ca)
            out_l.append(cl)
        return pd.DataFrame(
            {"clipped_wkt": out_w, "clipped_area": out_a, "clipped_length": out_l}
        )

    return _udf


def intersects_polygon_udf(polygon_geom: dict):
    """wkt -> boolean: geometry intersects the (broadcast) query polygon.

    EXACT (geometry/polyclip.geometry_intersects_polygon): bbox in/out
    short-circuits, then vertex-in-polygon, polygon-vertex-in-geometry,
    and segment x ring-edge crossing — a way crossing the polygon with
    every vertex outside is now caught (the round-1 conservative test
    missed it).  Parity: FastInPolygon + PreparedGeometry.intersects
    (GeometrySplitter.java:120-137).
    """
    from oshdb_spark.session import ensure_package_on_workers
    ensure_package_on_workers()
    from oshdb_spark.geometry.polyclip import geometry_intersects_polygon

    @F.pandas_udf("boolean")
    def _udf(wkt: pd.Series) -> pd.Series:
        return pd.Series(
            [geometry_intersects_polygon(from_wkt(w), polygon_geom) for w in wkt]
        )

    return _udf


def old_style_flag_udf(interpreter: TagInterpreter | None = None):
    """(tags, members) -> boolean: relation is an OLD-STYLE multipolygon
    (one outer way, no interesting relation tags —
    BaseTagInterpreter.isOldStyleMultipolygon, BaseTagInterpreter.java:108-134)."""
    from oshdb_spark.session import ensure_package_on_workers

    ensure_package_on_workers()
    from oshdb_spark.geometry.taginterpreter import _old_style_relation

    ti = interpreter or default_tag_interpreter()

    @F.pandas_udf("boolean")
    def _udf(tags: pd.Series, members: pd.Series) -> pd.Series:
        out = []
        for tg, mems in zip(tags, members):
            tag_map = {int(k): int(v) for k, v in (tg or {}).items()}
            pairs = [
                (m["mtype"], m["role"])
                for m in (mems if mems is not None and len(mems) else [])
            ]
            out.append(_old_style_relation(ti, pairs, tag_map))
        return pd.Series(out)

    return _udf


def holes_only_udf():
    """wkt -> struct(wkt, area, length): the MultiPolygon of the
    geometry's INTERIOR rings only — the reference's old-style
    multipolygon fix-up geometry (CellIterator.java:358-380: 'return only
    the inner holes ... used to fix the results obtained from
    calculating the geometry on the object's outer way')."""
    from oshdb_spark.session import ensure_package_on_workers

    ensure_package_on_workers()

    @F.pandas_udf(GEOM_RESULT_SCHEMA)
    def _udf(wkt: pd.Series) -> pd.DataFrame:
        wkts, areas, lengths = [], [], []
        for w in wkt:
            g = from_wkt(w)
            holes = []
            if g["type"] == "Polygon":
                holes = [[r] for r in g["coordinates"][1:]]
            elif g["type"] == "MultiPolygon":
                holes = [[r] for rings in g["coordinates"] for r in rings[1:]]
            mp = {"type": "MultiPolygon", "coordinates": holes}
            ww, a, l = _measure(mp)
            wkts.append(ww)
            areas.append(a)
            lengths.append(l)
        return pd.DataFrame({"wkt": wkts, "area": areas, "length": lengths})

    return _udf


METRICS_RESULT_SCHEMA = (
    "g_vertices int, g_outers int, g_inners int,"
    " g_roundness double, g_squareness double"
)


def geometry_metrics_udf():
    """wkt -> struct(g_vertices, g_outers, g_inners, g_roundness,
    g_squareness) — the GeometryFilter metric columns
    (oshdb-filter/.../GeometryFilter.java:8-34 subclasses Vertices/
    OuterRings/InnerRings/Roundness/Squareness; formulas Geo.java:327-507).
    Attached lazily by the views only when a compiled filter references one
    of these metrics (dsl.metrics_needed)."""
    from oshdb_spark.session import ensure_package_on_workers

    ensure_package_on_workers()
    from oshdb_spark.geometry.geo import roundness, squareness
    from oshdb_spark.geometry.model import _iter_coords

    @F.pandas_udf(METRICS_RESULT_SCHEMA)
    def _udf(wkt: pd.Series) -> pd.DataFrame:
        nv, no, ni, rd, sq = [], [], [], [], []
        for w in wkt:
            g = from_wkt(w)
            t = g["type"]
            nv.append(sum(1 for _ in _iter_coords(g)))
            # non-polygonal geometries get the reference's -1 sentinel so
            # outers:0 / inners:0 do NOT match points/lines
            # (GeometryFilterOuterRings.java / GeometryFilterInnerRings.java)
            if t == "Polygon" and g["coordinates"]:
                no.append(1)
                ni.append(len(g["coordinates"]) - 1)
            elif t == "MultiPolygon":
                no.append(len(g["coordinates"]))
                ni.append(sum(len(rings) - 1 for rings in g["coordinates"]))
            else:
                no.append(-1)
                ni.append(-1)
            rd.append(roundness(g))
            sq.append(squareness(g))
        return pd.DataFrame(
            {
                "g_vertices": pd.array(nv, dtype="int32"),
                "g_outers": pd.array(no, dtype="int32"),
                "g_inners": pd.array(ni, dtype="int32"),
                "g_roundness": rd,
                "g_squareness": sq,
            }
        )

    return _udf


def segment_clip_parts_udf(polygon_geom: dict):
    """(ax, ay, bx, by degree doubles) -> int: number of parts the segment
    splits into when clipped to the polygon (0 = fully outside).

    Thin Arrow wrapper over the fully vectorized batch kernel
    (geometry/polyclip.segment_clip_part_counts) — one numpy broadcast per
    batch, no per-row Python; the scale path for line x polygon clipping
    when geometries are plain 2-point segments.
    """
    from oshdb_spark.session import ensure_package_on_workers

    ensure_package_on_workers()
    from oshdb_spark.geometry.polyclip import (
        PreparedPolygon,
        segment_clip_part_counts,
    )

    prepared = PreparedPolygon(polygon_geom)

    @F.pandas_udf("int")
    def _udf(
        ax: pd.Series, ay: pd.Series, bx: pd.Series, by: pd.Series
    ) -> pd.Series:
        out = segment_clip_part_counts(
            ax.to_numpy(np.float64),
            ay.to_numpy(np.float64),
            bx.to_numpy(np.float64),
            by.to_numpy(np.float64),
            prepared,
        )
        return pd.Series(out.astype("int32"))

    return _udf


def is_empty_wkt_col(wkt_col):
    """Cheap JVM-side empty-geometry test on WKT strings."""
    return wkt_col.endswith(" EMPTY") | wkt_col.endswith("()")
