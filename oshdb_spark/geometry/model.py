"""Minimal geometry model (GeoJSON-style dicts) + WKT round-trip.

The container ships no shapely/JTS, so the engine carries geometries as plain
nested-list GeoJSON-style dicts between numpy kernels, and as WKT strings in
Spark columns (schema-stable, hashable for the DuckDB oracle; a WKB variant
would be the binary fast path on a real cluster — same model).

Shapes:
    {"type": "Point",           "coordinates": [x, y]}            ([] = empty)
    {"type": "LineString",      "coordinates": [[x, y], ...]}
    {"type": "Polygon",         "coordinates": [shell, hole, ...]}
    {"type": "MultiPolygon",    "coordinates": [polygon, ...]}
    {"type": "MultiLineString", "coordinates": [line, ...]}
    {"type": "GeometryCollection", "geometries": [geom, ...]}

Rings are closed (first == last).  Mirrors the JTS geometry taxonomy used by
the reference (oshdb-util/.../geometry/OSHDBGeometryBuilder.java) without the
JTS dependency.
"""

from __future__ import annotations

from typing import Any

import numpy as np

Geometry = dict[str, Any]


def point(x: float | None = None, y: float | None = None) -> Geometry:
    if x is None:
        return {"type": "Point", "coordinates": []}
    return {"type": "Point", "coordinates": [float(x), float(y)]}


def line_string(coords) -> Geometry:
    return {"type": "LineString", "coordinates": _aslist(coords)}


def multi_line_string(lines) -> Geometry:
    return {"type": "MultiLineString", "coordinates": [_aslist(l) for l in lines]}


def polygon(shell, holes=()) -> Geometry:
    return {
        "type": "Polygon",
        "coordinates": [_aslist(shell)] + [_aslist(h) for h in holes] if len(shell) else [],
    }


def multi_polygon(polys) -> Geometry:
    """polys: list of ring-lists [[shell, hole...], ...]"""
    return {
        "type": "MultiPolygon",
        "coordinates": [[_aslist(r) for r in rings] for rings in polys],
    }


def geometry_collection(geoms) -> Geometry:
    return {"type": "GeometryCollection", "geometries": list(geoms)}


def _aslist(coords) -> list:
    if isinstance(coords, np.ndarray):
        return coords.tolist()
    return [list(map(float, c)) for c in coords]


def is_empty(geom: Geometry | None) -> bool:
    if geom is None:
        return True
    if geom["type"] == "GeometryCollection":
        return all(is_empty(g) for g in geom["geometries"])
    return len(geom.get("coordinates") or []) == 0


def _iter_coords(geom: Geometry):
    t = geom["type"]
    c = geom.get("coordinates") or []
    if t == "Point":
        if c:
            yield c
    elif t in ("LineString", "MultiPoint"):
        yield from c
    elif t in ("Polygon", "MultiLineString"):
        for ring in c:
            yield from ring
    elif t == "MultiPolygon":
        for poly in c:
            for ring in poly:
                yield from ring
    elif t == "GeometryCollection":
        for g in geom["geometries"]:
            yield from _iter_coords(g)


def bounds(geom: Geometry) -> tuple[float, float, float, float] | None:
    """(minx, miny, maxx, maxy) or None for empty geometries."""
    pts = list(_iter_coords(geom))
    if not pts:
        return None
    arr = np.asarray(pts, dtype=np.float64)
    return (
        float(arr[:, 0].min()),
        float(arr[:, 1].min()),
        float(arr[:, 0].max()),
        float(arr[:, 1].max()),
    )


# --------------------------------------------------------------------------
# Packed binary codec (the inter-stage format)
# --------------------------------------------------------------------------
#
# Between the build -> clip -> metrics stages geometries travel as a compact
# little-endian binary column (WKB-inspired; layout below) instead of WKT
# strings, so each stage decodes straight into numpy instead of re-parsing
# text; WKT is materialized once at each view's output boundary.
#
#   byte 0        u8   gtype (1=Point 2=LineString 3=MultiLineString
#                            4=Polygon 5=MultiPolygon 6=GeometryCollection)
#   bytes 1-4     i32  top-level count (points / rings / parts / children)
#   then per type:
#     Point            count in {0,1}; 2 f64
#     LineString       count = n points; 2n f64
#     MultiLineString  count = n parts;  n i32 part lengths; coords
#     Polygon          count = n rings;  n i32 ring lengths; coords
#     MultiPolygon     count = n polys;  n i32 ring counts;
#                      total_rings i32 ring lengths; coords
#     GeometryCollection  count = n children; per child: i32 bytelen + bytes
#
# An EMPTY geometry is exactly 5 bytes (count == 0), so `length(col) <= 5`
# is the JVM-side emptiness test (operators/geometry_ops.is_empty_packed_col).

_GTYPE_CODE = {
    "Point": 1,
    "LineString": 2,
    "MultiLineString": 3,
    "Polygon": 4,
    "MultiPolygon": 5,
    "GeometryCollection": 6,
}
_GTYPE_NAME = {v: k for k, v in _GTYPE_CODE.items()}


def _i32(v: int) -> bytes:
    return int(v).to_bytes(4, "little", signed=True)


def _coords_bytes(coords) -> bytes:
    return np.asarray(coords, dtype="<f8").tobytes()


def pack_geometry(geom: Geometry | None) -> bytes:
    """Encode a geometry dict into the packed binary format above."""
    if geom is None:
        return b"\x06\x00\x00\x00\x00"  # GEOMETRYCOLLECTION EMPTY
    t = geom["type"]
    head = bytes([_GTYPE_CODE[t]])
    if t == "GeometryCollection":
        kids = [pack_geometry(g) for g in geom.get("geometries") or []]
        parts = [head, _i32(len(kids))]
        for k in kids:
            parts.append(_i32(len(k)))
            parts.append(k)
        return b"".join(parts)
    c = geom.get("coordinates") or []
    if t == "Point":
        if not len(c):
            return head + _i32(0)
        return head + _i32(1) + _coords_bytes([c])
    if t == "LineString":
        return head + _i32(len(c)) + _coords_bytes(c)
    if t in ("MultiLineString", "Polygon"):
        parts = [head, _i32(len(c))]
        parts.extend(_i32(len(r)) for r in c)
        parts.extend(_coords_bytes(r) for r in c)
        return b"".join(parts)
    if t == "MultiPolygon":
        parts = [head, _i32(len(c))]
        parts.extend(_i32(len(rings)) for rings in c)
        for rings in c:
            parts.extend(_i32(len(r)) for r in rings)
        for rings in c:
            parts.extend(_coords_bytes(r) for r in rings)
        return b"".join(parts)
    raise ValueError(f"unknown geometry type {t}")


def unpack_geometry(b) -> Geometry:
    """Decode packed bytes back into the geometry-dict model.

    Coordinates decode via np.frombuffer (zero text parsing); f64 bytes
    round-trip bit-exactly, so to_wkt(unpack(pack(g))) == to_wkt(g)."""
    b = bytes(b)
    t = _GTYPE_NAME[b[0]]
    n = int.from_bytes(b[1:5], "little", signed=True)
    off = 5
    if t == "GeometryCollection":
        kids = []
        for _ in range(n):
            ln = int.from_bytes(b[off : off + 4], "little", signed=True)
            off += 4
            kids.append(unpack_geometry(b[off : off + ln]))
            off += ln
        return {"type": t, "geometries": kids}
    if t == "Point":
        if n == 0:
            return {"type": t, "coordinates": []}
        xy = np.frombuffer(b, "<f8", 2, off)
        return {"type": t, "coordinates": [float(xy[0]), float(xy[1])]}
    if t == "LineString":
        arr = np.frombuffer(b, "<f8", 2 * n, off).reshape(n, 2)
        return {"type": t, "coordinates": arr.tolist()}
    if t in ("MultiLineString", "Polygon"):
        lens = np.frombuffer(b, "<i4", n, off)
        off += 4 * n
        rings = []
        for ln in lens:
            m = int(ln)
            rings.append(np.frombuffer(b, "<f8", 2 * m, off).reshape(m, 2).tolist())
            off += 16 * m
        return {"type": t, "coordinates": rings}
    if t == "MultiPolygon":
        rc = np.frombuffer(b, "<i4", n, off)
        off += 4 * n
        total = int(rc.sum())
        rl = np.frombuffer(b, "<i4", total, off)
        off += 4 * total
        polys = []
        k = 0
        for m in rc:
            rings = []
            for _ in range(int(m)):
                ln = int(rl[k])
                k += 1
                rings.append(
                    np.frombuffer(b, "<f8", 2 * ln, off).reshape(ln, 2).tolist()
                )
                off += 16 * ln
            polys.append(rings)
        return {"type": t, "coordinates": polys}
    raise ValueError(f"unknown gtype code {b[0]}")


# --------------------------------------------------------------------------
# WKT
# --------------------------------------------------------------------------


def _fmt_num(v: float) -> str:
    # repr gives shortest round-trip float; strip trailing '.0' for ints
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    return repr(float(v))


def _fmt_coords(coords) -> str:
    return ", ".join(f"{_fmt_num(x)} {_fmt_num(y)}" for x, y in coords)


def to_wkt(geom: Geometry | None) -> str:
    if geom is None:
        return "GEOMETRYCOLLECTION EMPTY"
    t = geom["type"]
    if is_empty(geom):
        return f"{t.upper()} EMPTY" if t != "GeometryCollection" else "GEOMETRYCOLLECTION EMPTY"
    c = geom.get("coordinates")
    if t == "Point":
        return f"POINT ({_fmt_coords([c])})"
    if t == "LineString":
        return f"LINESTRING ({_fmt_coords(c)})"
    if t == "MultiLineString":
        inner = ", ".join(f"({_fmt_coords(l)})" for l in c)
        return f"MULTILINESTRING ({inner})"
    if t == "Polygon":
        inner = ", ".join(f"({_fmt_coords(r)})" for r in c)
        return f"POLYGON ({inner})"
    if t == "MultiPolygon":
        inner = ", ".join(
            "(" + ", ".join(f"({_fmt_coords(r)})" for r in rings) + ")" for rings in c
        )
        return f"MULTIPOLYGON ({inner})"
    if t == "GeometryCollection":
        inner = ", ".join(to_wkt(g) for g in geom["geometries"])
        return f"GEOMETRYCOLLECTION ({inner})"
    raise ValueError(f"unknown geometry type {t}")


def from_wkt(wkt: str) -> Geometry:
    """Parse the WKT subset emitted by to_wkt (sufficient for round-trip)."""
    s = wkt.strip()
    head, _, rest = s.partition("(")
    t = head.strip().upper()
    if s.upper().endswith("EMPTY"):
        name = {
            "POINT": "Point",
            "LINESTRING": "LineString",
            "POLYGON": "Polygon",
            "MULTIPOLYGON": "MultiPolygon",
            "MULTILINESTRING": "MultiLineString",
            "GEOMETRYCOLLECTION": "GeometryCollection",
        }[t.replace(" EMPTY", "").strip()]
        if name == "GeometryCollection":
            return geometry_collection([])
        return {"type": name, "coordinates": []}
    body = s[s.index("(") + 1 : s.rindex(")")]
    if t == "POINT":
        x, y = body.split()
        return point(float(x), float(y))
    if t == "LINESTRING":
        return line_string(_parse_coords(body))
    if t == "MULTILINESTRING":
        return multi_line_string(_parse_ring_list(body))
    if t == "POLYGON":
        rings = _parse_ring_list(body)
        return polygon(rings[0], rings[1:])
    if t == "MULTIPOLYGON":
        polys = []
        for part in _split_top(body):
            inner = part.strip()[1:-1]
            polys.append(_parse_ring_list(inner))
        return {"type": "MultiPolygon", "coordinates": polys}
    if t == "GEOMETRYCOLLECTION":
        return geometry_collection(from_wkt(p.strip()) for p in _split_top(body))
    raise ValueError(f"cannot parse WKT: {wkt[:60]}")


def _parse_coords(body: str) -> list[list[float]]:
    out = []
    for pair in body.split(","):
        x, y = pair.split()
        out.append([float(x), float(y)])
    return out


def _parse_ring_list(body: str) -> list[list[list[float]]]:
    return [_parse_coords(part.strip()[1:-1]) for part in _split_top(body)]


def _split_top(body: str) -> list[str]:
    """Split on commas at parenthesis depth 0."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(body[start:i])
            start = i + 1
    parts.append(body[start:])
    return parts
