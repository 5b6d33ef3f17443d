"""Packed binary geometry codec round-trip (geometry/model.py).

The codec is the inter-stage format between build -> clip -> metrics
(operators/geometry_ops.GEOM_BBOX_SCHEMA); these tests pin it directly:
pack o unpack is the identity on the geometry-dict model (f64 bytes
round-trip bit-exactly, so WKT equality is exact, not approximate), and
the 5-byte EMPTY encoding matches the JVM-side emptiness test used by
is_empty_packed_col (length <= 5).
"""

from __future__ import annotations

import numpy as np

from oshdb_spark.geometry.model import (
    is_empty,
    pack_geometry,
    to_wkt,
    unpack_geometry,
)

RNG = np.random.default_rng(20260817)


def _coords(n):
    return np.column_stack(
        (RNG.uniform(-180, 180, n), RNG.uniform(-90, 90, n))
    ).tolist()


def _ring(n):
    c = _coords(n)
    c.append(list(c[0]))
    return c


def _random_geom(depth=0):
    t = RNG.choice(
        ["Point", "LineString", "MultiLineString", "Polygon", "MultiPolygon"]
        + (["GeometryCollection"] if depth < 2 else [])
    )
    if t == "Point":
        return {"type": t, "coordinates": _coords(1)[0]}
    if t == "LineString":
        return {"type": t, "coordinates": _coords(int(RNG.integers(2, 40)))}
    if t == "MultiLineString":
        return {
            "type": t,
            "coordinates": [
                _coords(int(RNG.integers(2, 20)))
                for _ in range(int(RNG.integers(1, 5)))
            ],
        }
    if t == "Polygon":
        return {
            "type": t,
            "coordinates": [
                _ring(int(RNG.integers(3, 20)))
                for _ in range(int(RNG.integers(1, 4)))
            ],
        }
    if t == "MultiPolygon":
        return {
            "type": t,
            "coordinates": [
                [_ring(int(RNG.integers(3, 12)))
                 for _ in range(int(RNG.integers(1, 3)))]
                for _ in range(int(RNG.integers(1, 4)))
            ],
        }
    return {
        "type": t,
        "geometries": [
            _random_geom(depth + 1) for _ in range(int(RNG.integers(0, 4)))
        ],
    }


def test_roundtrip_fuzz_bit_exact():
    for _ in range(500):
        g = _random_geom()
        rt = unpack_geometry(pack_geometry(g))
        assert to_wkt(rt) == to_wkt(g)
        assert rt["type"] == g["type"]


def test_empty_encodings_are_five_bytes():
    empties = [
        {"type": "Point", "coordinates": []},
        {"type": "LineString", "coordinates": []},
        {"type": "MultiLineString", "coordinates": []},
        {"type": "Polygon", "coordinates": []},
        {"type": "MultiPolygon", "coordinates": []},
        {"type": "GeometryCollection", "geometries": []},
    ]
    for g in empties:
        b = pack_geometry(g)
        assert len(b) == 5, g["type"]
        rt = unpack_geometry(b)
        assert is_empty(rt)
        assert to_wkt(rt) == to_wkt(g)


def test_none_packs_to_empty_collection():
    b = pack_geometry(None)
    assert len(b) == 5
    assert to_wkt(unpack_geometry(b)) == "GEOMETRYCOLLECTION EMPTY"


def test_nonempty_always_longer_than_five_bytes():
    # the JVM emptiness test is length(col) <= 5: any geometry with at
    # least one coordinate must therefore pack to > 5 bytes
    for _ in range(200):
        g = _random_geom()
        b = pack_geometry(g)
        assert (len(b) <= 5) == is_empty(g) or g["type"] == "GeometryCollection"
        if g["type"] == "GeometryCollection":
            # a collection of empties is empty but packs longer than 5;
            # the operators only apply the length test to way/relation
            # build output, which never nests empty collections
            if len(b) <= 5:
                assert is_empty(g)


def test_coordinates_bit_exact():
    g = {
        "type": "LineString",
        "coordinates": [[1e-17, -1e300], [np.pi, -np.e], [180.0, -90.0]],
    }
    rt = unpack_geometry(pack_geometry(g))
    assert rt["coordinates"] == g["coordinates"]
