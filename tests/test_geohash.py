"""Geohash column: pure-Catalyst Morton/base-32 grid (operators/tiling.py).

Checked two independent ways: classic published vectors (the Wikipedia
"ezs42" example and friends) and a from-first-principles bisection
encoder implemented HERE (the textbook alternating-interval algorithm —
a different formulation from the engine's bit-spread interleave).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oshdb_spark.operators.tiling import geohash_col

B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def ref_geohash(lon: float, lat: float, precision: int) -> str:
    """Textbook bisection encoder (no bit tricks)."""
    lon_lo, lon_hi = -180.0, 180.0
    lat_lo, lat_hi = -90.0, 90.0
    out, bits, ch, even = [], 0, 0, True
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = ch * 2 + 1
                lon_lo = mid
            else:
                ch *= 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = ch * 2 + 1
                lat_lo = mid
            else:
                ch *= 2
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(B32[ch])
            bits, ch = 0, 0
    return "".join(out)


CLASSIC = [
    # (lon, lat, precision, geohash) — published examples
    (-5.603, 42.605, 5, "ezs42"),
    (10.40744, 57.64911, 8, "u4pruydq"),
    (-0.1278, 51.5074, 7, "gcpvj0d"),   # London (gcpvj = Westminster)
]


@pytest.mark.parametrize("lon,lat,p,want", CLASSIC)
def test_reference_impl_matches_published(lon, lat, p, want):
    assert ref_geohash(lon, lat, p) == want


def _fp(v: float) -> int:
    return int(round(v * 1e7))


def test_geohash_col_vs_reference(spark):
    pts = [(-5.603, 42.605), (10.40744, 57.64911), (-0.1278, 51.5074),
           (0.0, 0.0), (-180.0, -90.0), (179.9999999, 89.9999999),
           (180.0, 90.0), (-122.4194, 37.7749), (151.2093, -33.8688),
           (0.0000001, -0.0000001)]
    rows = [(i, _fp(lon), _fp(lat)) for i, (lon, lat) in enumerate(pts)]
    df = spark.createDataFrame(rows, "i int, lon_fp long, lat_fp long")
    for p in (1, 5, 8, 11, 12):
        got = {
            r["i"]: r["gh"]
            for r in df.select(
                "i", geohash_col(F.col("lon_fp"), F.col("lat_fp"), p).alias("gh")
            ).collect()
        }
        for i, (lon, lat) in enumerate(pts):
            # the engine clamps the right edge into the last cell, the
            # bisection encoder does the same by its >= mid rule
            want = ref_geohash(min(lon, 179.99999999), min(lat, 89.99999999), p)
            assert got[i] == want, (p, pts[i], got[i], want)


def test_geohash_plan_is_jvm_only(spark):
    df = spark.range(4).select(
        (F.col("id") * 1000).alias("lon_fp"), (F.col("id") * 500).alias("lat_fp")
    )
    plan = df.select(
        geohash_col(F.col("lon_fp"), F.col("lat_fp"), 8).alias("gh")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_geohash_precision_validation(spark):
    with pytest.raises(ValueError):
        geohash_col(F.lit(0), F.lit(0), 0)
    with pytest.raises(ValueError):
        geohash_col(F.lit(0), F.lit(0), 13)
