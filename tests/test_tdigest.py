"""t-digest sketch tests: accuracy, mergeability, serialization, and the
distributed partial+final plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from oshdb_spark.operators.tdigest import TDigest, tdigest_quantiles


def test_accuracy_uniform():
    rs = np.random.RandomState(7)
    x = rs.uniform(0, 1000, 200_000)
    d = TDigest()
    d.add(x)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = d.quantile(q)
        exact = np.quantile(x, q)
        # rank error: where does the estimate fall in the true distribution
        rank = (x <= est).mean()
        assert abs(rank - q) < 0.005, (q, est, exact, rank)


def test_accuracy_skewed():
    rs = np.random.RandomState(11)
    x = rs.lognormal(0, 2, 100_000)
    d = TDigest()
    d.add(x)
    for q in (0.5, 0.9, 0.99):
        rank = (x <= d.quantile(q)).mean()
        assert abs(rank - q) < 0.01


def test_merge_matches_whole():
    rs = np.random.RandomState(3)
    x = rs.normal(0, 1, 90_000)
    whole = TDigest()
    whole.add(x)
    merged = TDigest()
    for part in np.array_split(x, 9):
        p = TDigest()
        p.add(part)
        merged.merge(p)
    for q in (0.1, 0.5, 0.9):
        assert abs(merged.quantile(q) - whole.quantile(q)) < 0.05


def test_roundtrip_bytes():
    d = TDigest()
    d.add(np.arange(10_000, dtype=float))
    d2 = TDigest.from_bytes(d.to_bytes())
    assert d2.quantile(0.5) == d.quantile(0.5)


def test_small_inputs():
    d = TDigest()
    assert np.isnan(d.quantile(0.5))
    d.add(np.array([42.0]))
    assert d.quantile(0.0) == 42.0
    assert d.quantile(1.0) == 42.0


def test_spark_grouped_quantiles(spark):
    df = spark.range(60_000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    res = tdigest_quantiles(df, "v", [0.25, 0.5, 0.75], group_cols=["g"])
    rows = {r["g"]: r for r in res.collect()}
    assert set(rows) == {0, 1, 2}
    for g, r in rows.items():
        # v is uniform over 0..999 within each group
        assert r["q50_v"] == pytest.approx(499.5, abs=15)
        assert r["q25_v"] == pytest.approx(249.75, abs=15)
        assert r["q75_v"] == pytest.approx(749.25, abs=15)


def test_spark_global_quantile(spark):
    df = spark.range(100_000).select((F.col("id") % 77).cast("double").alias("v"))
    res = tdigest_quantiles(df, "v", [0.5]).collect()
    assert len(res) == 1
    assert res[0]["q50_v"] == pytest.approx(38.0, abs=2)
