"""Winnowing fingerprint operator (operators/text.winnow_fingerprints).

Pinned against a direct Python reference of the Schleimer/Wilkerson/Aiken
algorithm for several (k, w) including non-power-of-2 windows — the
sparse-table-doubling window-min in the Spark expression must agree with
the naive per-window minimum everywhere.
"""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from oshdb_spark.operators.text import winnow_fingerprints

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaaaaaaaaaaaaaa",  # all-identical grams
    "abcdefghijk",  # exactly one window at k=8, w=4
    "spark catalyst tungsten arrow parquet shuffle broadcast skew",
    "x" * 7,  # shorter than k: dropped
    "repeated repeated repeated repeated repeated",
]


def _ref_winnow(text: str, k: int, w: int) -> list[str] | None:
    n = len(text) - k + 1
    if n < w:
        return None
    hs = [
        hashlib.md5(text[i : i + k].encode()).hexdigest()[:16]
        for i in range(n)
    ]
    mins = [min(hs[j : j + w]) for j in range(n - w + 1)]
    seen, out = set(), []
    for m in mins:
        if m not in seen:
            seen.add(m)
            out.append(m)
    return out


@pytest.mark.parametrize("k,w", [(8, 4), (8, 3), (5, 7), (4, 1), (6, 8)])
def test_winnow_matches_reference(spark, k, w):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.fingerprints
        for r in winnow_fingerprints(df, k=k, w=w).collect()
    }
    for i, t in enumerate(TEXTS):
        exp = _ref_winnow(t, k, w)
        if exp is None:
            assert i not in got, (i, k, w)
        else:
            assert got[i] == exp, (i, k, w)


def test_winnow_no_shuffle(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    plan = winnow_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow per-doc: no shuffle at any scale
