"""Spark-vs-DuckDB oracle parity for every driver-contract query.

Mimics the driver's check: run the Spark query and the oracle SQL on the
same parquet tables, compare row count + order-insensitive values with
column names sorted. Values are compared EXACTLY (the derivations are
designed to be IEEE-identical across engines).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oshdb_spark import driver_queries as dq

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def _canon(rows, colnames):
    """Order-insensitive canonical form: columns sorted by name, rows sorted
    by stringified values."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(repr(round(v, 9)))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [colnames[i] for i in order], out


@pytest.mark.parametrize("name", sorted(dq.REGISTRY))
def test_oracle_parity(spark, duck, name):
    spec = dq.REGISTRY[name]
    sdf = spec.spark_fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if spec.oracle is None:
        assert len(srows) >= 0
        return
    ores = duck.execute(spec.oracle)
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()
    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in ocols), (
        f"{name}: column mismatch {scols} vs {ocols}"
    )
    s_cols, s_canon = _canon(srows, [c.lower() for c in scols])
    o_cols, o_canon = _canon(
        [tuple(r) for r in orows], [c.lower() for c in ocols]
    )
    assert len(s_canon) == len(o_canon), (
        f"{name}: row count {len(s_canon)} vs oracle {len(o_canon)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_canon, o_canon) if a != b
    ][:5]
    assert s_canon == o_canon, f"{name}: first diffs {mismatches}"
