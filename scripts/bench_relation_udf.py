"""Micro-benchmark: relation-geometry UDF member unpacking.

Times the CURRENT vectorized-unpack relation kernel
(operators/geometry_ops.relation_geometry_udf — JVM-side F.transform field
decomposition + C-speed tolist/zip) against the round-3 LEGACY shape (the
whole member struct array shipped through Arrow, per-node Python dict
access `[(int(p["nid"]), float(p["lon"]), float(p["lat"])) for p in ln]`),
on a synthetic relation-heavy input: N multipolygon relations, each with
M member ways of K nodes (plus one inner ring way), deterministic coords.

Run: python scripts/bench_relation_udf.py [N_RELATIONS]
Prints one JSON line {"legacy_sec":..,"vectorized_sec":..,"speedup":..}.
"""

from __future__ import annotations

import json
import math
import sys
import time

import pandas as pd
from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, "/root/repo")

from oshdb_spark.operators.geometry_ops import (  # noqa: E402
    GEOM_BBOX_SCHEMA,
    _measure_bbox,
    relation_geometry_udf,
)
from oshdb_spark.geometry.builder import build_relation_geometry  # noqa: E402
from oshdb_spark.geometry.model import point  # noqa: E402
from oshdb_spark.geometry.taginterpreter import (  # noqa: E402
    ROLE_EMPTY,
    ROLE_INNER,
    ROLE_OUTER,
    default_tag_interpreter,
)


def legacy_relation_geometry_udf(interpreter=None):
    """The round-3 kernel, verbatim shape: struct-array input, per-node
    Python unpacking (kept here only as the micro-benchmark baseline)."""
    ti = interpreter or default_tag_interpreter()
    role_code = {"outer": ROLE_OUTER, "inner": ROLE_INNER, "": ROLE_EMPTY}

    @F.pandas_udf(GEOM_BBOX_SCHEMA)
    def _udf(visible: pd.Series, tags: pd.Series, members: pd.Series) -> pd.DataFrame:
        rows = []
        for vis, tg, mems in zip(visible, tags, members):
            tag_map = {int(k): int(v) for k, v in (tg or {}).items()}
            member_lines = []
            for m in (mems if mems is not None and len(mems) else []):
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
                member_lines.append({"kind": kind, "nodes": nodes, "geom": geom})
            g = build_relation_geometry(
                bool(vis), ti.relation_is_area(tag_map), member_lines
            )
            rows.append(_measure_bbox(g))
        return pd.DataFrame(
            rows, columns=["geom", "area", "length", "minx", "miny", "maxx", "maxy"]
        )

    return _udf


def make_input(spark, n_rel: int, m_ways: int = 8, k_nodes: int = 60):
    """n_rel relations; each: m_ways outer segment ways of k_nodes forming
    one big ring + 1 inner square — ragged, ring-assembly-exercising.
    Generated Spark-native (JVM expressions) so 10^4-10^6 relations
    synthesize distributed without a driver-side row list."""
    total = m_ways * (k_nodes - 1)
    line_expr = (
        f"transform(sequence(0, {k_nodes - 1}), j -> named_struct("
        f"  'nid', id * 1000000 + (w * {k_nodes - 1} + j) % {total},"
        f"  'lon', 10.0 + (id % 100) * 0.01"
        f"     + 0.005 * cos(2 * pi() * (((w * {k_nodes - 1} + j) % {total}) / {total})),"
        f"  'lat', 45.0 + CAST(id / 100 AS INT) * 0.01"
        f"     + 0.005 * sin(2 * pi() * (((w * {k_nodes - 1} + j) % {total}) / {total}))))"
    )
    inner_expr = (
        "array(named_struct('role', 'inner', 'mtype', 'way', 'line', array("
        " named_struct('nid', id * 1000000 + 900000,"
        "   'lon', 10.001 + (id % 100) * 0.01,"
        "   'lat', 45.0005 + CAST(id / 100 AS INT) * 0.01),"
        " named_struct('nid', id * 1000000 + 900001,"
        "   'lon', 10.002 + (id % 100) * 0.01,"
        "   'lat', 45.0005 + CAST(id / 100 AS INT) * 0.01),"
        " named_struct('nid', id * 1000000 + 900002,"
        "   'lon', 10.002 + (id % 100) * 0.01,"
        "   'lat', 45.0015 + CAST(id / 100 AS INT) * 0.01),"
        " named_struct('nid', id * 1000000 + 900000,"
        "   'lon', 10.001 + (id % 100) * 0.01,"
        "   'lat', 45.0005 + CAST(id / 100 AS INT) * 0.01)),"
        " 'm_geom', CAST(NULL AS BINARY)))"
    )
    members_expr = (
        f"transform(sequence(0, {m_ways - 1}), w -> named_struct("
        f"  'role', 'outer', 'mtype', 'way', 'line', {line_expr},"
        f"  'm_geom', CAST(NULL AS BINARY))) || {inner_expr} AS members"
    )
    return spark.range(n_rel).selectExpr(
        "id", "TRUE AS visible", "map(1, 1) AS tags", members_expr
    )


def main():
    n_rel = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .appName("bench_relation_udf")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = make_input(spark, n_rel).repartition(16).persist()
    df.count()

    def run(udf_apply, label):
        out = df.withColumn("g", udf_apply)
        # checksum forces full materialization of the packed geometry
        t0 = time.time()
        row = out.agg(
            F.sum(F.length("g.geom")).alias("b"), F.sum("g.area").alias("a")
        ).collect()[0]
        dt = time.time() - t0
        return dt, int(row["b"]), float(row["a"])

    legacy = legacy_relation_geometry_udf()
    vec = relation_geometry_udf()
    # warm both code paths once (worker pool spin-up, JIT)
    run(legacy("visible", "tags", "members"), "warm-l")
    run(vec("visible", "tags", "members"), "warm-v")
    lt, lb, la = run(legacy("visible", "tags", "members"), "legacy")
    vt, vb, va = run(vec("visible", "tags", "members"), "vectorized")
    assert lb == vb and abs(la - va) < 1e-9, (lb, vb, la, va)
    print(
        json.dumps(
            {
                "n_relations": n_rel,
                "legacy_sec": round(lt, 3),
                "vectorized_sec": round(vt, 3),
                "speedup": round(lt / vt, 2),
                "checksum_bytes": lb,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
