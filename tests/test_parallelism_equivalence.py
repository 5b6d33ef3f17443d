"""Parallelism-equivalence: identical results across execution strategies.

The reference proves backend-equivalence by running one shared test body
against every backend: MapReduceTest is subclassed unchanged by
MapReduceOSHDBH2SinglethreadTest / MapReduceOSHDBH2MultithreadTest
(oshdb-api/src/test/java/.../tests/) and by the three Ignite compute-mode
variants MapReduceOSHDBIgnite{LocalPeek,ScanQuery,AffinityCall}Test
(oshdb-api-ignite/src/test/java/.../tests/), each asserting the same
hardcoded golden values; FlatMapReduceGroupedByEntityOSHDBH2
{Singlethread,Multithread}Test do the same for the grouped-by-entity body.

In a Spark engine the "backend" axis collapses into the scheduler, so the
equivalent claim is *parallelism*-equivalence (SURVEY.md section 5): the
same query must return identical rows on a 1-core / 1-shuffle-partition
session and on a multi-core / many-shuffle-partition session.  That is a
real claim — it exercises partial-aggregation merge order, shuffle hash
routing, per-partition UDF batching, and the deterministic-sampling
contract — and it is the correctness half of the two-cluster-size scaling
gate (bench.py --scaling-cluster measures the throughput half on the same
two-level matrix).

One SparkContext per JVM means the two sessions cannot share a process:
each level runs in its own subprocess (its own JVM), mirroring how the
reference's backend variants each boot their own database.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("EQUIV_SF_DIR", "/root/testdata/sf0.001")

# Queries whose outputs are bit-deterministic under re-partitioning:
# integer/count/decimal aggregates or per-row computed values only (a
# double reduced in partition order could differ in the last ulp and
# would test nothing about the engine).
QUERY_NAMES = [
    "tile_assign_z12",  # XYGrid cell id bit-math + counts
    "tile_insert_rule",  # XYGridTree lifetime-bbox insert zoom
    "cell_hash_join",  # cell-cell hash join output rows
    "snapshot_asof_count",  # as-of version resolution + long sums
    "contribution_classify",  # lag-window contribution classification
    "zerofill_group",  # aggregateBy with zerofill
    "lsh_candidate_pairs",  # banded-LSH equi-join pair set
    "deterministic_sample",  # md5-threshold sampling (repartition-stable)
    "knn_points",  # ring-expansion kNN ids + per-pair distances
    "way_member_resolution",  # member-resolution as-of join
    # dwithin_pairs is oracle-gated at sf0.01; at this file's sf0.001 the
    # synthetic lattice has no pairs within 1 degree (empty proves nothing)
    "session_stats",  # gap sessionization window chain
    "cell_count_pyramid",  # one-shuffle multi-zoom rollup
    "topk_cell_contributors",  # per-cell window rank, integer tie-break
]

_WORKER = r"""
import json, sys

repo, master, shuffle, sf_dir, names_csv, out_path = sys.argv[1:7]
sys.path.insert(0, repo)
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master(master)
    .config("spark.sql.shuffle.partitions", shuffle)
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .appName(f"equiv-{master}")
    .getOrCreate()
)
from oshdb_spark import driver_queries as dq

qs = dq.queries()
out = {}
for name in names_csv.split(","):
    df = qs[name](spark, sf_dir)
    cols = sorted(df.columns)
    rows = sorted(
        tuple(repr(v) for v in row) for row in df.select(*cols).collect()
    )
    out[name] = {"cols": cols, "rows": rows}
with open(out_path, "w") as f:
    json.dump(out, f)
spark.stop()
"""


def _run_level(master: str, shuffle: str, tmp_path, tag: str) -> dict:
    script = tmp_path / f"worker_{tag}.py"
    out = tmp_path / f"out_{tag}.json"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    subprocess.run(
        [
            sys.executable,
            str(script),
            REPO,
            master,
            shuffle,
            SF_DIR,
            ",".join(QUERY_NAMES),
            str(out),
        ],
        check=True,
        env=env,
        timeout=900,
        stdout=subprocess.DEVNULL,
    )
    with open(out) as f:
        return json.load(f)


def test_singlethread_vs_multithread_identical_rows(tmp_path):
    """local[1]/1-shuffle-partition vs local[8]/16 — the Singlethread vs
    Multithread (and Ignite-mode) golden-value equivalence, over the
    oracle-gated driver queries instead of hardcoded goldens."""
    lo = _run_level("local[1]", "1", tmp_path, "lo")
    hi = _run_level("local[8]", "16", tmp_path, "hi")
    assert set(lo) == set(hi) == set(QUERY_NAMES)
    for name in QUERY_NAMES:
        assert lo[name]["cols"] == hi[name]["cols"], name
        assert lo[name]["rows"] == hi[name]["rows"], (
            f"{name}: rows differ between parallelism levels "
            f"({len(lo[name]['rows'])} vs {len(hi[name]['rows'])})"
        )
        assert lo[name]["rows"], f"{name}: empty result would prove nothing"
