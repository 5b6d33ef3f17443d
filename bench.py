#!/usr/bin/env python
"""Headline benchmark: engine queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

--scaling runs the same workload at two parallelism levels (8 and 32 cores
by default) in separate spark sessions and reports throughput at both plus
scaling efficiency = (T_small / T_big) / (cpus_big / cpus_small) — the
sandbox substitution for the N vs 4N executor-cluster rule.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_suite(cpus: int) -> dict[str, float]:
    from oshdb_spark import driver_queries as dq
    from oshdb_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 8),
    )
    timings: dict[str, float] = {}
    # warm the JVM + parquet footer caches with one cheap action
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    for name, fn in dq.bench_queries().items():
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.monotonic() - t0, 3)
        timings[f"__rows_{name}"] = n
    spark.stop()
    return timings


def _docs_parquet(n_features: int) -> tuple[str, int]:
    """Deterministic docs table cached in /tmp (generated once per size).

    SCALE_DOCS_MODE=world uses the rich pandas world generator (driver-side,
    ~10^6 ceiling); the default 'synth' mode uses the Spark-native generator
    (sources/docs.synthesize_bench_docs) sized by SCALE_DOCS_N."""
    import pathlib

    if os.environ.get("SCALE_DOCS_MODE", "synth") == "synth":
        # default = the gate configuration measured in BENCH.md section 0a:
        # 8M docs amortizes fixed per-query cost (driver planning, stage
        # latency, Python worker spin-up); at 3M the 4-executor level's
        # ~7s walls are still latency-bound and efficiency reads ~0.74
        n_docs = int(os.environ.get("SCALE_DOCS_N", "8000000"))
        path = f"/tmp/oshdb_bench_synth_{n_docs}.parquet"
        if not pathlib.Path(path, "_SUCCESS").exists():
            from oshdb_spark.session import get_spark
            from oshdb_spark.sources.docs import synthesize_bench_docs

            spark = get_spark(app_name="bench_gen", master="local[32]")
            synthesize_bench_docs(spark, n_docs).repartition(64).write.mode(
                "overwrite"
            ).parquet(path)
            spark.stop()
        return path, n_docs

    path = f"/tmp/oshdb_bench_docs_{n_features}.parquet"
    meta = pathlib.Path(path + ".count")
    if not meta.exists():
        from oshdb_spark.sources.docs import write_docs_parquet

        docs, _ = write_docs_parquet(path, n_features=n_features, seed=42)
        meta.write_text(str(len(docs)))
    return path, int(meta.read_text())


def _scaling_worker(master: str, docs_path: str) -> None:
    """One subprocess per parallelism level: 2 JIT-warmup runs, then 3
    measured runs each of (a) the narrow tile-assignment stage and (b) the
    full tile-assign + cell-join + refine pipeline.  Prints one JSON line.

    ``master`` is either local[N] (shared-JVM thread scaling) or
    local-cluster[W,C,MEM] (SEPARATE executor JVMs — the honest sandbox
    model of N vs 4N executors: constant cores+heap per executor, more
    executors, independent young-gens and Python worker pools)."""
    from oshdb_spark.pipeline import tile_assign_throughput, tile_join_throughput
    from oshdb_spark.session import get_spark

    extra = {"spark.sql.files.maxPartitionBytes": "4m"}
    if master.startswith("local-cluster"):
        body = master.split("[", 1)[1].rstrip("]").split(",")
        cores_per_exec = int(body[1])
        mem_mb = int(body[2])
        extra["spark.executor.memory"] = f"{max(mem_mb - 1024, 1024)}m"
        # Each executor JVM must size its GC/JIT/ForkJoin pools to ITS OWN
        # core share, exactly as it would on its own machine in a real
        # cluster.  Without this every executor sees all 32 host vCPUs and
        # spawns 32 parallel-GC threads — 4 executors then fight over the
        # host during the allocation-heavy parse, an interference term that
        # exists only in the sandbox and only at the 4N level.
        extra["spark.executor.extraJavaOptions"] = (
            f"-XX:ActiveProcessorCount={cores_per_exec}"
        )
    # shuffle partitions FIXED across parallelism levels: the scaling
    # comparison isolates core count, not partitioning
    spark = get_spark(
        app_name="bench_pipeline",
        master=master,
        shuffle_partitions=int(os.environ.get("SCALE_SHUFFLE_PARTS", "64")),
        # the synthetic docs table is a handful of parquet files; split them
        # finely so the narrow extract+tile stage has enough input tasks for
        # every core (a production table has ample splits already)
        extra_conf=extra,
    )
    bbox = (-120.0, -60.0, 120.0, 60.0)
    docs = spark.read.parquet(docs_path)
    docs.count()  # warm footers

    def measure(
        fn,
        warmups=int(os.environ.get("SCALE_WARMUPS", "1")),
        reps=int(os.environ.get("SCALE_REPS", "3")),
    ):
        # clearCache between reps: operators may persist() intermediates
        # (e.g. lifetime_bboxes' single-scan edge relation), which is a
        # legitimate WITHIN-job reuse — but letting rep N+1 read rep N's
        # cache would fake the steady-state throughput being measured
        for _ in range(warmups):
            spark.catalog.clearCache()
            fn(spark, docs, bbox).collect()
        walls = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn(spark, docs, bbox).collect()
            walls.append(round(time.monotonic() - t0, 3))
        return walls

    out = {
        "assign": measure(tile_assign_throughput),
        "join": measure(tile_join_throughput),
    }
    spark.stop()
    print(json.dumps(out))


def run_pipeline(master: str, docs_path: str) -> dict[str, list[float]]:
    """Run the scaling worker in a fresh subprocess (own JVM) and collect
    its per-workload wall times.

    CPU-affinity confinement (round-3 protocol fix): a local-cluster level
    with W executors x C cores models a W-machine cluster of C-core hosts,
    so the WHOLE level (driver + executor JVMs + their Python UDF workers)
    is pinned to exactly W*C host threads with `taskset`.  Without this the
    1-executor level silently borrows idle host cores for its Python
    workers (8 task threads + 8 workers ~ 16 cores of real demand on the
    free 32-core host) while the 4-executor level oversubscribes (64
    demand on 32), so the measured "efficiency" understates what identical
    per-machine budgets would give — an artifact of the shared host, not a
    property of the plan.  Disable with SCALE_NO_TASKSET=1 to reproduce
    the round-2 unconfined numbers."""
    import shutil
    import subprocess

    argv = [sys.executable, os.path.abspath(__file__), "--scaling-worker",
            master, docs_path]
    if (
        master.startswith("local-cluster")
        and not os.environ.get("SCALE_NO_TASKSET")
        and shutil.which("taskset")
    ):
        body = master.split("[", 1)[1].rstrip("]").split(",")
        budget = int(body[0]) * int(body[1])
        if budget < (os.cpu_count() or budget):
            argv = ["taskset", "-c", f"0-{budget - 1}"] + argv
    out = subprocess.run(
        argv,
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _scaling_report(
    masters: tuple[str, str], cpus: tuple[int, int], docs_path: str, n_docs: int
) -> dict:
    lo, hi = cpus
    r_lo = run_pipeline(masters[0], docs_path)
    r_hi = run_pipeline(masters[1], docs_path)
    report = {
        "metric": "tile_join_scaling_efficiency",
        "unit": "ratio",
        "cpus": [lo, hi],
        "masters": list(masters),
        "n_docs": n_docs,
        "workloads": {},
    }
    for wl in ("assign", "join"):
        w_lo, w_hi = sorted(r_lo[wl]), sorted(r_hi[wl])
        med_lo, med_hi = w_lo[len(w_lo) // 2], w_hi[len(w_hi) // 2]
        thr_lo, thr_hi = n_docs / med_lo, n_docs / med_hi
        report["workloads"][wl] = {
            "efficiency": round(thr_hi / ((hi / lo) * thr_lo), 4),
            "docs_per_sec": {str(lo): round(thr_lo, 1), str(hi): round(thr_hi, 1)},
            "wall_sec": {str(lo): w_lo, str(hi): w_hi},
        }
    report["value"] = report["workloads"]["join"]["efficiency"]
    return report


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    if "--scaling-worker" in sys.argv:
        i = sys.argv.index("--scaling-worker")
        _scaling_worker(sys.argv[i + 1], sys.argv[i + 2])
        return
    if "--scaling-cluster" in sys.argv:
        # N vs 4N EXECUTOR scaling with separate executor JVMs
        # (local-cluster): constant cores + heap per executor, 4x the
        # executors — the faithful sandbox model of the north rule's
        # two-cluster-size criterion (independent heaps/GC/Python pools;
        # only disk + memory bus remain shared)
        # defaults = the round-3 gate protocol from BENCH.md section 0a:
        # 1 vs 4 executors x 4 cores x 14 GiB, each level taskset-pinned
        # to workers*cores host threads (symmetric thread:core ratio; the
        # 16-core high level leaves the single host's memory bus the
        # headroom a real 4-machine cluster would have).  The round-2
        # 8-core variant: SCALE_CORES_PER_WORKER=8.
        w_lo = int(os.environ.get("SCALE_WORKERS_LO", "1"))
        w_hi = int(os.environ.get("SCALE_WORKERS_HI", "4"))
        cores = int(os.environ.get("SCALE_CORES_PER_WORKER", "4"))
        mem = int(os.environ.get("SCALE_MEM_PER_WORKER_MB", "14336"))
        n_features = int(os.environ.get("SCALE_DOCS_FEATURES", "200000"))
        docs_path, n_docs = _docs_parquet(n_features)
        report = _scaling_report(
            (
                f"local-cluster[{w_lo},{cores},{mem}]",
                f"local-cluster[{w_hi},{cores},{mem}]",
            ),
            (w_lo * cores, w_hi * cores),
            docs_path,
            n_docs,
        )
        report["metric"] = "executor_scaling_efficiency"
        print(json.dumps(report))
        return
    if "--scaling" in sys.argv:
        # north-rule protocol (BASELINE.md): the SAME headline workload on
        # the SAME docs input at two parallelism levels (the sandbox stand-in
        # for N vs 4N executors); throughput = docs/sec; efficiency =
        # throughput_hi / ((hi/lo) * throughput_lo); median of 3 warm runs
        lo = int(os.environ.get("SCALE_CPUS_LO", "8"))
        hi = int(os.environ.get("SCALE_CPUS_HI", "32"))
        n_features = int(os.environ.get("SCALE_DOCS_FEATURES", "200000"))
        docs_path, n_docs = _docs_parquet(n_features)
        report = _scaling_report(
            (f"local[{lo}]", f"local[{hi}]"), (lo, hi), docs_path, n_docs
        )
        print(json.dumps(report))
        return

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    timings = run_suite(cpus)
    queries = {k: v for k, v in timings.items() if not k.startswith("__")}
    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_runtime",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
