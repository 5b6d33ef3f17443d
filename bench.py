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


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    if "--scaling" in sys.argv:
        lo = int(os.environ.get("SCALE_CPUS_LO", "8"))
        hi = int(os.environ.get("SCALE_CPUS_HI", "32"))
        t_lo = run_suite(lo)
        t_hi = run_suite(hi)
        q_lo = {k: v for k, v in t_lo.items() if not k.startswith("__")}
        q_hi = {k: v for k, v in t_hi.items() if not k.startswith("__")}
        total_lo = sum(q_lo.values())
        total_hi = sum(q_hi.values())
        eff = (total_lo / total_hi) / (hi / lo)
        print(
            json.dumps(
                {
                    "metric": "scaling_efficiency",
                    "value": round(eff, 4),
                    "unit": "ratio",
                    "cpus": [lo, hi],
                    "total_sec": {str(lo): round(total_lo, 3), str(hi): round(total_hi, 3)},
                    "queries_lo": q_lo,
                    "queries_hi": q_hi,
                    "sf": sf,
                }
            )
        )
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
