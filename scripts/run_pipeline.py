#!/usr/bin/env python
"""spark-submit entry point for the north-rule headline pipeline.

    spark-submit [--master ...] --py-files dist/oshdb_spark.zip \
      scripts/run_pipeline.py --docs <parquet-or-iceberg-table> \
      --bbox minlon,minlat,maxlon,maxlat \
      --timestamps t1,t2,... (epoch seconds or micros) \
      --out <dir> [--buckets 64]

Runs: extract -> tile -> prune -> snapshot+clip -> aggregate, verifies the
span-sequence invariant, writes the result resumably (per-partition lineage
manifests under <out>/_lineage), and prints a one-line JSON report.
Re-running the same command after a failure resumes from the last committed
bucket.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="docs table path (parquet dir)")
    ap.add_argument("--bbox", required=True, help="minlon,minlat,maxlon,maxlat (deg)")
    ap.add_argument("--timestamps", required=True, help="comma-separated epoch ts")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--skip-span-check", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from oshdb_spark.pipeline import (
        spatial_join_pipeline,
        verify_spans,
        write_resumable,
    )

    spark = SparkSession.builder.appName("oshdb_spark_pipeline").getOrCreate()
    bbox = tuple(float(x) for x in args.bbox.split(","))
    ts = [int(x) for x in args.timestamps.split(",")]

    t0 = time.monotonic()
    res = spatial_join_pipeline(spark, spark.read.parquet(args.docs), bbox, ts)
    violations = 0 if args.skip_span_check else verify_spans(res)
    manifests = write_resumable(res, args.out, n_buckets=args.buckets)
    wall = time.monotonic() - t0
    rows = sum(m.rows for m in manifests)
    print(
        json.dumps(
            {
                "rows_written": rows,
                "buckets_run": len(manifests),
                "span_violations": violations,
                "wall_sec": round(wall, 2),
            }
        )
    )
    if violations:
        sys.exit(2)


if __name__ == "__main__":
    main()
