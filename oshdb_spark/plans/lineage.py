"""Per-partition lineage + metrics with checkpoint resumability.

North-rule requirement (BASELINE.json:14): "per-partition lineage + metrics
written alongside Iceberg snapshot checkpoints for resumability".  The
sandbox has no Iceberg runtime jars, so we implement the same commit
protocol on plain parquet, mirroring Iceberg's snapshot model:

  * output is split into deterministic BUCKETS (hash of the partition key);
  * each bucket is written to its own directory ``bucket=K/`` and then a
    MANIFEST file ``_lineage/bucket-K.json`` is written LAST — the
    manifest's existence is the atomic commit marker (Iceberg: a snapshot
    only exists once its manifest list is committed; a half-written data
    directory without a manifest is invisible and simply overwritten on
    retry);
  * the manifest carries the lineage record: bucket id, row count, input
    fingerprint (so a changed input invalidates the checkpoint), wall
    time, writer parallelism — the reference stores comparable metadata
    per grid-cell batch in its `metadata` table (TableNames.java:7-60);
  * ``run_partitioned`` skips every bucket whose valid manifest already
    exists — resume-from-checkpoint is simply re-running the job.

On a real cluster each bucket write is one Spark action over a pruned
(``pmod(hash(key), B) = K``) subset; buckets are sized so a single action's
shuffle fits comfortably in executor memory at the target scale.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class BucketManifest:
    bucket: int
    n_buckets: int
    rows: int
    input_fingerprint: str
    wall_sec: float
    parallelism: int
    schema: str


def _manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, "_lineage", f"bucket-{bucket}.json")


def _bucket_dir(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, f"bucket={bucket}")


def input_fingerprint(df: DataFrame) -> str:
    """Deterministic fingerprint of the INPUT DATA identity, not the plan.

    An Iceberg table would use its snapshot id; for file sources the
    closest stable equivalent is the source file listing plus per-file
    size and mtime — rewriting the input at the same path changes the
    fingerprint (so stale checkpoints are invalidated), while re-running
    the same job on unchanged input reproduces it (so resume works).
    The schema and plan string participate too, so a changed projection
    or filter also invalidates.

    Plans whose leaves are not file scans (localCheckpoint / createDataFrame
    RDD leaves) have NO stable identity — their plan string embeds
    run-specific RDD ids, so an automatic fingerprint would never match on
    resume.  Such plans must supply an explicit caller fingerprint
    (run_partitioned(fingerprint=...)); we raise instead of silently
    producing a fingerprint that defeats resumability.
    """
    import hashlib

    files = sorted(df.inputFiles())
    plan = df._jdf.queryExecution().logical().toString()
    if not files:
        for marker in ("LogicalRDD", "ExistingRDD", "Scan ExistingRDD"):
            if marker in plan:
                raise ValueError(
                    "input_fingerprint: plan has RDD/checkpoint leaves with no "
                    "stable identity (its RDD ids change every run); pass an "
                    "explicit fingerprint= derived from the true source data"
                )
    stats = []
    for uri in files:
        path = uri[len("file:"):] if uri.startswith("file:") else uri
        try:
            st = os.stat(path)
            stats.append(f"{uri}|{st.st_size}|{int(st.st_mtime)}")
        except OSError:
            stats.append(uri)  # non-local FS: listing alone still catches adds/drops
    # strip run-varying plan ids (#123) so logically-identical reads match
    import re

    plan_stable = re.sub(r"#\d+L?", "#", plan)
    basis = "\n".join([df.schema.simpleString(), plan_stable, *stats])
    return hashlib.sha256(basis.encode()).hexdigest()[:16]


def completed_buckets(out_dir: str, fingerprint: str, n_buckets: int) -> set[int]:
    done = set()
    for b in range(n_buckets):
        p = _manifest_path(out_dir, b)
        if not os.path.exists(p):
            continue
        try:
            with open(p) as f:
                m = json.load(f)
            if m.get("input_fingerprint") == fingerprint and m.get("n_buckets") == n_buckets:
                done.add(b)
        except (json.JSONDecodeError, OSError):
            continue
    return done


def run_partitioned(
    df: DataFrame,
    out_dir: str,
    bucket_key: str,
    n_buckets: int = 8,
    fingerprint: str | None = None,
) -> list[BucketManifest]:
    """Write ``df`` to ``out_dir`` in n_buckets resumable chunks.

    Returns the manifests written THIS run (already-committed buckets are
    skipped).  Deterministic: bucket = pmod(xxhash64(bucket_key), n).
    """
    fingerprint = fingerprint or input_fingerprint(df)
    os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)
    done = completed_buckets(out_dir, fingerprint, n_buckets)
    spark = df.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    bucketed = df.withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(bucket_key)), F.lit(n_buckets)).cast("int")
    )
    written: list[BucketManifest] = []
    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.monotonic()
        part = bucketed.filter(F.col("__bucket") == b).drop("__bucket")
        path = _bucket_dir(out_dir, b)
        part.write.mode("overwrite").parquet(path)
        rows = spark.read.parquet(path).count()
        manifest = BucketManifest(
            bucket=b,
            n_buckets=n_buckets,
            rows=rows,
            input_fingerprint=fingerprint,
            wall_sec=round(time.monotonic() - t0, 3),
            parallelism=parallelism,
            schema=df.schema.simpleString(),
        )
        # manifest LAST = commit
        with open(_manifest_path(out_dir, b), "w") as f:
            json.dump(asdict(manifest), f)
        written.append(manifest)
    return written


def read_output(spark, out_dir: str, n_buckets: int, fingerprint: str) -> DataFrame:
    """Read back only COMMITTED buckets (uncommitted data is invisible,
    like an uncommitted Iceberg snapshot)."""
    done = sorted(completed_buckets(out_dir, fingerprint, n_buckets))
    paths = [_bucket_dir(out_dir, b) for b in done]
    if not paths:
        raise FileNotFoundError(f"no committed buckets under {out_dir}")
    return spark.read.parquet(*paths)


def lineage_report(out_dir: str) -> list[dict]:
    """All committed manifests (the per-partition metrics table)."""
    ldir = os.path.join(out_dir, "_lineage")
    out = []
    if not os.path.isdir(ldir):
        return out
    for name in sorted(os.listdir(ldir)):
        if name.endswith(".json"):
            with open(os.path.join(ldir, name)) as f:
                out.append(json.load(f))
    return out
