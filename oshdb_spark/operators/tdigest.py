"""t-digest quantile sketch — the reference's estimatedQuantile reducer.

Reference: MapReducer.estimatedMedian/estimatedQuantile(s) fold a
MergingDigest with compression=1000 per cell and merge digests
associatively across cells
(/root/reference/oshdb-api/src/main/java/org/heigit/ohsome/oshdb/api/mapreducer/MapReducer.java:1140-1283,
TdigestReducer.java:14-40).  Spark's percentile_approx is a different
sketch (KLL-ish), so for parity we provide a real merging t-digest
(Dunning & Ertl's merging-digest compression rule) with the same
partial+final shape:

  * ``tdigest_partial_udf`` — mapInPandas stage: one serialized digest per
    Arrow batch (never holds raw values beyond a batch);
  * ``merge_digests`` / ``digest_quantile`` — groupBy + applyInPandas
    final merge, or driver-side for a global quantile;
  * ``tdigest_quantiles(df, col, qs, group_cols)`` — the packaged operator.

This is the 100TB path: raw values never concentrate; only ~compression
centroids per partial cross the shuffle.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_COMPRESSION = 1000.0


class TDigest:
    """Merging t-digest over (mean, weight) centroids."""

    def __init__(self, compression: float = DEFAULT_COMPRESSION):
        self.compression = float(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf_means: list[np.ndarray] = []
        self._buf_weights: list[np.ndarray] = []
        self._buffered = 0

    # -- building ----------------------------------------------------------

    def add(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        w = (
            np.ones_like(v)
            if weights is None
            else np.asarray(weights, dtype=np.float64)
        )
        self._buf_means.append(v)
        self._buf_weights.append(w)
        self._buffered += v.size
        if self._buffered > 10 * self.compression:
            self._compress()

    def merge(self, other: "TDigest") -> "TDigest":
        other._compress()
        self._buf_means.append(other.means)
        self._buf_weights.append(other.weights)
        self._buffered += other.means.size
        self._compress()
        return self

    def _compress(self) -> None:
        if self._buffered == 0 and self.means.size <= 2 * self.compression:
            return
        means = np.concatenate([self.means] + self._buf_means)
        weights = np.concatenate([self.weights] + self._buf_weights)
        self._buf_means, self._buf_weights, self._buffered = [], [], 0
        if means.size == 0:
            return
        order = np.argsort(means, kind="mergesort")
        means, weights = means[order], weights[order]
        total = weights.sum()
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w = means[0], weights[0]
        q_done = 0.0
        for m, w in zip(means[1:], weights[1:]):
            q_mid = (q_done + (cur_w + w) / 2.0) / total
            limit = 4.0 * total * q_mid * (1.0 - q_mid) / self.compression
            if cur_w + w <= limit:
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                q_done += cur_w
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    # -- querying ----------------------------------------------------------

    def quantile(self, q: float) -> float:
        self._compress()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = int(np.searchsorted(cum, target))
        # linear interpolation between centroid mid-ranks
        c0, c1 = cum[i - 1], cum[i]
        m0, m1 = self.means[i - 1], self.means[i]
        frac = (target - c0) / (c1 - c0)
        return float(m0 + frac * (m1 - m0))

    # -- serialization (shuffle format) ------------------------------------

    def to_bytes(self) -> bytes:
        self._compress()
        n = self.means.size
        return (
            struct.pack("<dI", self.compression, n)
            + self.means.astype("<f8").tobytes()
            + self.weights.astype("<f8").tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        compression, n = struct.unpack_from("<dI", data, 0)
        off = struct.calcsize("<dI")
        d = cls(compression)
        d.means = np.frombuffer(data, "<f8", n, off).copy()
        d.weights = np.frombuffer(data, "<f8", n, off + 8 * n).copy()
        return d


def tdigest_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    group_cols: list[str] | None = None,
    compression: float = DEFAULT_COMPRESSION,
) -> DataFrame:
    """Grouped estimated quantiles via partial digests + merge.

    Plan shape: mapInPandas emits one serialized digest per (group-values,
    Arrow batch) — the map-side partial; groupBy(group).applyInPandas merges
    digests and evaluates the quantiles — the final combine.  Only digest
    blobs (~compression centroids) cross the shuffle.
    """
    from oshdb_spark.session import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    group_cols = group_cols or []
    gtypes = dict(df.select(*group_cols, col).dtypes) if group_cols else {}

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if group_cols:
                for key, sub in pdf.groupby(group_cols, dropna=False):
                    key = key if isinstance(key, tuple) else (key,)
                    d = TDigest(compression)
                    d.add(sub[col].to_numpy(dtype=np.float64))
                    yield pd.DataFrame(
                        [dict(zip(group_cols, key)) | {"__digest": d.to_bytes()}]
                    )
            else:
                d = TDigest(compression)
                d.add(pdf[col].to_numpy(dtype=np.float64))
                yield pd.DataFrame([{"__digest": d.to_bytes()}])

    part_schema = ", ".join(
        [f"`{g}` {gtypes[g]}" for g in group_cols] + ["__digest binary"]
    )
    parts = df.select(*group_cols, col).mapInPandas(partials, schema=part_schema)

    qcols = [f"q{int(q * 100)}_{col}" for q in qs]

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        d = TDigest(compression)
        for blob in pdf["__digest"]:
            d.merge(TDigest.from_bytes(bytes(blob)))
        row = {g: pdf[g].iloc[0] for g in group_cols}
        for q, name in zip(qs, qcols):
            row[name] = d.quantile(q)
        return pd.DataFrame([row])

    out_schema = ", ".join(
        [f"`{g}` {gtypes[g]}" for g in group_cols] + [f"{n} double" for n in qcols]
    )
    if group_cols:
        return parts.groupBy(*group_cols).applyInPandas(final, schema=out_schema)
    return parts.groupBy().applyInPandas(final, schema=out_schema)
