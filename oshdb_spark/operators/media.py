"""Multimodal (image/audio/video) column operators.

Media rides through the engine as opaque ``binary`` payloads + typed
metadata, exactly like the docs table's media spans reference payloads by
``media_ref`` (sources/docs.py).  The Spark-side plumbing — schemas,
Arrow batch shapes, mapInPandas iterator contracts, partition hygiene —
is real and tested; the actual codec work is STUBBED behind
``decode_stub`` (the sandbox has no image/audio libraries) with a
deterministic fake so tests can assert end-to-end behavior.  Swapping in
PIL/librosa/pyav is a one-function change per modality.

Design rules (100 TB posture):
  * mapInPandas over Arrow batches — the binary payloads never surface as
    Python objects row-at-a-time; each batch is one pandas DataFrame.
  * metadata (width/height/duration/codec) lives in a sibling struct
    column so filters on it are JVM-side and prune before any decode.
  * decode stages are explicitly batch-size-capped (media blobs are big;
    spark.sql.execution.arrow.maxRecordsPerBatch controls memory).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ]
)

FEATURE_DIM = 16


def synthesize_media_table(docs: DataFrame) -> DataFrame:
    """Derive the (media_ref, payload, meta) table from the docs' media
    spans — deterministic fake payloads (sha256 stream of the ref) with
    metadata decoded from the ref string.  Stands in for an object-store
    side table keyed by media_ref."""
    from oshdb_spark.session import ensure_package_on_workers
    ensure_package_on_workers()
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for ref in pdf["media_ref"]:
                h = hashlib.sha256(ref.encode()).digest()
                kind = ("image", "audio", "video")[h[0] % 3]
                payload = (h * 8)[: 64 + h[1]]
                out_rows.append(
                    {
                        "media_ref": ref,
                        "payload": payload,
                        "kind": kind,
                        "width": 16 + h[2] % 64 if kind != "audio" else None,
                        "height": 16 + h[3] % 64 if kind != "audio" else None,
                        "n_frames": 1 + h[4] % 30 if kind == "video" else (1 if kind == "image" else None),
                        "sample_rate": 16000 if kind == "audio" else None,
                        "codec": {"image": "fake/png", "audio": "fake/pcm", "video": "fake/h264"}[kind],
                    }
                )
            yield pd.DataFrame(out_rows)

    schema = (
        "media_ref string, payload binary, kind string, width int, height int,"
        " n_frames int, sample_rate int, codec string"
    )
    flat = refs.mapInPandas(gen, schema=schema)
    return flat.select(
        "media_ref",
        "payload",
        F.struct("kind", "width", "height", "n_frames", "sample_rate", "codec").alias(
            "meta"
        ),
    )


def decode_stub(payload: bytes, meta: dict) -> np.ndarray:
    """THE STUB: replace with a real decoder (PIL.Image.open /
    librosa.load / av.open).  Deterministic fake: a float32 array shaped
    by the metadata, filled from the payload bytes."""
    if meta["kind"] == "image":
        n = int(meta["width"]) * int(meta["height"])
    elif meta["kind"] == "audio":
        n = int(meta["sample_rate"]) // 100
    else:
        n = int(meta["n_frames"]) * 64
    raw = np.frombuffer((payload * (n // max(len(payload), 1) + 1))[:n], dtype=np.uint8)
    return raw.astype(np.float32) / 255.0


def extract_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """media(media_ref, payload, meta) -> + features array<float> (FEATURE_DIM).

    mapInPandas so each Arrow batch decodes in one Python invocation;
    the feature is a bucketed histogram of the decoded signal (stands in
    for an embedding model forward pass).
    """
    from oshdb_spark.session import ensure_package_on_workers
    ensure_package_on_workers()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                sig = decode_stub(payload, meta)
                hist, _ = np.histogram(sig, bins=FEATURE_DIM, range=(0.0, 1.0))
                total = max(hist.sum(), 1)
                feats.append((hist / total).astype(np.float32).tolist())
            out = pdf[["media_ref"]].copy()
            out["features"] = feats
            yield out

    return media.mapInPandas(run, schema="media_ref string, features array<float>")


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """video rows -> one row per sampled frame index (frame-sample plumbing:
    the explode happens JVM-side on a computed index array; the decode of
    each sampled frame would go through decode_stub per frame)."""
    vids = media.filter(F.col("meta.kind") == "video")
    idx = F.sequence(
        F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
    )
    return vids.withColumn("frame_idx", F.explode(idx)).select(
        "media_ref", "frame_idx", "meta"
    )


def resize_meta(media: DataFrame, max_dim: int = 32) -> DataFrame:
    """Resize plumbing: compute target dims JVM-side (aspect-preserving,
    capped at max_dim); the pixel resample itself is decode_stub territory."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_dim)
        / F.greatest(F.col("meta.width"), F.col("meta.height")).cast("double"),
    )
    return media.filter(F.col("meta.kind").isin("image", "video")).select(
        "media_ref",
        "meta",
        F.round(F.col("meta.width") * scale).cast("int").alias("target_w"),
        F.round(F.col("meta.height") * scale).cast("int").alias("target_h"),
    )


def media_asset_dedup(
    docs: DataFrame, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """Cross-document media-asset dedup: one row per distinct ``media_ref``
    appearing in any media span, with its reference count, the number of
    distinct documents embedding it, and the canonical owner (the document
    with the smallest ``(doc_id, offset)`` that embeds it).

    This is the asset-level step a multimodal pipeline runs BEFORE decode/
    feature-extract: a boilerplate logo embedded in a million pages must be
    decoded once, not a million times — downstream stages join features
    back by ``media_ref``.

    Scale shape: explode is narrow (no shuffle), the rollup is a single
    hash aggregation on ``media_ref`` with map-side partial count / count-
    distinct / min-struct; a viral asset is exactly one hot reduce key,
    absorbed by partial aggregation before the exchange.
    """
    media_spans = F.filter(
        F.col(spans_col), lambda s: s["kind"] == F.lit("media")
    )
    refs = docs.select(
        F.col(id_col), F.explode(media_spans).alias("s")
    ).select(
        F.col(id_col),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )
    return refs.groupBy("media_ref").agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.count_distinct(F.col(id_col)).alias("n_docs"),
        F.min(F.struct(F.col(id_col), F.col("offset")))
        .getField(id_col)
        .alias("canonical_doc"),
    )
