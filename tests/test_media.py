"""Multimodal media operator plumbing (operators/media.py) — schemas,
Arrow batch shapes, frame sampling, feature extraction with the stubbed
decoder."""

import pytest
from pyspark.sql import functions as F

from oshdb_spark.operators.media import (
    FEATURE_DIM,
    extract_features,
    resize_meta,
    sample_frames,
    synthesize_media_table,
)


@pytest.fixture(scope="module")
def media(spark, docs_parquet):
    path, _, _ = docs_parquet
    docs = spark.read.parquet(path)
    return synthesize_media_table(docs).persist()


def test_media_table_schema(media):
    assert media.schema.simpleString() == (
        "struct<media_ref:string,payload:binary,"
        "meta:struct<kind:string,width:int,height:int,n_frames:int,"
        "sample_rate:int,codec:string>>"
    )
    assert media.count() > 0
    kinds = {r["kind"] for r in media.select(F.col("meta.kind").alias("kind")).distinct().collect()}
    assert kinds <= {"image", "audio", "video"}


def test_media_deterministic(spark, docs_parquet, media):
    path, _, _ = docs_parquet
    again = synthesize_media_table(spark.read.parquet(path))
    a = sorted(r["media_ref"] for r in media.select("media_ref").collect())
    b = sorted(r["media_ref"] for r in again.select("media_ref").collect())
    assert a == b


def test_feature_extraction(media):
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows[:10]:
        assert len(r["features"]) == FEATURE_DIM
        assert abs(sum(r["features"]) - 1.0) < 1e-3  # normalized histogram


def test_frame_sampling(media):
    frames = sample_frames(media, every_n=5)
    vids = media.filter("meta.kind = 'video'")
    per_vid = (
        frames.groupBy("media_ref").agg(F.count("*").alias("n"), F.max("frame_idx").alias("mx"))
        .join(vids.select("media_ref", F.col("meta.n_frames").alias("nf")), "media_ref")
    )
    for r in per_vid.collect():
        assert r["n"] == (r["nf"] - 1) // 5 + 1
        assert r["mx"] < r["nf"]


def test_resize_targets(media):
    rt = resize_meta(media, max_dim=32)
    for r in rt.collect():
        assert max(r["target_w"], r["target_h"]) <= 32
        # aspect preserved within rounding
        ow, oh = r["meta"]["width"], r["meta"]["height"]
        if max(ow, oh) > 32:
            assert abs(r["target_w"] / r["target_h"] - ow / oh) < 0.2


def test_media_asset_dedup_canonical_and_counts(spark):
    """Asset-level dedup: n_refs counts every embedding span, n_docs counts
    distinct documents, canonical = doc with the smallest (doc_id, offset).
    Doc 7 embeds img_a twice (n_refs > n_docs for img_a)."""
    from oshdb_spark.operators.media import media_asset_dedup

    rows = [
        (7, [("media", "", "img_a", 0), ("media", "", "img_a", 9),
             ("text", "t", "", 5)]),
        (3, [("media", "", "img_a", 50)]),
        (9, [("media", "", "img_b", 1), ("text", "x", "", 2)]),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = {
        r["media_ref"]: (r["n_refs"], r["n_docs"], r["canonical_doc"])
        for r in media_asset_dedup(docs).collect()
    }
    assert got == {"img_a": (3, 2, 3), "img_b": (1, 1, 9)}
