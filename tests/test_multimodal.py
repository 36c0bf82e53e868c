"""Multimodal plumbing tests: schemas, mapInPandas batch shape, stub decode."""

import hashlib

import pytest
from pyspark.sql import functions as F

from wikdict_gen_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"img-bytes-1", "image/png", 64, 64, None),
        (2, "image", b"img-bytes-2", "image/jpeg", 128, 96, None),
        (3, "audio", b"audio-bytes", "audio/wav", None, None, 2500),
        (4, "video", b"video-bytes", "video/mp4", 640, 480, 3500),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_extract_features_deterministic(spark, media):
    out = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    assert set(out) == {1, 2, 3, 4}
    want = hashlib.md5(b"img-bytes-1").hexdigest()
    assert out[1]["content_hash"] == want
    assert out[1]["n_bytes"] == len(b"img-bytes-1")
    assert len(out[1]["embedding"]) == 8
    assert all(0.0 <= x < 1.0 for x in out[1]["embedding"])
    # same bytes -> same features; different bytes -> different hash
    assert out[1]["content_hash"] != out[2]["content_hash"]


def test_unknown_kind_raises(spark):
    bad = spark.createDataFrame(
        [(9, "hologram", b"x", None, None, None, None)], multimodal.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="no decoder registered"):
        multimodal.extract_features(bad).collect()


def test_decoder_registry_swap(spark, media):
    orig = dict(multimodal.DECODERS)
    try:
        multimodal.DECODERS["image"] = lambda b: {
            "n_bytes": 0, "content_hash": "custom", "embedding": [1.0],
        }
        out = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
        assert out[1]["content_hash"] == "custom"
        assert out[3]["content_hash"] != "custom"  # audio untouched
    finally:
        multimodal.DECODERS.update(orig)


def test_frame_sample_plan(spark, media):
    frames = multimodal.frame_sample_plan(media, every_ms=1000).collect()
    ts = sorted(r["frame_ts_ms"] for r in frames)
    assert ts == [0, 1000, 2000, 3000]  # duration 3500ms -> 4 planned frames
    assert {r["media_id"] for r in frames} == {4}


def test_resize_stub_columns(spark, media):
    out = multimodal.resize_stub(media, 224, 224)
    row = out.where(F.col("media_id") == 1).collect()[0]
    assert (row["target_width"], row["target_height"]) == (224, 224)
