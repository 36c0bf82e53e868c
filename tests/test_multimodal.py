"""Multimodal plumbing tests: schemas, mapInPandas batch shape, decoders.

All three media kinds decode REAL bytes end-to-end: PNG (pure-Python
IHDR parse), WAV (RIFF chunk walk; fixture bytes from the independent
stdlib `wave` writer) and MP4 (ISO-BMFF box walk over a minimal
hand-assembled ftyp+moov/mvhd file).
"""

import hashlib
import io
import struct
import wave
import zlib

import pytest
from pyspark.sql import functions as F

from wikdict_gen_spark.operators import multimodal


def make_png(width: int, height: int, seed: bytes = b"") -> bytes:
    """A minimal valid PNG: signature + IHDR + 1 IDAT + IEND."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(width) for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"tEXt", b"seed\x00" + seed)
        + chunk(b"IEND", b"")
    )


PNG_64x48 = make_png(64, 48, b"1")
PNG_128x96 = make_png(128, 96, b"2")


def make_wav(sample_rate: int, channels: int, n_frames: int) -> bytes:
    """Real WAV bytes via the stdlib wave writer (16-bit PCM) —
    independent of the decoder under test."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(
            b"".join(
                struct.pack("<h", (i * 257) % 32768 - 16384) * channels
                for i in range(n_frames)
            )
        )
    return buf.getvalue()


WAV_8K_MONO_500MS = make_wav(8000, 1, 4000)     # 4000 frames @ 8kHz = 500ms
WAV_16K_STEREO_250MS = make_wav(16000, 2, 4000)  # 4000 frames @ 16kHz = 250ms


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def make_mp4(timescale: int, duration: int, version: int = 0) -> bytes:
    """Minimal valid ISO-BMFF file: ftyp + moov{mvhd} + free."""
    if version:
        mvhd = (
            bytes([1, 0, 0, 0]) + b"\x00" * 16
            + struct.pack(">I", timescale) + struct.pack(">Q", duration)
        )
    else:
        mvhd = (
            bytes([0, 0, 0, 0]) + b"\x00" * 8
            + struct.pack(">I", timescale) + struct.pack(">I", duration)
        )
    return (
        _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        + _box(b"moov", _box(b"mvhd", mvhd))
        + _box(b"free", b"")
    )


MP4_3500MS = make_mp4(600, 2100)  # 2100 / 600 ticks/s = 3.5s


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", PNG_64x48, "image/png", None, None, None),
        (2, "image", PNG_128x96, "image/png", None, None, None),
        (3, "audio", WAV_8K_MONO_500MS, "audio/wav", None, None, 2500),
        (4, "video", MP4_3500MS, "video/mp4", 640, 480, 3500),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_extract_features_real_png_dims(spark, media):
    """Real PNG bytes -> real width/height from the IHDR, end-to-end
    through Arrow + mapInPandas."""
    out = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert (out[1]["width"], out[1]["height"]) == (64, 48)
    assert (out[2]["width"], out[2]["height"]) == (128, 96)
    # non-image kinds have no dims
    assert out[3]["width"] is None and out[4]["width"] is None


def test_extract_features_real_wav(spark, media):
    """Real WAV bytes -> real channel/rate/duration from the RIFF headers,
    end-to-end through Arrow + mapInPandas."""
    out = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    assert out[3]["channels"] == 1
    assert out[3]["sample_rate"] == 8000
    assert out[3]["duration_ms"] == 500
    # images carry no audio metadata; video has duration but no rate
    assert out[1]["sample_rate"] is None and out[1]["duration_ms"] is None
    assert out[4]["sample_rate"] is None


def test_wav_decode_variants_and_garbage():
    f = multimodal.wav_decode(WAV_16K_STEREO_250MS)
    assert (f["channels"], f["sample_rate"], f["duration_ms"]) == (2, 16000, 250)
    with pytest.raises(ValueError, match="RIFF"):
        multimodal.wav_decode(b"not-audio-bytes-at-all")
    with pytest.raises(ValueError, match="truncated"):
        multimodal.wav_decode(WAV_8K_MONO_500MS[:100])
    with pytest.raises(ValueError, match="NULL"):
        multimodal.wav_decode(None)


def test_mp4_decode_real_duration(spark, media):
    """Real MP4 bytes -> mvhd duration, end-to-end and direct (both mvhd
    versions), with loud failure on garbage."""
    out = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    assert out[4]["duration_ms"] == 3500
    assert out[4]["sample_rate"] is None
    f = multimodal.mp4_decode(make_mp4(90000, 90000 * 7, version=1))
    assert f["duration_ms"] == 7000
    with pytest.raises(ValueError, match="ftyp"):
        multimodal.mp4_decode(b"garbage-bytes-that-are-not-mp4-data")
    with pytest.raises(ValueError, match="truncated"):
        multimodal.mp4_decode(MP4_3500MS[:20])
    with pytest.raises(ValueError, match="NULL"):
        multimodal.mp4_decode(None)


def test_extract_features_deterministic(spark, media):
    out = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    want = hashlib.md5(PNG_64x48).hexdigest()
    assert out[1]["content_hash"] == want
    assert out[1]["n_bytes"] == len(PNG_64x48)
    assert len(out[1]["embedding"]) == 8
    assert all(0.0 <= x < 1.0 for x in out[1]["embedding"])
    # same bytes -> same features; different bytes -> different hash
    assert out[1]["content_hash"] != out[2]["content_hash"]


def test_png_decode_rejects_garbage():
    with pytest.raises(ValueError, match="bad signature"):
        multimodal.png_decode(b"not-a-png-at-all-padding-padding-pad")
    # corrupt the IHDR CRC of a valid PNG
    broken = bytearray(PNG_64x48)
    broken[29] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        multimodal.png_decode(bytes(broken))
    with pytest.raises(ValueError, match="NULL"):
        multimodal.png_decode(None)


def test_bad_png_fails_loudly_in_plan(spark):
    bad = spark.createDataFrame(
        [(9, "image", b"garbage-bytes-that-are-not-png-data", None, None, None, None)],
        multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="bad signature"):
        multimodal.extract_features(bad).collect()


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
        assert out[1]["width"] is None  # swapped decoder reports no dims
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
