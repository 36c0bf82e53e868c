"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schemas, partitioning, Arrow batch shapes,
mapInPandas signatures — is real and tested, and so is every default
decoder's header layer: PNG (signature + CRC-checked IHDR -> width/
height), WAV (RIFF chunk walk -> channels/sample_rate/duration_ms) and
MP4 (ISO-BMFF box walk -> mvhd duration).  Sample/pixel/frame-level
features need real codecs (absent in this sandbox); a deployment
registers richer decoders in place:

    multimodal.DECODERS["image"] = my_pil_decoder

Each decoder takes bytes and returns a dict of feature columns; the
deterministic fake used by default derives features from the byte content
so tests can assert exact values.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType()),      # opaque encoded media bytes
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real codec: features from the bytes.

    Real deployments replace this (torchaudio spectrogram, ffmpeg frame
    sample, ...).  Raises on None payloads — decoders must never silently
    null.
    """
    if payload is None:
        raise ValueError("cannot decode NULL payload")
    digest = hashlib.md5(payload).digest()
    return {
        "n_bytes": len(payload),
        "content_hash": digest.hex(),
        # 8-dim pseudo-embedding from the digest bytes, scaled to [0, 1)
        "embedding": [b / 256.0 for b in digest[:8]],
    }


def png_decode(payload: bytes) -> dict:
    """Real image decoder: pure-Python PNG signature + IHDR parse.

    No codec library needed for header-level features: the 8-byte PNG
    signature, the mandatory first chunk (13-byte IHDR, CRC-verified)
    and its big-endian width/height (PNG spec §5.2/§11.2.2).  Malformed
    payloads raise — schema drift and corrupt blobs must fail loudly,
    not propagate NULL dims.  Pixel-level features (resize, visual
    embedding) still need a real codec registered in its place.
    """
    import zlib

    if payload is None:
        raise ValueError("cannot decode NULL payload")
    if len(payload) < 33 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG: bad signature")
    length = int.from_bytes(payload[8:12], "big")
    if payload[12:16] != b"IHDR" or length != 13:
        raise ValueError("not a PNG: first chunk is not a 13-byte IHDR")
    if zlib.crc32(payload[12:29]) != int.from_bytes(payload[29:33], "big"):
        raise ValueError("not a PNG: IHDR CRC mismatch")
    width = int.from_bytes(payload[16:20], "big")
    height = int.from_bytes(payload[20:24], "big")
    if width == 0 or height == 0:
        raise ValueError("PNG IHDR has a zero dimension")
    feats = _fake_decode(payload)
    feats["width"] = width
    feats["height"] = height
    return feats


def mp4_decode(payload: bytes) -> dict:
    """Real video decoder: pure-Python ISO-BMFF (MP4) box walk.

    Validates the ftyp leading box, then finds moov/mvhd and reads the
    movie timescale + duration (version 0: 32-bit, version 1: 64-bit,
    ISO/IEC 14496-12 §8.2.2) -> duration_ms.  Frame-level features
    (decode, sampling) still need a real codec registered in its place;
    `frame_sample_plan` consumes the duration this parser produces.
    """
    if payload is None:
        raise ValueError("cannot decode NULL payload")
    if len(payload) < 16 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4: first box is not ftyp")

    def walk(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            size = int.from_bytes(payload[pos : pos + 4], "big")
            box = payload[pos + 4 : pos + 8]
            if size == 1:  # 64-bit largesize
                size = int.from_bytes(payload[pos + 8 : pos + 16], "big")
                body_off = pos + 16
            else:
                body_off = pos + 8
            if size == 0:  # box extends to end
                size = hi - pos
            if size < 8 or pos + size > hi:
                raise ValueError("not an MP4: truncated box")
            yield box, body_off, pos + size
            pos += size

    mvhd = None
    for box, lo, hi in walk(0, len(payload)):
        if box == b"moov":
            for b2, lo2, hi2 in walk(lo, hi):
                if b2 == b"mvhd":
                    mvhd = payload[lo2:hi2]
    if mvhd is None:
        raise ValueError("not an MP4: no moov/mvhd box")
    version = mvhd[0]
    if version == 1:
        timescale = int.from_bytes(mvhd[20:24], "big")
        duration = int.from_bytes(mvhd[24:32], "big")
    else:
        timescale = int.from_bytes(mvhd[12:16], "big")
        duration = int.from_bytes(mvhd[16:20], "big")
    if timescale == 0:
        raise ValueError("MP4 mvhd has timescale 0")
    feats = _fake_decode(payload)
    feats["duration_ms"] = round(duration * 1000 / timescale)
    return feats


def wav_decode(payload: bytes) -> dict:
    """Real audio decoder: pure-Python RIFF/WAVE chunk walk (the PNG
    precedent — header-level features need no codec library).  Validates
    the RIFF/WAVE container, reads the fmt chunk's channel count, sample
    rate and byte rate, and derives duration_ms from the data chunk size.
    Malformed payloads raise — corrupt blobs must fail loudly.  Sample-
    level features (spectrograms, audio embeddings) still need a real
    codec registered in its place.
    """
    if payload is None:
        raise ValueError("cannot decode NULL payload")
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("not a WAV: truncated chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("not a WAV: fmt chunk shorter than 16 bytes")
            fmt = {
                "channels": int.from_bytes(body[2:4], "little"),
                "sample_rate": int.from_bytes(body[4:8], "little"),
                "byte_rate": int.from_bytes(body[8:12], "little"),
            }
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data_size is None:
        raise ValueError("not a WAV: missing fmt or data chunk")
    if 0 in (fmt["channels"], fmt["sample_rate"], fmt["byte_rate"]):
        raise ValueError("WAV fmt has a zero field")
    feats = _fake_decode(payload)
    feats["channels"] = fmt["channels"]
    feats["sample_rate"] = fmt["sample_rate"]
    feats["duration_ms"] = round(data_size * 1000 / fmt["byte_rate"])
    return feats


DECODERS: dict[str, Callable[[bytes], dict]] = {
    "image": png_decode,
    "audio": wav_decode,
    "video": mp4_decode,
}


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """media(media_id, kind, payload, ...) -> per-item feature rows.

    mapInPandas: Arrow streams binary batches into the Python worker; the
    decoder runs per element inside the batch (codecs are inherently
    per-item), results come back as one Arrow batch.  Partitioning is
    preserved — no shuffle; at scale, repartition upstream so batches of
    large payloads fit worker memory and set
    spark.sql.execution.arrow.maxRecordsPerBatch accordingly.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                decoder = DECODERS.get(kind)
                if decoder is None:
                    raise ValueError(f"no decoder registered for kind {kind!r}")
                # schema is BinaryType: Arrow hands decoders real bytes;
                # anything else is schema drift and must fail loudly
                feats.append(decoder(None if payload is None else bytes(payload)))
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "content_hash": [f["content_hash"] for f in feats],
                    "embedding": [f["embedding"] for f in feats],
                    "width": pd.array(
                        [f.get("width") for f in feats], dtype="Int32"
                    ),
                    "height": pd.array(
                        [f.get("height") for f in feats], dtype="Int32"
                    ),
                    "channels": pd.array(
                        [f.get("channels") for f in feats], dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        [f.get("sample_rate") for f in feats], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [f.get("duration_ms") for f in feats], dtype="Int32"
                    ),
                }
            )
            yield out

    cols = media.select("media_id", "kind", "payload")
    return cols.mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes target dims through the decode path.

    The stub records the requested dims; a real decoder would return the
    resized payload.  Kept as a column transform so Catalyst can pipeline
    it with other projections.
    """
    return media.withColumn("target_width", F.lit(width)).withColumn(
        "target_height", F.lit(height)
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp.

    Pure plan arithmetic (sequence + explode, JVM-side); the actual frame
    grab happens in extract_features once a real video decoder is
    registered.
    """
    return (
        media.where(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms")
    )
