"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schemas, partitioning, Arrow batch shapes,
mapInPandas signatures — is real and tested, and so is every default
decoder's header layer: PNG (signature + CRC-checked IHDR -> width/
height), WAV (RIFF chunk walk -> channels/sample_rate/duration_ms) and
MP4 (ISO-BMFF box walk -> mvhd duration).

The `embedding` column is REAL — actual pixel / sample statistics, no
codec library needed — for the uncompressed formats:

  * image PPM (P6)  -> pixel_embedding over the raw RGB plane
  * image BMP 24bpp -> pixel_embedding over the raw BGR plane
  * image PNG       -> pixel_embedding after stdlib-zlib inflate +
                       scanline unfilter (8-bit gray/RGB/RGBA,
                       non-interlaced; see png_pixels)
  * audio WAV PCM16 -> sample_embedding over the int16 samples

and a clearly-documented deterministic md5 stand-in for the shapes
that genuinely need a codec (palette/16-bit/interlaced PNG, MP4
frames, compressed WAV) — register one in place:

    multimodal.DECODERS["image"] = my_pil_decoder

Each decoder takes bytes and returns a dict of feature columns including
`embedding_real` (True when the embedding came from decoded pixels or
samples).  Decoders never silently null — malformed bytes raise.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
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
        StructField("embedding_real", BooleanType()),
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
        "embedding_real": False,
    }


def pixel_embedding(rgb: np.ndarray) -> list[float]:
    """Real 8-dim visual embedding from a decoded (h, w, 3) uint8 plane.

    [mean_r, mean_g, mean_b, luma_std, luma quartile-bin fractions x4],
    all in [0, 1].  Rec.601 luma weights; the quartile bins make the
    vector a coarse luma histogram, so near-identical renders of the same
    scene land near each other under the cosine/LSH near-dup operators
    (dedup.embedding_near_dups, similarity.ann_topk) while the channel
    means separate palette-shifted copies.
    """
    px = rgb.reshape(-1, 3).astype(np.float64) / 255.0
    luma = px @ np.array([0.299, 0.587, 0.114])
    hist = np.histogram(luma, bins=4, range=(0.0, 1.0))[0] / len(luma)
    return [
        float(v)
        for v in (*px.mean(axis=0), luma.std(), *hist)
    ]


def sample_embedding(samples: np.ndarray) -> list[float]:
    """Real 8-dim audio embedding from decoded PCM samples in [-1, 1].

    [rms, mean_abs, zero-crossing rate, peak, |amplitude| quartile-bin
    fractions x4] — the audio analog of pixel_embedding: loudness shape
    plus a coarse envelope histogram, cheap enough to run inline in the
    Arrow batch without a codec or FFT library.
    """
    s = samples.astype(np.float64)
    zcr = float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1]))) if len(s) > 1 else 0.0
    amp = np.abs(s)
    hist = np.histogram(amp, bins=4, range=(0.0, 1.0))[0] / max(len(s), 1)
    return [
        float(np.sqrt(np.mean(s**2))),
        float(amp.mean()),
        zcr,
        float(amp.max(initial=0.0)),
        *(float(v) for v in hist),
    ]


def png_decode(payload: bytes) -> dict:
    """Real image decoder: pure-Python PNG signature + IHDR parse.

    No codec library needed for header-level features: the 8-byte PNG
    signature, the mandatory first chunk (13-byte IHDR, CRC-verified)
    and its big-endian width/height (PNG spec §5.2/§11.2.2).  Malformed
    payloads raise — schema drift and corrupt blobs must fail loudly,
    not propagate NULL dims.  For 8-bit gray/RGB/RGBA non-interlaced
    payloads the embedding is REAL pixel statistics via png_pixels
    (stdlib zlib inflate + scanline unfilter); palette/16-bit/
    interlaced shapes keep the stand-in until a codec is registered.
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
    try:
        feats["embedding"] = pixel_embedding(png_pixels(payload))
        feats["embedding_real"] = True
    except UnsupportedMediaShape:
        pass  # valid but codec-needing shape: keep the documented stand-in
    return feats


class UnsupportedMediaShape(ValueError):
    """A VALID payload in a shape this codec-free decoder doesn't cover
    (palette/16-bit/interlaced PNG, ...): header features stay real, the
    embedding falls back to the documented stand-in.  Malformed payloads
    raise plain ValueError and fail the job loudly."""


def png_pixels(payload: bytes) -> "np.ndarray":
    """Decode PNG pixels to an (h, w, 3) uint8 RGB plane — pure Python.

    zlib (stdlib) inflates the IDAT stream; the five scanline filters
    (PNG spec §9: None/Sub/Up/Average/Paeth) are undone per row.  The
    codec-free shapes are supported: bit depth 8, color type 0 (gray),
    2 (RGB) or 6 (RGBA, alpha dropped), non-interlaced.  Palette,
    16-bit and Adam7 payloads raise — register a real codec for those.
    Sub/Average/Paeth recurrences are per-pixel sequential by
    definition; Up is vectorized.  Fine for bench fixtures — at scale a
    registered native codec replaces this whole function.
    """
    if len(payload) < 33 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG: bad signature")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length = int.from_bytes(payload[pos : pos + 4], "big")
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("not a PNG: truncated chunk")
        if tag == b"IHDR":
            width = int.from_bytes(body[0:4], "big")
            height = int.from_bytes(body[4:8], "big")
            depth, color, interlace = body[8], body[9], body[12]
            if depth != 8 or color not in (0, 2, 6) or interlace != 0:
                raise UnsupportedMediaShape(
                    f"unsupported PNG shape (depth={depth}, color_type={color}, "
                    f"interlace={interlace}); register a real codec"
                )
            ch = {0: 1, 2: 3, 6: 4}[color]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("not a PNG: missing IHDR or IDAT")
    import zlib

    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError("not a PNG: IDAT size does not match dimensions")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f, line = rows[y, 0], rows[y, 1:].astype(np.int32)
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = line + prev
        elif f in (1, 3, 4):  # Sub / Average / Paeth: left-recurrent
            cur = line.copy()
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = int(prev[i])
                if f == 1:
                    cur[i] += a
                elif f == 3:
                    cur[i] += (int(a) + b) // 2
                else:
                    c = int(prev[i - ch]) if i >= ch else 0
                    p = int(a) + b - c
                    pa, pb, pc = abs(p - int(a)), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    cur[i] += pred
                cur[i] &= 0xFF
        else:
            raise ValueError(f"not a PNG: unknown filter type {f}")
        prev = (cur & 0xFF).astype(np.uint8)
        out[y] = prev
    px = out.reshape(height, width, ch)
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3]


def ppm_decode(payload: bytes) -> dict:
    """Real image decoder INCLUDING pixels: binary PPM (P6).

    PPM stores the RGB plane uncompressed, so a pure-Python parse yields
    actual pixel values with no codec library: header is `P6`, then
    whitespace-separated width/height/maxval tokens (with `#` comments),
    one whitespace byte, then width*height*3 raw samples.  The embedding
    is computed from the decoded pixels (pixel_embedding) — real, not the
    md5 stand-in.  Maxval > 255 (2-byte samples) is rejected rather than
    half-supported; malformed bytes raise.
    """
    if payload is None:
        raise ValueError("cannot decode NULL payload")
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM: bad magic")

    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("not a P6 PPM: truncated header")
        c = payload[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
        elif c.isdigit():
            start = pos
            while pos < len(payload) and payload[pos : pos + 1].isdigit():
                pos += 1
            tokens.append(int(payload[start:pos]))
        else:
            raise ValueError("not a P6 PPM: junk in header")
    width, height, maxval = tokens
    if width == 0 or height == 0:
        raise ValueError("PPM has a zero dimension")
    if not 0 < maxval < 256:
        raise ValueError(f"unsupported PPM maxval {maxval} (need 1..255)")
    pos += 1  # the single whitespace byte after maxval
    raster = payload[pos : pos + width * height * 3]
    if len(raster) < width * height * 3:
        raise ValueError("not a P6 PPM: truncated raster")
    rgb = np.frombuffer(raster, dtype=np.uint8).reshape(height, width, 3)
    if maxval != 255:  # rescale so the embedding is comparable across maxvals
        rgb = (rgb.astype(np.float64) * (255.0 / maxval)).round().astype(np.uint8)
    feats = _fake_decode(payload)
    feats["width"] = width
    feats["height"] = height
    feats["embedding"] = pixel_embedding(rgb)
    feats["embedding_real"] = True
    return feats


def bmp_decode(payload: bytes) -> dict:
    """Real image decoder INCLUDING pixels: uncompressed 24-bit BMP.

    BITMAPFILEHEADER ('BM', pixel-array offset at byte 10) +
    BITMAPINFOHEADER (size >= 40: little-endian signed width/height,
    bit_count, compression).  Only the codec-free shape is accepted —
    24 bpp, BI_RGB — and rows are stored bottom-up (top-down when height
    is negative) in BGR order, padded to 4-byte boundaries.  The
    embedding is computed from the decoded pixels; anything compressed
    or paletted raises so a real codec can be registered instead.
    """
    if payload is None:
        raise ValueError("cannot decode NULL payload")
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP: bad signature")
    pixel_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError("not a BMP: BITMAPINFOHEADER shorter than 40 bytes")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bit_count = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bit_count != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP shape (bpp={bit_count}, compression={compression}); "
            "register a real codec for compressed/paletted BMPs"
        )
    if width <= 0 or height == 0:
        raise ValueError("BMP has a non-positive width or zero height")
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    raster = payload[pixel_off : pixel_off + stride * height]
    if len(raster) < stride * height:
        raise ValueError("not a BMP: truncated pixel array")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(height, stride)
    bgr = rows[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        bgr = bgr[::-1]
    feats = _fake_decode(payload)
    feats["width"] = width
    feats["height"] = height
    feats["embedding"] = pixel_embedding(bgr[:, :, ::-1])
    feats["embedding_real"] = True
    return feats


def image_decode(payload: bytes) -> dict:
    """Default image decoder: dispatch on magic bytes.

    PPM/BMP payloads get real pixel embeddings from the uncompressed
    planes; PNG gets them via stdlib zlib + scanline unfilter for the
    8-bit non-interlaced shapes (png_pixels), falling back to the
    documented stand-in for palette/16-bit/interlaced payloads.
    """
    if payload is None:
        raise ValueError("cannot decode NULL payload")
    if payload[:2] == b"P6":
        return ppm_decode(payload)
    if payload[:2] == b"BM":
        return bmp_decode(payload)
    return png_decode(payload)


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
    """Real audio decoder: pure-Python RIFF/WAVE chunk walk, and for the
    codec-free shape — PCM (format 1), 16-bit — real SAMPLE-level
    features too: the int16 data chunk is parsed and the embedding is
    computed from the decoded waveform (sample_embedding), not the md5
    stand-in.  Compressed WAVs (format != 1) and other bit depths keep
    the header features + stand-in embedding until a codec is registered.
    Malformed payloads raise — corrupt blobs must fail loudly.
    """
    if payload is None:
        raise ValueError("cannot decode NULL payload")
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos, fmt, data = 12, None, None
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
                "format": int.from_bytes(body[0:2], "little"),
                "channels": int.from_bytes(body[2:4], "little"),
                "sample_rate": int.from_bytes(body[4:8], "little"),
                "byte_rate": int.from_bytes(body[8:12], "little"),
                "bits": int.from_bytes(body[14:16], "little"),
            }
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("not a WAV: missing fmt or data chunk")
    if 0 in (fmt["channels"], fmt["sample_rate"], fmt["byte_rate"]):
        raise ValueError("WAV fmt has a zero field")
    feats = _fake_decode(payload)
    feats["channels"] = fmt["channels"]
    feats["sample_rate"] = fmt["sample_rate"]
    feats["duration_ms"] = round(len(data) * 1000 / fmt["byte_rate"])
    if fmt["format"] == 1 and fmt["bits"] == 16 and len(data) >= 2:
        samples = np.frombuffer(data[: len(data) & ~1], dtype="<i2")
        feats["embedding"] = sample_embedding(samples / 32768.0)
        feats["embedding_real"] = True
    return feats


DECODERS: dict[str, Callable[[bytes], dict]] = {
    "image": image_decode,
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
                    "embedding_real": [f.get("embedding_real", False) for f in feats],
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
