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
    assert all(0.0 <= x <= 1.0 for x in out[1]["embedding"])
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


# ---- real pixel/sample-level embeddings (uncompressed formats) ----

# 2x2 test scene: red, green, blue, white — stats hand-computed below.
SCENE = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]


def make_ppm(pixels, width, height, maxval=255, comment=False) -> bytes:
    """Binary P6 bytes assembled by hand — independent of the decoder."""
    hdr = b"P6\n" + (b"# test comment\n" if comment else b"")
    hdr += b"%d %d\n%d\n" % (width, height, maxval)
    return hdr + bytes(v for px in pixels for v in px)


def make_bmp(pixels, width, height, top_down=False) -> bytes:
    """24-bit BI_RGB BMP bytes assembled by hand: BGR rows, 4-byte
    padded, bottom-up unless top_down."""
    stride = (width * 3 + 3) & ~3
    rows = [pixels[y * width : (y + 1) * width] for y in range(height)]
    if not top_down:
        rows = rows[::-1]
    raster = b"".join(
        bytes(v for (r, g, b) in row for v in (b, g, r)).ljust(stride, b"\x00")
        for row in rows
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, -height if top_down else height,
        1, 24, 0, len(raster), 2835, 2835, 0, 0,
    )
    file_hdr = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    return file_hdr + info + raster


def scene_expected_embedding():
    """The SCENE stats derived with plain-Python arithmetic, independent
    of the numpy implementation under test."""
    px = [tuple(v / 255.0 for v in p) for p in SCENE]
    n = len(px)
    means = [sum(p[c] for p in px) / n for c in range(3)]
    luma = [0.299 * r + 0.587 * g + 0.114 * b for r, g, b in px]
    mu = sum(luma) / n
    std = (sum((v - mu) ** 2 for v in luma) / n) ** 0.5
    hist = [0.0] * 4
    for v in luma:
        hist[min(int(v * 4), 3)] += 1 / n
    return [*means, std, *hist]


def test_ppm_real_pixel_embedding():
    f = multimodal.ppm_decode(make_ppm(SCENE, 2, 2, comment=True))
    assert (f["width"], f["height"]) == (2, 2)
    assert f["embedding_real"] is True
    want = scene_expected_embedding()
    assert f["embedding"] == pytest.approx(want, abs=1e-12)
    # maxval rescale: the same scene at maxval 51 (values /5) must give
    # the same embedding after the decoder's 255/maxval rescale
    scaled = [tuple(v // 5 for v in p) for p in SCENE]
    f51 = multimodal.ppm_decode(make_ppm(scaled, 2, 2, maxval=51))
    assert f51["embedding"] == pytest.approx(want, abs=1e-12)


def test_ppm_rejects_malformed():
    with pytest.raises(ValueError, match="bad magic"):
        multimodal.ppm_decode(b"P5\n2 2\n255\n" + bytes(4))
    with pytest.raises(ValueError, match="maxval"):
        multimodal.ppm_decode(b"P6\n2 2\n65535\n" + bytes(24))
    with pytest.raises(ValueError, match="truncated raster"):
        multimodal.ppm_decode(make_ppm(SCENE, 2, 2)[:-5])
    with pytest.raises(ValueError, match="truncated header"):
        multimodal.ppm_decode(b"P6\n2 2")
    with pytest.raises(ValueError, match="NULL"):
        multimodal.ppm_decode(None)


def test_bmp_matches_ppm_pixels():
    """Same scene through the BMP path (BGR, bottom-up, padded stride)
    and the top-down variant -> identical real embedding."""
    want = scene_expected_embedding()
    for td in (False, True):
        f = multimodal.bmp_decode(make_bmp(SCENE, 2, 2, top_down=td))
        assert (f["width"], f["height"]) == (2, 2)
        assert f["embedding_real"] is True
        assert f["embedding"] == pytest.approx(want, abs=1e-12)


def test_bmp_rejects_unsupported():
    bad_bpp = bytearray(make_bmp(SCENE, 2, 2))
    bad_bpp[28:30] = struct.pack("<H", 8)
    with pytest.raises(ValueError, match="unsupported BMP shape"):
        multimodal.bmp_decode(bytes(bad_bpp))
    with pytest.raises(ValueError, match="truncated pixel array"):
        multimodal.bmp_decode(make_bmp(SCENE, 2, 2)[:-3])
    with pytest.raises(ValueError, match="bad signature"):
        multimodal.bmp_decode(b"XX" + bytes(60))


def test_wav_real_sample_embedding():
    """A +/-0.25 square wave has exact closed-form stats: rms = mean_abs
    = peak = 0.25, zcr = 1.0, all |amplitude| mass in quartile bin 1."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(
            b"".join(struct.pack("<h", 8192 if i % 2 == 0 else -8192) for i in range(400))
        )
    f = multimodal.wav_decode(buf.getvalue())
    assert f["embedding_real"] is True
    assert f["embedding"] == pytest.approx(
        [0.25, 0.25, 1.0, 0.25, 0.0, 1.0, 0.0, 0.0], abs=1e-12
    )


def png_filter_rows(px, filters):
    """Forward-filter an (h, w, 3) uint8 array per PNG spec — the
    encoder side, implemented independently of the decoder under test."""
    h, w, _ = px.shape
    out = bytearray()
    prev = bytes(w * 3)
    for y, f in zip(range(h), filters):
        raw = bytes(px[y].reshape(-1))
        line = bytearray([f])
        for i in range(len(raw)):
            a = raw[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            line.append((raw[i] - pred) & 0xFF)
        out += line
        prev = raw
    return bytes(out)


def make_rgb_png(px, filters) -> bytes:
    """Valid RGB8 PNG with the given per-row filter types."""

    def chunk(tag, data):
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(png_filter_rows(px, filters)))
        + chunk(b"IEND", b"")
    )


def test_png_pixels_all_filters():
    """Round-trip a deterministic RGB image through every PNG filter
    type (None/Sub/Up/Average/Paeth) — decode must recover the exact
    pixel array the independent test-side encoder filtered."""
    import numpy as np

    h, w = 5, 7
    px = np.array(
        [[( (3 * x + 11 * y) % 256, (7 * x * y + 5) % 256, (x * x + y) % 256)
           for x in range(w)] for y in range(h)],
        dtype=np.uint8,
    )
    got = multimodal.png_pixels(make_rgb_png(px, [0, 1, 2, 3, 4]))
    assert got.shape == (h, w, 3)
    assert (got == px).all()


def test_png_unsupported_shape_falls_back():
    """A valid 16-bit PNG keeps real dims but the stand-in embedding."""
    def chunk(tag, data):
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(4) for _ in range(2))
    png16 = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    f = multimodal.png_decode(png16)
    assert (f["width"], f["height"]) == (2, 2)
    assert f["embedding_real"] is False
    digest = hashlib.md5(png16).digest()
    assert f["embedding"] == pytest.approx([b / 256.0 for b in digest[:8]])


def test_embedding_real_flag_end_to_end(spark):
    """PPM/BMP/PNG/PCM-WAV rows come back embedding_real=true with
    pixel/sample stats; MP4 keeps the documented md5 stand-in."""
    rows = [
        (1, "image", make_ppm(SCENE, 2, 2), "image/x-portable-pixmap", None, None, None),
        (2, "image", make_bmp(SCENE, 2, 2), "image/bmp", None, None, None),
        (3, "image", PNG_64x48, "image/png", None, None, None),
        (4, "audio", WAV_8K_MONO_500MS, "audio/wav", None, None, None),
        (5, "video", MP4_3500MS, "video/mp4", None, None, None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in multimodal.extract_features(df).collect()}
    want = scene_expected_embedding()
    assert out[1]["embedding_real"] and out[2]["embedding_real"] and out[4]["embedding_real"]
    assert not out[5]["embedding_real"]
    assert list(out[1]["embedding"]) == pytest.approx(want, abs=1e-6)
    assert list(out[2]["embedding"]) == pytest.approx(want, abs=1e-6)
    # the all-black grayscale test PNG now decodes for real: zero means,
    # zero luma std, all luma mass in the darkest quartile bin
    assert out[3]["embedding_real"]
    assert list(out[3]["embedding"]) == pytest.approx(
        [0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0], abs=1e-6
    )
