"""Multimodal plumbing: schema, mapInPandas batch shape, partition-parallel
feature extraction — real stdlib BMP/WAV decode for valid media bytes,
deterministic fake for everything else."""

import io
import struct
import wave

import numpy as np
import pytest

from pyspark.sql import functions as F

from debezium_server_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    audio_features_stub,
    decode_bmp,
    decode_wav,
    frame_sample_plan,
    image_features,
    resize_images,
)


def make_bmp(pixels: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 RGB array as a 24-bit uncompressed BMP —
    pure struct, no codec needed to CREATE the file."""
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    data_off = 54
    header = struct.pack("<2sIHHI", b"BM", data_off + row_bytes * h, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_bytes * h,
                       2835, 2835, 0, 0)
    body = b"".join(
        pixels[r][:, ::-1].tobytes() + b"\x00" * (row_bytes - w * 3)
        for r in range(h - 1, -1, -1)  # bottom-up rows, BGR order
    )
    return header + info + body


def make_wav(samples_i16: np.ndarray, rate: int = 16_000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples_i16.astype("<i2").tobytes())
    return buf.getvalue()


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, b"\x89PNG-fake-bytes-1", ("image", "png", 64, 64, None, None)),
        (2, b"\x89PNG-fake-bytes-2", ("image", "png", 32, 32, None, None)),
        (3, b"RIFF-fake-wav", ("audio", "wav", None, None, 4_000, 16_000)),
        (4, b"mp4-fake", ("video", "mp4", 640, 480, 3_500, None)),
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_image_features_deterministic(spark, media_df):
    imgs = media_df.filter("meta.media_type = 'image'")
    out1 = {r["media_id"]: (r["pixel_mean"], r["pixel_std"], r["n_bytes"])
            for r in image_features(imgs).collect()}
    out2 = {r["media_id"]: (r["pixel_mean"], r["pixel_std"], r["n_bytes"])
            for r in image_features(imgs.repartition(4)).collect()}
    assert out1 == out2  # partitioning must not change features
    assert out1[1] != out1[2]  # different bytes → different features
    assert out1[1][2] == len(b"\x89PNG-fake-bytes-1")


def test_resize_updates_meta_only(spark, media_df):
    # fake-PNG bytes aren't decodable → passthrough with target dims marked
    out = resize_images(media_df, 16, 16).filter("media_id = 1").first()
    assert out["meta"]["width"] == 16 and out["meta"]["height"] == 16
    assert bytes(out["content"]) == b"\x89PNG-fake-bytes-1"


def test_frame_sample_plan_fanout(spark, media_df):
    vid = media_df.filter("meta.media_type = 'video'")
    frames = frame_sample_plan(vid, every_ms=1000)
    rows = frames.orderBy("frame_idx").collect()
    assert [r["frame_ts_ms"] for r in rows] == [0, 1000, 2000]  # 3500ms @ 1fps


def test_audio_features_schema(spark, media_df):
    aud = audio_features_stub(media_df.filter("meta.media_type = 'audio'"))
    row = aud.first()
    assert 0.0 <= row["loudness"] <= 1.0
    assert aud.columns == ["media_id", "meta", "loudness"]


def test_decode_bmp_real_pixels():
    """The stdlib BMP decoder reproduces the exact pixel array, including
    4-byte row padding and bottom-up row order."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)  # w=3 → padded rows
    arr = decode_bmp(make_bmp(px))
    assert arr is not None and np.array_equal(arr, px)


def test_decode_bmp_rejects_non_media():
    assert decode_bmp(b"BM this is text that merely starts with BM") is None
    assert decode_bmp(b"\x89PNG-fake-bytes-1") is None
    assert decode_bmp(None) is None


def test_decode_wav_roundtrip():
    samples = np.array([16384, -16384] * 100)  # square wave at half scale
    decoded = decode_wav(make_wav(samples))
    assert decoded is not None
    got, rate = decoded
    assert rate == 16_000
    assert np.allclose(got, samples / 32768.0)
    assert decode_wav(b"RIFF-fake-wav") is None  # truncated → not audio


def test_image_features_real_bmp(spark):
    """End-to-end through mapInPandas: a real BMP decodes to its true
    pixel mean/std; non-image bytes in the same batch take the fake path."""
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:2] = 200  # half the pixels 200, half 0 → mean 100, std 100
    rows = [
        (1, make_bmp(px), ("image", "bmp", 4, 4, None, None)),
        (2, b"not an image", ("image", "png", 4, 4, None, None)),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in image_features(df).collect()}
    assert out[1]["pixel_mean"] == pytest.approx(100.0)
    assert out[1]["pixel_std"] == pytest.approx(100.0)
    assert 0 <= out[2]["pixel_mean"] <= 255  # fake stays in pixel range


def test_audio_features_real_wav(spark):
    """A real PCM WAV yields its true RMS loudness (square wave at half
    amplitude → RMS exactly 0.5)."""
    rows = [
        (1, make_wav(np.array([16384, -16384] * 1000)),
         ("audio", "wav", None, None, 125, 16_000)),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    row = audio_features(df).first()
    assert row["loudness"] == pytest.approx(0.5)


def test_kmeans_centroids_converge(spark):
    """k-means refresh for IVF: on well-separated synthetic clusters the
    trained centroids land on the true cluster means."""
    import itertools

    from pyspark.sql import functions as F

    from debezium_server_spark.operators.similarity import ivf_ann_topk, kmeans_centroids

    # two tight clusters around (0,...,0) and (10,...,10) in 4-d
    rows = []
    for i in range(20):
        base = 0.0 if i % 2 == 0 else 10.0
        rows.append((i, [base + (i % 5) * 0.01] * 4))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_centroids(df, k=2, iterations=4)
    cents = sorted(c[0] for c in cents)
    assert abs(cents[0] - 0.02) < 0.2 and abs(cents[1] - 10.02) < 0.2


def test_resize_images_real_bmp(spark):
    """The resize kernel actually resamples decodable payloads: a 4x4
    quadrant BMP downsized to 2x2 keeps one pixel per quadrant."""
    from debezium_server_spark.operators.multimodal import decode_bmp, resize_images

    px = np.zeros((4, 4, 3), np.uint8)
    px[:2, :2] = (255, 0, 0)
    px[:2, 2:] = (0, 255, 0)
    px[2:, :2] = (0, 0, 255)
    px[2:, 2:] = (255, 255, 0)
    bmp = make_bmp(px)
    df = spark.createDataFrame(
        [(1, bytearray(bmp), {"media_type": "image", "format": "bmp",
                              "width": 4, "height": 4, "duration_ms": None,
                              "sample_rate": None})],
        "media_id long, content binary, meta struct<media_type:string,format:string,"
        "width:int,height:int,duration_ms:bigint,sample_rate:int>",
    )
    row = resize_images(df, 2, 2).collect()[0]
    assert row["meta"]["width"] == 2 and row["meta"]["height"] == 2
    out = decode_bmp(bytes(row["content"]))
    assert out is not None and out.shape == (2, 2, 3)
    assert tuple(out[0, 0]) == (255, 0, 0)
    assert tuple(out[0, 1]) == (0, 255, 0)
    assert tuple(out[1, 0]) == (0, 0, 255)
    assert tuple(out[1, 1]) == (255, 255, 0)


def test_resize_images_passthrough_non_media(spark):
    """Undecodable payloads pass through byte-identical; only the target
    dims are marked (honest-stub behavior without a codec)."""
    from debezium_server_spark.operators.multimodal import resize_images

    payload = b"not an image at all"
    df = spark.createDataFrame(
        [(1, bytearray(payload), {"media_type": "image", "format": "png",
                                  "width": 9, "height": 9, "duration_ms": None,
                                  "sample_rate": None})],
        "media_id long, content binary, meta struct<media_type:string,format:string,"
        "width:int,height:int,duration_ms:bigint,sample_rate:int>",
    )
    row = resize_images(df, 2, 2).collect()[0]
    assert bytes(row["content"]) == payload
    assert row["meta"]["width"] == 2 and row["meta"]["height"] == 2
