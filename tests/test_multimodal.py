"""Multimodal plumbing: schema, mapInPandas batch shape, partition-parallel
feature extraction with the deterministic fake decode."""

import pytest

from pyspark.sql import functions as F

from debezium_server_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    audio_features_stub,
    frame_sample_plan,
    image_features,
    resize_stub,
)


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
    out = resize_stub(media_df, 16, 16).filter("media_id = 1").first()
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
