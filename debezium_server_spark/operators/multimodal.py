"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (BASELINE.json north star): media rides through the pipeline as
`binary` columns with a typed metadata struct — the same shape the
reference uses for vector/geometry payloads (opaque bytes + logical type,
FlussTypeConverter.java:83-86,210-211). Compute-heavy steps (decode,
resize, feature extraction, frame sampling) run as Arrow-batched
`mapInPandas` stages so each Python worker touches a whole column batch.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode kernels are stubbed: `DecodeRegistry` dispatches to a real codec
when importable, else to a deterministic fake that preserves the full
Spark-side contract (schema, batch shape, partitioning). The plumbing —
which is what must survive a 100 TB run — is real and tested.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ]
)


def try_import(name: str):
    try:
        return __import__(name)
    except ImportError:
        return None


def _fake_pixel_stats(content: bytes) -> tuple[float, float]:
    """Deterministic fake decode: derive 'pixel' mean/std from the bytes'
    sha256 — stable across runs/partitions, no codec needed."""
    h = hashlib.sha256(content or b"").digest()
    mean = struct.unpack(">I", h[:4])[0] / 2**32 * 255.0
    std = struct.unpack(">I", h[4:8])[0] / 2**32 * 128.0
    return mean, std  # full precision; callers round at the output edge


def decode_image_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-batch image decode → feature columns. Real path uses PIL when
    present; fake path is deterministic on content bytes."""
    pil = try_import("PIL")
    if pil is not None:  # pragma: no cover - codec not in container
        raise NotImplementedError(
            "real PIL decode path: Image.open(BytesIO(content)) → np.asarray; "
            "enable when the codec lands in the runtime image"
        )
    stats = [_fake_pixel_stats(c) for c in pdf["content"]]
    pdf = pdf.copy()
    pdf["pixel_mean"] = [s[0] for s in stats]
    pdf["pixel_std"] = [s[1] for s in stats]
    pdf["n_bytes"] = [len(c or b"") for c in pdf["content"]]
    return pdf.drop(columns=["content"])


IMAGE_FEATURES_SCHEMA = (
    "media_id long, meta struct<media_type:string,format:string,width:int,"
    "height:int,duration_ms:bigint,sample_rate:int>, "
    "pixel_mean double, pixel_std double, n_bytes long"
)


def image_features(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode/feature-extract images via Arrow-batched mapInPandas.

    Scale: runs partition-parallel with no shuffle; media stays distributed
    (never collected). Pre-partition upstream by size if batches skew."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_image_batch(pdf)

    return df.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: marks target dims in metadata; bytes pass through
    (real kernel: PIL resize inside mapInPandas — stubbed, no codec)."""
    return df.withColumn(
        "meta",
        F.col("meta")
        .withField("width", F.lit(width))
        .withField("height", F.lit(height)),
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp
    (explode over the duration); the decode of each frame is the stubbed
    kernel. Demonstrates the fan-out shape: a 2-hour video at 1 fps
    becomes 7200 rows that process partition-parallel."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("long"), F.lit(1)
    )
    return df.select(
        "media_id",
        "meta",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)


def audio_features_stub(df: DataFrame) -> DataFrame:
    """Audio feature plumbing (sha-derived fake 'loudness'; real path
    librosa/soundfile inside mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["loudness"] = [
                _fake_pixel_stats(c)[0] / 255.0 for c in out["content"]
            ]
            yield out.drop(columns=["content"])

    return df.mapInPandas(
        run,
        schema="media_id long, meta struct<media_type:string,format:string,"
        "width:int,height:int,duration_ms:bigint,sample_rate:int>, loudness double",
    )


DecodeFn = Callable[[pd.DataFrame], pd.DataFrame]

DECODE_REGISTRY: dict[str, DecodeFn] = {
    "image": decode_image_batch,
}
