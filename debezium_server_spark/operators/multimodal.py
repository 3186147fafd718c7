"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (BASELINE.json north star): media rides through the pipeline as
`binary` columns with a typed metadata struct — the same shape the
reference uses for vector/geometry payloads (opaque bytes + logical type,
FlussTypeConverter.java:83-86,210-211). Compute-heavy steps (decode,
resize, feature extraction, frame sampling) run as Arrow-batched
`mapInPandas` stages so each Python worker touches a whole column batch.

Decode dispatch, per row (not per import): a rich codec (PIL /
soundfile) is used when importable; otherwise a pure-stdlib decoder
handles the formats that need no codec (uncompressed BMP via struct,
PCM WAV via the `wave` module); bytes matching neither fall through to
a deterministic sha256 fake that preserves the full Spark-side contract
(schema, batch shape, partitioning). Format detection is
signature-validated (magic + internal size-field consistency), so
non-media payloads can't accidentally flip onto the real path — which
keeps the oracle entries (fed UTF-8 text bytes) byte-stable while real
media rows get real features.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Callable, Iterator

import numpy as np
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


_IMPORT_CACHE: dict[str, object] = {}


def try_import(name: str):
    # cached: a missing module raises ImportError on EVERY __import__
    # attempt (no sys.modules negative cache), and these probes sit on
    # the per-row decode path
    if name not in _IMPORT_CACHE:
        try:
            _IMPORT_CACHE[name] = __import__(name)
        except ImportError:
            _IMPORT_CACHE[name] = None
    return _IMPORT_CACHE[name]


def _fake_pixel_stats(content: bytes) -> tuple[float, float]:
    """Deterministic fake decode: derive 'pixel' mean/std from the bytes'
    sha256 — stable across runs/partitions, no codec needed."""
    h = hashlib.sha256(content or b"").digest()
    mean = struct.unpack(">I", h[:4])[0] / 2**32 * 255.0
    std = struct.unpack(">I", h[4:8])[0] / 2**32 * 128.0
    return mean, std  # full precision; callers round at the output edge


def decode_bmp(content: bytes) -> np.ndarray | None:
    """Pure-stdlib decode of an uncompressed 24/32-bit BMP.
    (8-bit BMPs are palette-indexed — indices aren't gray values, so they
    stay on the fake path rather than decode wrong.)

    Returns an HxWxC uint8 array, or None if the bytes are not a valid
    uncompressed BMP. Validation is strict (magic, header size, declared
    file size == actual, pixel array in bounds) so arbitrary text/binary
    payloads can't false-positive onto this path.
    """
    if content is None or len(content) < 54 or content[:2] != b"BM":
        return None
    try:
        file_size, _, data_off = struct.unpack_from("<III", content, 2)
        hdr_size, width, height, planes, bpp, compression = struct.unpack_from(
            "<IiiHHI", content, 14
        )
    except struct.error:
        return None
    if (
        file_size != len(content)
        or hdr_size < 40
        or planes != 1
        or compression != 0
        or bpp not in (24, 32)
        or width <= 0
        or height == 0
    ):
        return None
    flip = height > 0  # positive height = bottom-up row order
    height = abs(height)
    channels = bpp // 8
    row_bytes = (width * channels + 3) & ~3  # rows pad to 4 bytes
    if data_off + row_bytes * height > len(content):
        return None
    rows = [
        np.frombuffer(
            content, np.uint8, count=width * channels, offset=data_off + r * row_bytes
        ).reshape(width, channels)
        for r in range(height)
    ]
    img = np.stack(rows[::-1] if flip else rows)
    if channels >= 3:  # BMP stores BGR(A) — reorder to RGB(A)
        img = img[:, :, [2, 1, 0] + ([3] if channels == 4 else [])]
    return img


def decode_wav(content: bytes) -> tuple[np.ndarray, int] | None:
    """Pure-stdlib decode of a PCM WAV via the `wave` module.

    Returns (samples as float64 in [-1, 1], sample_rate), or None if the
    bytes are not a RIFF/WAVE container `wave` can parse.
    """
    if content is None or len(content) < 44 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(content)) as w:
            rate = w.getframerate()
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError):
        return None
    if width == 1:  # 8-bit PCM is unsigned
        samples = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        samples = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif width == 4:
        samples = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
    else:
        return None
    return samples, rate


def _image_stats(content: bytes) -> tuple[float, float]:
    """Pixel mean/std for one image payload: PIL when importable, else
    the stdlib BMP decoder, else the deterministic fake."""
    pil_image = try_import("PIL.Image")
    if pil_image is not None:  # pragma: no cover - codec not in container
        try:
            from PIL import Image

            arr = np.asarray(Image.open(io.BytesIO(content)))
            return float(arr.mean()), float(arr.std())
        except Exception:
            pass  # not an image PIL groks — fall through
    arr = decode_bmp(content)
    if arr is not None:
        return float(arr.mean()), float(arr.std())
    return _fake_pixel_stats(content)


def _audio_loudness(content: bytes) -> float:
    """RMS loudness in [0, 1]: soundfile when importable, else the stdlib
    WAV decoder, else the deterministic fake."""
    sf = try_import("soundfile")
    if sf is not None:  # pragma: no cover - codec not in container
        try:
            samples, _ = sf.read(io.BytesIO(content))
            return float(np.sqrt(np.mean(np.square(samples))))
        except Exception:
            pass
    decoded = decode_wav(content)
    if decoded is not None:
        samples, _ = decoded
        if samples.size == 0:
            return 0.0
        return float(np.sqrt(np.mean(np.square(samples))))
    return _fake_pixel_stats(content)[0] / 255.0


def decode_image_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-batch image decode → feature columns. Real decode (PIL or
    stdlib BMP) when the bytes are an image; deterministic fake otherwise."""
    stats = [_image_stats(c) for c in pdf["content"]]
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


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 RGB array as a 24-bit uncompressed BMP —
    pure struct, the write twin of `decode_bmp`."""
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    data_off = 54
    header = struct.pack("<2sIHHI", b"BM", data_off + row_bytes * h, 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_bytes * h, 2835, 2835, 0, 0
    )
    body = b"".join(
        pixels[r][:, ::-1].tobytes() + b"\x00" * (row_bytes - w * 3)
        for r in range(h - 1, -1, -1)  # bottom-up rows, BGR order
    )
    return header + info + body


def _resize_one(content: bytes, width: int, height: int) -> bytes | None:
    """Resize one image payload to (width, height), returning BMP bytes,
    or None when the payload isn't decodable (caller passes bytes
    through). PIL when importable; else the stdlib BMP path with
    nearest-neighbor sampling (integer index maps — no resample kernel
    needed, and deterministic across numpy versions)."""
    pil_image = try_import("PIL.Image")
    if pil_image is not None:  # pragma: no cover - codec not in container
        try:
            from PIL import Image

            img = Image.open(io.BytesIO(content)).convert("RGB")
            out = io.BytesIO()
            img.resize((width, height), Image.NEAREST).save(out, format="BMP")
            return out.getvalue()
        except Exception:
            pass  # not an image PIL groks — fall through
    arr = decode_bmp(content)
    if arr is None:
        return None
    h, w = arr.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    resized = arr[rows][:, cols][:, :, :3]
    return encode_bmp(np.ascontiguousarray(resized, dtype=np.uint8))


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize kernel via Arrow-batched mapInPandas: decodable payloads
    are re-encoded at (width, height) with meta dims updated; everything
    else passes through byte-identical with only the TARGET dims marked
    (the honest-stub behavior for codec-less formats). Same distributed
    shape as `image_features`: partition-parallel, media never leaves
    the executors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            resized = [_resize_one(c, width, height) for c in out["content"]]
            out["content"] = [
                r if r is not None else c for r, c in zip(resized, out["content"])
            ]
            out["meta"] = [
                {**(m or {}), "width": width, "height": height} for m in out["meta"]
            ]
            yield out

    return df.mapInPandas(run, schema=df.schema)


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


def decode_audio_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-batch audio decode → loudness. Real decode (soundfile or
    stdlib WAV) when the bytes are audio; deterministic fake otherwise."""
    out = pdf.copy()
    out["loudness"] = [_audio_loudness(c) for c in out["content"]]
    return out.drop(columns=["content"])


def audio_features(df: DataFrame) -> DataFrame:
    """Audio features via Arrow-batched mapInPandas (same distributed
    shape as `image_features`: partition-parallel, media never collected)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_audio_batch(pdf)

    return df.mapInPandas(
        run,
        schema="media_id long, meta struct<media_type:string,format:string,"
        "width:int,height:int,duration_ms:bigint,sample_rate:int>, loudness double",
    )


#: Back-compat alias (pre-round-2 name).
audio_features_stub = audio_features


DecodeFn = Callable[[pd.DataFrame], pd.DataFrame]

DECODE_REGISTRY: dict[str, DecodeFn] = {
    "image": decode_image_batch,
    "audio": decode_audio_batch,
}
