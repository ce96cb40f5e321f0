"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a metadata
struct; decode/feature-extraction runs as Arrow-batched ``mapInPandas``
so each task processes whole record batches (the only sane shape for
per-item Python work at scale — never row-at-a-time UDFs).

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_stub`` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces a deterministic fake feature
vector from the payload bytes. Everything around it — schema, batch
iteration, partition-parallel execution, output contract — is real and
tested, so swapping in PIL/librosa later only touches the marked stub.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_stub(payload: bytes, media_type: str, dim: int = 8, fake: bool = True) -> list[float]:
    """STUB for the real decoder (PIL/torchaudio/ffmpeg not available here).

    fake=True → deterministic feature vector derived from payload bytes
    (stable across runs/partitions, good enough to test the plumbing).
    fake=False → the honest NotImplementedError a production deploy would
    replace with a real decode.
    """
    if not fake:
        raise NotImplementedError("media decoding requires image/audio libs not in this container")
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] * 31 + b) % 997
    return [v / 997.0 for v in acc]


def extract_features(df: DataFrame, dim: int = 8, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over media rows (mapInPandas).

    The UDF signature (iterator of pandas batches → iterator of batches)
    keeps memory bounded per task regardless of partition size; partition
    parallelism is Spark's, untouched.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "feature": [
                        decode_stub(p, t, dim=dim)
                        for p, t in zip(pdf["payload"], pdf["media_type"])
                    ],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_stub(payload: bytes, w: int, h: int, fake: bool = True) -> bytes:
    """STUB for image resize (no PIL in this container). fake=True →
    deterministic byte transform sized w*h//64 so the output scales with
    the target dims; fake=False → honest NotImplementedError."""
    if not fake:
        raise NotImplementedError("image resize requires PIL/opencv, not in this container")
    if payload is None:
        return b""
    out_len = max(w * h // 64, 1)
    src = payload or b"\x00"
    return bytes(src[i % len(src)] for i in range(out_len))


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Batch image resize over media rows (mapInPandas, Arrow batches).
    Only image rows are transformed; the filter prunes at the scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": [resize_stub(p, width, height) for p in pdf["payload"]],
                }
            )

    return df.where(F.col("media_type") == "image").mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    (fan-out inside mapInPandas keeps the decode adjacent to the payload —
    no shuffle; frame extraction itself is the stubbed decode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                n_frames = max(int(dur or 0) // every_ms, 1)
                src = payload or b"\x00"
                for k in range(n_frames):
                    ids.append(mid)
                    idxs.append(k)
                    tss.append(k * every_ms)
                    # stubbed frame decode: deterministic 16-byte slice
                    frames.append(bytes(src[(k * 7 + j) % len(src)] for j in range(16)))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_ts_ms": tss, "frame": frames}
            )

    return df.where(F.col("media_type") == "video").mapInPandas(run, schema=FRAME_SCHEMA)


def fake_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (payload = patterned
    bytes; sizes vary by id)."""
    rows = []
    for i in range(n):
        payload = bytes((i * 7 + j) % 251 for j in range(32 + (i % 5) * 16))
        mt = ("image", "audio", "video")[i % 3]
        rows.append((i, payload, mt, 64 + i % 8, 48 + i % 6, 1000 + i))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
