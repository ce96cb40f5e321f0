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
from ..session import local_df

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
    return local_df(spark, rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# RAW-bitmap path: REAL decode / resize / frame math (numpy only).
#
# The stubs above stand in for COMPRESSED formats (jpeg/mp3/mp4 need PIL /
# ffmpeg, absent here).  Raw bitmaps need no codec: an image payload is
# width*height grayscale bytes, a video payload is n_frames such bitmaps
# concatenated, an audio payload is little-endian int16 PCM samples.  For
# these, decode IS byte reinterpretation and the math below (bilinear
# resize, frame slicing, intensity statistics) is the real operation a
# production pipeline runs after its codec stage — so everything from the
# Arrow batch boundary inward is genuine, not a placeholder.
# ---------------------------------------------------------------------------


def decode_raw(payload: bytes, media_type: str, width: int, height: int):
    """Reinterpret a raw payload as pixel/sample arrays (REAL decode for
    uncompressed data; compressed formats go through ``decode_stub``).

    image → uint8 array (height, width); video → uint8 array
    (n_frames, height, width); audio → int16 1-D sample array.
    Raises ``ValueError`` on a size mismatch instead of guessing."""
    import numpy as np

    if payload is None:
        raise ValueError("null payload")
    buf = np.frombuffer(payload, dtype=np.uint8)
    if media_type == "image":
        if buf.size != width * height:
            raise ValueError(f"image payload {buf.size}B != {width}x{height}")
        return buf.reshape(height, width)
    if media_type == "video":
        frame = width * height
        if frame == 0 or buf.size % frame:
            raise ValueError(f"video payload {buf.size}B not a multiple of {frame}")
        return buf.reshape(-1, height, width)
    if media_type == "audio":
        if buf.size % 2:
            raise ValueError("audio payload has odd byte length for int16 PCM")
        return np.frombuffer(payload, dtype="<i2")
    raise ValueError(f"unknown media_type {media_type!r}")


def bilinear_resize(img, out_w: int, out_h: int):
    """Real bilinear resample of a (h, w) uint8 array to (out_h, out_w) —
    the standard align_corners=False pixel-center mapping, vectorized
    numpy, deterministic.  This is the actual math PIL's BILINEAR does."""
    import numpy as np

    h, w = img.shape
    src = img.astype(np.float64)
    # target pixel centers mapped into source coordinates
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    fx = np.clip(xs - x0, 0.0, 1.0)
    fy = np.clip(ys - y0, 0.0, 1.0)
    top = src[y0][:, x0] * (1 - fx) + src[y0][:, x1] * fx
    bot = src[y1][:, x0] * (1 - fx) + src[y1][:, x1] * fx
    out = top * (1 - fy)[:, None] + bot * fy[:, None]
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def raw_media_df(spark, n: int = 64) -> DataFrame:
    """Synthetic RAW media table: payloads are real uncompressed bitmaps /
    PCM whose bytes decode_raw() reinterprets exactly — gradients and
    checkerboards for images/video frames, a sawtooth for audio.
    Deterministic in (i, width, height)."""
    rows = []
    for i in range(n):
        w, h = 16 + (i % 4) * 4, 12 + (i % 3) * 4
        mt = ("image", "audio", "video")[i % 3]
        if mt == "image":
            payload = bytes(
                ((x * 255) // max(w - 1, 1) + y + i) % 256
                for y in range(h)
                for x in range(w)
            )
            dur = 0
        elif mt == "video":
            n_frames = 2 + i % 3
            payload = bytes(
                (((x + y + f * 8 + i) % 2) * 255)
                for f in range(n_frames)
                for y in range(h)
                for x in range(w)
            )
            dur = n_frames * 500
        else:  # audio: int16 LE sawtooth
            samples = 256 + (i % 7) * 64
            payload = b"".join(
                int((s * 257 + i * 13) % 4096 - 2048).to_bytes(2, "little", signed=True)
                for s in range(samples)
            )
            dur = samples  # 1 kHz
        rows.append((i, payload, mt, w, h, dur))
    return local_df(spark, rows, MEDIA_SCHEMA)


RAW_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_values", T.LongType()),
        T.StructField("mean_milli", T.LongType()),
        T.StructField("edge_milli", T.LongType()),
        T.StructField("hist", T.ArrayType(T.LongType())),
    ]
)


def extract_features_raw(df: DataFrame, bins: int = 8) -> DataFrame:
    """REAL feature extraction over raw payloads (mapInPandas, Arrow
    batches): per item the intensity mean and mean |horizontal gradient|
    (edge energy) in exact integer milli-units, plus the ``bins``-bucket
    value histogram — the decode is ``decode_raw``, the statistics are the
    statistics.  Integer outputs → hash-stable across runs and engines."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "media_type", "n_values", "mean_milli", "edge_milli", "hist")}
            for mid, p, mt, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"], pdf["width"], pdf["height"]
            ):
                arr = decode_raw(p, mt, int(w), int(h))
                flat = arr.astype(np.int64).ravel()
                if mt == "audio":
                    lo, hi = -32768, 32768
                    edge = int(np.abs(np.diff(flat)).sum()) * 1000 // max(flat.size - 1, 1)
                else:
                    lo, hi = 0, 256
                    img2d = arr.reshape(-1, arr.shape[-1])
                    d = np.abs(np.diff(img2d.astype(np.int64), axis=1))
                    edge = int(d.sum()) * 1000 // max(d.size, 1)
                histo = np.histogram(flat, bins=bins, range=(lo, hi))[0]
                out["media_id"].append(mid)
                out["media_type"].append(mt)
                out["n_values"].append(int(flat.size))
                out["mean_milli"].append(int(flat.sum()) * 1000 // flat.size)
                out["edge_milli"].append(edge)
                out["hist"].append([int(v) for v in histo])
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=RAW_FEATURE_SCHEMA)


def resize_images_raw(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL bilinear image resize over raw grayscale payloads — output
    payload is the actual resized bitmap (width*height bytes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": [
                        bilinear_resize(
                            decode_raw(p, "image", int(w), int(h)), width, height
                        ).tobytes()
                        for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
                    ],
                }
            )

    return df.where(F.col("media_type") == "image").mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames_raw(df: DataFrame, every_ms: int = 500, frame_ms: int = 500) -> DataFrame:
    """REAL frame sampling from raw video payloads: the payload is
    n_frames concatenated bitmaps, a sampled frame is the actual
    width*height byte slice at its index — fan-out stays inside
    mapInPandas (no shuffle), one row per sampled frame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            stride = max(every_ms // frame_ms, 1)
            for mid, p, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                vid = decode_raw(p, "video", int(w), int(h))
                for k in range(0, vid.shape[0], stride):
                    ids.append(mid)
                    idxs.append(k)
                    tss.append(k * frame_ms)
                    frames.append(vid[k].tobytes())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_ts_ms": tss, "frame": frames}
            )

    return df.where(F.col("media_type") == "video").mapInPandas(run, schema=FRAME_SCHEMA)


def raw_media_with_variants(
    spark, n: int = 64, n_variants: int = 8, noise: int = 2
) -> DataFrame:
    """``raw_media_df`` plus PLANTED near-duplicate image variants: for the
    first ``n_variants`` image ids a copy under ``media_id + 1000`` whose
    pixels carry a deterministic ±``noise`` offset (pure function of
    (i, x, y) — no RNG, so the fixture is reproducible anywhere).  The
    multimodal-dedup fixture: visually identical, byte-different."""
    base = raw_media_df(spark, n)
    rows = []
    made = 0
    for i in range(n):
        if made >= n_variants:
            break
        w, h = 16 + (i % 4) * 4, 12 + (i % 3) * 4
        if ("image", "audio", "video")[i % 3] != "image":
            continue
        made += 1
        payload = bytes(
            min(
                max(
                    ((x * 255) // max(w - 1, 1) + y + i) % 256
                    + ((x * 7 + y * 13 + i) % (2 * noise + 1) - noise),
                    0,
                ),
                255,
            )
            for y in range(h)
            for x in range(w)
        )
        rows.append((i + 1000, payload, "image", w, h, 0))
    variants = local_df(spark, rows, MEDIA_SCHEMA)
    return base.unionByName(variants)


def perceptual_hashes(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """64-bit dHash + aHash per raw image (Arrow mapInPandas, zero
    shuffle): bilinear-downscale the decoded bitmap to 9×8 / 8×8, then
    dHash bit(y,x) = 1 iff px[y,x+1] > px[y,x] (horizontal gradient
    sign) and aHash bit = 1 iff px > mean.  Bits pack little-order into
    a signed int64 — the exact layout SimHash signatures use, so the
    banded candidate machinery (``similarity.band_pairs_64``) applies
    unchanged.  Perceptual hashes survive re-encoding/noise/resizing,
    which byte-level hashes don't — the multimodal dedup primitive."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("dhash", T.LongType()),
            T.StructField("ahash", T.LongType()),
        ]
    )

    def _pack(bits) -> int:
        return int(
            np.packbits(bits.astype(np.uint8).ravel(), bitorder="little")
            .view(np.int64)[0]
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, dhs, ahs = [], [], []
            for mid, p, w, h in zip(
                pdf[id_col], pdf["payload"], pdf["width"], pdf["height"]
            ):
                img = decode_raw(p, "image", int(w), int(h))
                g9 = bilinear_resize(img, 9, 8).astype(np.int64)
                dh = _pack(g9[:, 1:] > g9[:, :-1])
                g8 = bilinear_resize(img, 8, 8).astype(np.float64)
                ah = _pack(g8 > g8.mean())
                ids.append(mid)
                dhs.append(dh)
                ahs.append(ah)
            yield pd.DataFrame({id_col: ids, "dhash": dhs, "ahash": ahs})

    return df.where(F.col("media_type") == "image").mapInPandas(run, schema=out_schema)


def image_near_duplicates(
    df: DataFrame, max_hamming: int = 6, id_col: str = "media_id"
) -> DataFrame:
    """Image near-dup pairs by banded dHash matching: perceptual hashes →
    the shared 64-bit banding path (``similarity.band_pairs_64``, 8-bit
    bands: ≤7 flipped bits corrupt ≤7 of 8 bands, so every pair within
    ``max_hamming`` ≤ 7 shares a clean band — exact pigeonhole recall) →
    exact Hamming verify on candidates only.  Never an all-pairs product;
    the same shape as SimHash text dedup, reused on the media column."""
    from .similarity import band_pairs_64

    sig = perceptual_hashes(df, id_col).select(
        F.col(id_col).alias("_id"), F.col("dhash").alias("_sim")
    )
    return band_pairs_64(sig, band_bits=8).where(F.col("hamming") <= max_hamming)


def raw_audio_with_variants(spark, n: int = 64, n_variants: int = 8) -> DataFrame:
    """``raw_media_df`` plus PLANTED near-duplicate audio variants: for the
    first ``n_variants`` audio ids a copy under ``media_id + 2000`` whose
    int16 samples carry a deterministic small jitter (pure function of
    (i, s)) — a re-encode/noise stand-in that preserves the energy
    contour while changing every byte."""
    base = raw_media_df(spark, n)
    rows = []
    made = 0
    for i in range(n):
        if made >= n_variants:
            break
        if ("image", "audio", "video")[i % 3] != "audio":
            continue
        made += 1
        samples = 256 + (i % 7) * 64
        payload = b"".join(
            int(
                max(
                    min(
                        ((s * 257 + i * 13) % 4096 - 2048)
                        + ((s * 11 + i) % 17 - 8),
                        32767,
                    ),
                    -32768,
                )
            ).to_bytes(2, "little", signed=True)
            for s in range(samples)
        )
        rows.append((i + 2000, payload, "audio", 16 + (i % 4) * 4, 12 + (i % 3) * 4, samples))
    variants = local_df(spark, rows, MEDIA_SCHEMA)
    return base.unionByName(variants)


def audio_fingerprints(
    df: DataFrame, n_windows: int = 65, id_col: str = "media_id"
) -> DataFrame:
    """64-bit energy-contour fingerprints for raw int16 PCM audio (Arrow
    mapInPandas, zero shuffle): split each clip into ``n_windows`` equal
    windows, exact-integer energy (Σx²) per window, bit j = 1 iff
    energy[j+1] > energy[j] — the gradient-sign idea of dHash applied to
    the time axis, robust to amplitude jitter and byte-level re-encoding.
    Bits pack little-order into a signed int64, so the shared 64-bit
    banding machinery (``similarity.band_pairs_64``) applies unchanged."""
    import numpy as np

    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("ahash64", T.LongType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for mid, p in zip(pdf[id_col], pdf["payload"]):
                x = decode_raw(p, "audio", 0, 0).astype(np.int64)
                n = x.size
                bounds = [(w * n) // n_windows for w in range(n_windows + 1)]
                e = np.asarray(
                    [int((x[bounds[w] : bounds[w + 1]] ** 2).sum()) for w in range(n_windows)]
                )
                bits = (e[1:] > e[:-1]).astype(np.uint8)
                hs.append(int(np.packbits(bits, bitorder="little").view(np.int64)[0]))
                ids.append(mid)
            yield pd.DataFrame({id_col: ids, "ahash64": hs})

    return df.where(F.col("media_type") == "audio").mapInPandas(run, schema=out_schema)


def audio_near_duplicates(
    df: DataFrame, max_hamming: int = 6, id_col: str = "media_id"
) -> DataFrame:
    """Audio near-dup pairs by banded energy-contour matching — the same
    shape as ``image_near_duplicates`` on the audio column: fingerprints
    → 8-bit banding (pigeonhole-exact recall ≤7 flipped bits) → exact
    Hamming verify on candidates only."""
    from .similarity import band_pairs_64

    sig = audio_fingerprints(df, id_col=id_col).select(
        F.col(id_col).alias("_id"), F.col("ahash64").alias("_sim")
    )
    return band_pairs_64(sig, band_bits=8).where(F.col("hamming") <= max_hamming)


def raw_video_with_variants(spark, n: int = 64, n_variants: int = 8) -> DataFrame:
    """``raw_media_df`` plus PLANTED near-duplicate video variants: for the
    first ``n_variants`` video ids a copy under ``media_id + 3000`` whose
    every frame pixel carries a deterministic ±2 offset (re-encode noise
    stand-in: every byte differs, the per-frame gradient structure
    survives)."""
    base = raw_media_df(spark, n)
    rows = []
    made = 0
    for i in range(n):
        if made >= n_variants:
            break
        if ("image", "audio", "video")[i % 3] != "video":
            continue
        made += 1
        w, h = 16 + (i % 4) * 4, 12 + (i % 3) * 4
        n_frames = 2 + i % 3
        payload = bytes(
            min(
                max(
                    (((x + y + f * 8 + i) % 2) * 255)
                    + ((x * 5 + y * 3 + f + i) % 5 - 2),
                    0,
                ),
                255,
            )
            for f in range(n_frames)
            for y in range(h)
            for x in range(w)
        )
        rows.append((i + 3000, payload, "video", w, h, n_frames * 500))
    variants = local_df(spark, rows, MEDIA_SCHEMA)
    return base.unionByName(variants)


def video_frame_hashes(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(media_id, frame_idx, fhash) — 64-bit dHash per video frame (each
    frame is a width×height bitmap slice; same 9×8 bilinear + gradient
    sign as ``perceptual_hashes``), Arrow mapInPandas, zero shuffle."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("fhash", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hs = [], [], []
            for mid, p, w, h in zip(
                pdf[id_col], pdf["payload"], pdf["width"], pdf["height"]
            ):
                vid = decode_raw(p, "video", int(w), int(h))
                for k in range(vid.shape[0]):
                    g9 = bilinear_resize(vid[k], 9, 8).astype(np.int64)
                    bits = (g9[:, 1:] > g9[:, :-1]).astype(np.uint8).ravel()
                    hs.append(int(np.packbits(bits, bitorder="little").view(np.int64)[0]))
                    ids.append(mid)
                    idxs.append(k)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "fhash": hs})

    return df.where(F.col("media_type") == "video").mapInPandas(run, schema=out_schema)


def video_near_duplicates(
    df: DataFrame,
    max_hamming: int = 6,
    min_matching_frames: int = 2,
    id_col: str = "media_id",
) -> DataFrame:
    """Video near-dup pairs by ALIGNED-frame dHash matching: per-frame
    hashes → banded candidates on (frame_idx, band, chunk) — two videos
    are compared only at the SAME frame index, the re-encode/noise
    detection scope (time-shifted copies need sequence alignment, a
    different operator) — exact Hamming verify, then a pair survives when
    ≥ ``min_matching_frames`` distinct frame indices match.  Output
    (id_a, id_b, n_frames_matched).  Never an all-pairs product: the
    fan-out is frames × 8 band rows and candidates come from one
    equi-join."""
    band_bits, nbands = 8, 8
    mask = (1 << band_bits) - 1
    h = video_frame_hashes(df, id_col)
    banded = h.select(
        id_col,
        "frame_idx",
        "fhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("fhash"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(nbands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "frame_idx", "fhash", "bb.band", "bb.chunk")
    left = banded.select(
        F.col(id_col).alias("id_a"), "frame_idx", F.col("fhash").alias("fh_a"), "band", "chunk"
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), "frame_idx", F.col("fhash").alias("fh_b"), "band", "chunk"
    )
    matched = (
        left.join(right, ["frame_idx", "band", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "frame_idx",
            F.bit_count(F.col("fh_a").bitwiseXOR(F.col("fh_b"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return (
        matched.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_frames_matched"))
        .where(F.col("n_frames_matched") >= min_matching_frames)
    )
