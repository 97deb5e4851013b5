"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark side is REAL and tested — schema conventions, Arrow batch
shapes, `mapInPandas` partition-level processing, deterministic
partitioning. ``decode=`` is a pluggable callable; GENUINE decoders
ship for formats the standard library + numpy can handle (WAV via
stdlib ``wave``, binary PPM via numpy — ``decode_wav``/``decode_ppm``,
feature extractors ``wav_features``/``ppm_features``, magic-byte
dispatch ``auto_decode``), exercised end-to-end through mapInPandas in
tests/test_training_ops.py. Formats needing external libs (JPEG/MP4/
FLAC…) stay behind ``real_decode_stub`` (strict NotImplementedError)
or the deterministic ``fake_decode`` for pipeline testing.

Schema convention for a media column ``m``:

    m:          binary          (opaque payload)
    m_meta:     struct<format: string, width: int, height: int,
                       duration_ms: int>   (nullable fields per modality)
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


def real_decode_stub(payload: bytes, meta: dict[str, Any]) -> np.ndarray:
    """Placeholder for a real decoder (PIL / libav / torchaudio).

    STUB: the media libraries are not installed in this environment.
    Swap in a real implementation via the ``decode=`` parameter of
    extract_features / sample_frames.
    """
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in "
        "this environment; pass decode=<callable> with a real decoder"
    )


def fake_decode(payload: bytes, meta: dict[str, Any]) -> np.ndarray:
    """Deterministic fake decoder: 16 floats derived from a SHA-256 of
    the payload — reproducible pipeline testing without media libs."""
    digest = hashlib.sha256(payload or b"").digest()
    return np.frombuffer(digest[:16 * 4][: len(digest) // 4 * 4], dtype=np.uint8)[
        :16
    ].astype(np.float32) / 255.0


# --------------------------------------------------------- real codecs
# Genuine decode paths that need no external media library: WAV via the
# stdlib `wave` module, PPM (P6) via pure numpy. They plug into the same
# ``decode=`` hook as a PIL/libav decoder would, so the Spark plumbing
# exercised in tests is byte-identical to a production pipeline's.


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (samples float64 in [-1, 1] shaped (n, channels),
    sample_rate). stdlib-only; 8/16/32-bit integer PCM."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 1:  # unsigned 8-bit
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return x.reshape(-1, n_ch), rate


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → uint8 image array shaped (H, W, 3). Pure
    numpy header parse + frombuffer."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic, width, height, maxval — whitespace/comment separated
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    img = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return img.reshape(h, w, 3)


def wav_features(payload: bytes, meta: dict[str, Any]) -> np.ndarray:
    """16 deterministic features from a REAL WAV decode: duration, rms,
    peak, zero-crossing rate, mean, and 10 coarse energy bands."""
    x, rate = decode_wav(payload)
    mono = x.mean(axis=1)
    n = max(len(mono), 1)
    zc = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) / n
    bands = [float(np.sqrt(np.mean(np.square(c)))) if len(c) else 0.0
             for c in np.array_split(mono, 10)]
    feats = [
        n / float(rate),
        float(np.sqrt(np.mean(np.square(mono)))) if len(mono) else 0.0,
        float(np.max(np.abs(mono))) if len(mono) else 0.0,
        zc,
        float(np.mean(mono)) if len(mono) else 0.0,
        float(x.shape[1]),
    ] + bands
    return np.asarray(feats, dtype=np.float32)


def ppm_features(payload: bytes, meta: dict[str, Any]) -> np.ndarray:
    """16 deterministic features from a REAL PPM decode: dims, per-
    channel mean/std, luma quartiles and a 5-bin luma histogram."""
    img = decode_ppm(payload).astype(np.float64)
    luma = img @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(luma, bins=5, range=(0.0, 255.0))
    feats = (
        [float(img.shape[1]), float(img.shape[0])]
        + [float(img[..., c].mean()) for c in range(3)]
        + [float(img[..., c].std()) for c in range(3)]
        + [float(q) for q in np.percentile(luma, [25, 50, 75])]
        + (hist / max(luma.size, 1)).tolist()
    )
    return np.asarray(feats[:16], dtype=np.float32)


def auto_decode(payload: bytes, meta: dict[str, Any]) -> np.ndarray:
    """Magic-byte dispatch to a real codec (RIFF → WAV, P6 → PPM);
    unknown formats fall back to the deterministic fake extractor so a
    mixed-modality corpus never kills the batch."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return wav_features(payload, meta)
    if payload[:2] == b"P6":
        return ppm_features(payload, meta)
    return fake_decode(payload, meta)


def extract_features(
    df: DataFrame,
    media_col: str,
    id_col: str,
    decode: Callable[[bytes, dict[str, Any]], np.ndarray] = fake_decode,
    feature_dim: int = 16,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Per-item feature extraction over a binary media column via
    ``mapInPandas`` — the executor processes Arrow batches of
    (id, payload) and yields (id, features: array<float>).

    The decode callable is the only non-Spark code; everything around
    it (column pruning to just id+payload, Arrow transfer, output
    schema) is the production plumbing.
    """
    out_schema = T.StructType(
        [
            T.StructField("__mm_id", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), False),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(payload, {}).astype(np.float32)[:feature_dim].tolist()
                for payload in pdf["__mm_payload"]
            ]
            yield pd.DataFrame({"__mm_id": pdf["__mm_id"], "features": feats})

    narrow = df.select(
        F.col(id_col).cast("string").alias("__mm_id"),
        F.col(media_col).alias("__mm_payload"),
    )
    feats = narrow.mapInPandas(process, out_schema)
    # join back on the string-cast id; callers keep their own id column
    return (
        df.withColumn("__mm_id", F.col(id_col).cast("string"))
        .join(feats, "__mm_id", "left")
        .drop("__mm_id")
    )


def sample_frames(
    df: DataFrame,
    media_col: str,
    id_col: str,
    every_ms: int = 1000,
    decode: Callable[[bytes, dict[str, Any]], np.ndarray] = fake_decode,
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    frame (id, frame_idx, frame_features). Frame count derives from
    ``m_meta.duration_ms`` when present, else 1. The per-frame decode
    is the pluggable stub; the row-explosion plumbing is real."""
    meta_col = f"{media_col}_meta"
    has_meta = meta_col in df.columns
    n_frames = (
        F.greatest(
            (F.col(f"{meta_col}.duration_ms") / every_ms).cast("int"), F.lit(1)
        )
        if has_meta
        else F.lit(1)
    )
    exploded = df.select(
        F.col(id_col),
        F.col(media_col).alias("__mm_payload"),
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    )
    out_schema = T.StructType(
        [
            T.StructField("__mm_id", T.StringType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_features", T.ArrayType(T.FloatType()), False),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(p, {"frame": int(i)}).astype(np.float32).tolist()
                for p, i in zip(pdf["__mm_payload"], pdf["frame_idx"])
            ]
            yield pd.DataFrame(
                {
                    "__mm_id": pdf["__mm_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_features": feats,
                }
            )

    narrow = exploded.select(
        F.col(id_col).cast("string").alias("__mm_id"),
        "__mm_payload",
        "frame_idx",
    )
    return narrow.mapInPandas(process, out_schema).withColumnRenamed(
        "__mm_id", id_col
    )


def with_media_meta(
    df: DataFrame, media_col: str, fmt: str = "bin"
) -> DataFrame:
    """Attach a typed metadata struct for an existing binary column
    (deterministic pseudo-dimensions from the payload hash — replace
    with probed values when a real decoder is plugged in)."""
    h = F.xxhash64(F.col(media_col))
    return df.withColumn(
        f"{media_col}_meta",
        F.struct(
            F.lit(fmt).alias("format"),
            (F.pmod(h, F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(h, F.lit(1080)) + 1).cast("int").alias("height"),
            (F.pmod(h, F.lit(60_000)) + 1000).cast("int").alias("duration_ms"),
        ),
    )
