"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark side is REAL and tested — schema conventions, Arrow batch
shapes, `mapInPandas` partition-level processing, deterministic
partitioning — while the actual media decoding is STUBBED: the
image/audio libraries are not in this environment, so ``decode=`` is a
pluggable callable and the default is either a clearly-marked
``NotImplementedError`` (strict mode) or a deterministic fake feature
extractor (hash-derived, reproducible) for pipeline testing.

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
