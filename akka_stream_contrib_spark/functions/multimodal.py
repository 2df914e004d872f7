"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched pandas transforms.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_stub`` raises NotImplementedError unless
``fake_decode=True``, in which case a deterministic fake decoder produces
shape-correct features so the Spark-side plumbing — schema, partitioning, UDF
signature, batch shape — is real and testable. Swap ``_fake_features`` for a
PIL/librosa/ffmpeg call on a real cluster; nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MODALITIES = ("image", "audio", "video")

# schema of the metadata struct attached to every media payload
MEDIA_META_SCHEMA = (
    "modality string, n_bytes int, format string, width int, height int, "
    "duration_ms int"
)

FEATURE_DIM = 16


def with_media_columns(payload: Column, modality: Column) -> Callable[[DataFrame], DataFrame]:
    """Attach the binary payload and its typed metadata struct. Metadata that
    a real decoder would sniff from headers is derived deterministically here
    (bytes length; fake format/dims keyed on the payload hash)."""

    def _apply(df: DataFrame) -> DataFrame:
        out = df.withColumn("media", payload).withColumn("modality", modality)
        # portable 32-bit payload hash (md5 prefix — same value in any engine
        # hashing the identical bytes; see functions.text.token_id)
        out = out.withColumn(
            "_mh", F.conv(F.substring(F.md5(F.col("media")), 1, 8), 16, 10).cast("bigint"))
        out = out.withColumn(
            "media_meta",
            F.struct(
                F.col("modality").alias("modality"),
                F.octet_length(F.col("media")).alias("n_bytes"),
                F.element_at(
                    F.array(F.lit("png"), F.lit("jpeg"), F.lit("wav"), F.lit("mp4")),
                    (F.pmod(F.col("_mh"), F.lit(4)) + 1).cast("int"),
                ).alias("format"),
                F.when(F.col("modality") == "image",
                       (F.pmod(F.col("_mh"), F.lit(1024)) + 1).cast("int")).alias("width"),
                F.when(F.col("modality") == "image",
                       (F.pmod(F.col("_mh"), F.lit(768)) + 1).cast("int")).alias("height"),
                F.when(F.col("modality") != "image",
                       (F.pmod(F.col("_mh"), F.lit(600000)) + 1).cast("int")).alias("duration_ms"),
            ),
        ).drop("_mh")
        return out

    return _apply


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder+featurizer: md5-seeded
    uniform vector. Stable across processes/executors."""
    h = hashlib.md5(payload).digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    return rng.uniform(-1.0, 1.0, size=dim).astype(np.float32)


def decode_features(fake_decode: bool = False,
                    media_col: str = "media") -> Callable[[DataFrame], DataFrame]:
    """mapInPandas decode/feature-extract stage: binary payload → float
    feature vector. Arrow-batched; each batch is decoded vectorized inside the
    executor Python worker. Raises NotImplementedError without
    ``fake_decode=True`` (no media libraries in this container)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "real media decoding requires PIL/librosa/ffmpeg — not "
                    "available in this container; pass fake_decode=True for "
                    "the deterministic test decoder")
            feats = [
                _fake_features(bytes(p)).tolist() for p in pdf[media_col]
            ]
            out = pdf.drop(columns=[media_col]).copy()
            out["features"] = feats
            yield out

    def _apply(df: DataFrame) -> DataFrame:
        keep = [f"{c.name} {c.dataType.simpleString()}" for c in df.schema
                if c.name != media_col]
        schema = ", ".join(keep + [f"features array<float>"])
        return df.mapInPandas(_decode, schema=schema)

    return _apply


def frame_sample(every_ms: int = 1000) -> Callable[[DataFrame], DataFrame]:
    """Video frame-sampling plumbing: explode each video payload into frame
    rows on a fixed time grid (frame extraction itself is part of the decode
    stub — here the grid and row multiplication are real). Emits
    (original columns..., frame_no, frame_ts_ms)."""

    def _apply(df: DataFrame) -> DataFrame:
        n_frames = (F.col("media_meta.duration_ms") / F.lit(every_ms)).cast("int") + 1
        return (
            df.filter(F.col("modality") == "video")
            .withColumn("frame_no", F.explode(F.sequence(F.lit(0), n_frames - 1)))
            .withColumn("frame_ts_ms", F.col("frame_no") * F.lit(every_ms))
        )

    return _apply
