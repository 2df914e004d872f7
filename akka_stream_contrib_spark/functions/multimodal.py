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


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (the JPEG transform), pure numpy."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0, :] = np.sqrt(1.0 / n)
    return m


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash of a 32x32 grayscale image: 2-D DCT-II, keep
    the lowest 8x8 frequency block minus the DC term, threshold at the
    block median. Visually similar images differ in few bits (verified by
    the gradient/noise pytest); the standard pre-embedding image near-dup
    key. Deterministic, no image libraries needed."""
    n = pixels.shape[0]
    c = _dct_matrix(n)
    freq = c @ pixels.astype(np.float64) @ c.T
    block = freq[:8, :8].copy()
    flat = block.flatten()[1:]  # drop DC — it only encodes mean brightness
    med = np.median(flat)
    bits = flat > med
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    # 63 data bits; keep as a non-negative int64
    return h


def _fake_pixels(payload: bytes, side: int = 32) -> np.ndarray:
    """Deterministic fake decode to a side x side grayscale image (md5-seeded
    — same caveat as _fake_features: swap for a real decoder on a cluster)."""
    h = hashlib.md5(payload).digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    return rng.uniform(0.0, 255.0, size=(side, side))


def phash64_batch(pixels: np.ndarray) -> np.ndarray:
    """Vectorized :func:`phash64` over a (n, 32, 32) pixel stack — one
    broadcast DCT matmul pair and a vectorized median/threshold/pack for
    the whole Arrow batch (identical bits to the scalar form, pinned by
    pytest). This is what keeps the hash stage compute-bound on BLAS
    rather than per-row Python overhead at corpus scale."""
    n = pixels.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    c = _dct_matrix(pixels.shape[1])
    freq = np.matmul(np.matmul(c, pixels.astype(np.float64)), c.T)
    block = freq[:, :8, :8].reshape(n, 64)[:, 1:]
    med = np.median(block, axis=1, keepdims=True)
    bits = (block > med).astype(np.int64)
    weights = (np.int64(1) << np.arange(62, -1, -1, dtype=np.int64))
    return bits @ weights


def media_phash(fake_decode: bool = False, media_col: str = "media"
                ) -> Callable[[DataFrame], DataFrame]:
    """mapInPandas decode→perceptual-hash stage: binary payload → ``phash``
    bigint column. Arrow-batched like decode_features; raises
    NotImplementedError without ``fake_decode=True`` (no real decoder in
    this container — the DCT/threshold math itself is real and runs on
    whatever pixels the decoder yields)."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "real image decoding requires PIL — not available in "
                    "this container; pass fake_decode=True for the "
                    "deterministic test decoder")
            out = pdf.drop(columns=[media_col]).copy()
            if len(pdf):
                pix = np.stack([_fake_pixels(bytes(p))
                                for p in pdf[media_col]])
                out["phash"] = phash64_batch(pix)
            else:
                out["phash"] = np.zeros(0, dtype=np.int64)
            yield out

    def _apply(df: DataFrame) -> DataFrame:
        keep = [f"{c.name} {c.dataType.simpleString()}" for c in df.schema
                if c.name != media_col]
        schema = ", ".join(keep + ["phash bigint"])
        return df.mapInPandas(_hash, schema=schema)

    return _apply


def phash_near_dup(radius: int = 4, hash_col: str = "phash",
                   id_col: str = "doc_id") -> Callable[[DataFrame], DataFrame]:
    """Image near-duplicate pairs by perceptual-hash hamming distance ≤
    ``radius``: pigeonhole the 64 bits into ``radius + 1`` bands — two
    hashes within the radius MUST agree on at least one whole band — then
    equi-join per band bucket and verify the exact distance with
    ``bit_count(a XOR b)``. Same shape as the SimHash pair detector
    (functions/dedup.py::simhash_pairs): never an all-pairs comparison;
    candidate volume is bounded by band-bucket occupancy (uniform for
    DCT-derived bits; a degenerate corpus of near-identical images
    concentrates buckets — cap with a df-style bucket limit upstream if
    that is the expected regime). Output: (id_a, id_b, hamming)."""

    def _apply(df: DataFrame) -> DataFrame:
        from akka_stream_contrib_spark.util import drop_stale_caches
        drop_stale_caches()
        n_bands = radius + 1
        width = 64 // n_bands
        src = df.select(F.col(id_col).alias("_id"), F.col(hash_col).alias("_h"))
        bands = src.select(
            "_id", "_h",
            F.explode(F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned(F.col("_h"), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1)).alias("val"))
                for b in range(n_bands)])).alias("bk")
        ).select("_id", "_h", "bk.band", "bk.val")
        # both self-join sides read this frame — cache it or the upstream
        # decode/hash stage (often an Arrow pass) executes twice;
        # registered for release by the next pipeline's entry
        from akka_stream_contrib_spark.util import pipeline_cache
        bands = pipeline_cache(bands)
        a = bands.alias("a")
        b = bands.alias("b")
        cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                       & (F.col("a.val") == F.col("b.val"))
                       & (F.col("a._id") < F.col("b._id")))
                .select(F.col("a._id").alias("id_a"),
                        F.col("b._id").alias("id_b"),
                        F.col("a._h").alias("_ha"),
                        F.col("b._h").alias("_hb"))
                .distinct())
        ham = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
        return (cand.withColumn("hamming", ham)
                .filter(F.col("hamming") <= radius)
                .select("id_a", "id_b", "hamming"))

    return _apply
