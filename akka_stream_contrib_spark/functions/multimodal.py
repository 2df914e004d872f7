"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched pandas transforms.

Decoding is PLUGGABLE: ``decode_features`` and ``media_phash`` accept a
``decoder: bytes -> np.ndarray`` callable (pixel array for images) — pass a
PIL/librosa/ffmpeg-backed function on a real cluster and nothing else
changes. This module ships one REAL decoder usable anywhere:
:func:`decode_ppm` (binary netpbm P6, pure numpy — no image libraries), which
the pytest suite drives end-to-end. Without a decoder the stages fall back
to ``fake_decode=True`` (a deterministic md5-seeded stand-in that keeps the
Spark-side plumbing — schema, partitioning, UDF signature, batch shape —
real and testable) or raise NotImplementedError.
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


def decode_ppm(payload: bytes) -> np.ndarray:
    """Real, dependency-free image decoder: binary netpbm PPM (``P6``,
    maxval ≤ 255 — a public format) → (h, w) grayscale float64 array via
    the Rec.601 luma weights. Proves the pluggable-decoder path end-to-end
    in environments without PIL; swap for a PIL/ffmpeg-backed callable on
    a real cluster."""
    # header = magic, width, height, maxval as whitespace-separated tokens;
    # '#' comments may appear between tokens; ONE whitespace byte then raster
    pos, tokens = 0, []
    while len(tokens) < 4:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        ch = payload[pos:pos + 1]
        if ch == b"#":
            pos = payload.index(b"\n", pos) + 1
        elif ch.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end:end + 1].isspace():
                end += 1
            tokens.append(payload[pos:end])
            pos = end
    if tokens[0] != b"P6":
        raise ValueError(f"not a binary PPM (magic {tokens[0]!r})")
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pos += 1  # the single whitespace byte after maxval
    raster = np.frombuffer(payload, dtype=np.uint8,
                           count=w * h * 3, offset=pos)
    rgb = raster.reshape(h, w, 3).astype(np.float64)
    if maxval != 255:
        # netpbm samples are FRACTIONS of maxval: a spec-valid maxval=15
        # white image is raw 15s, which unscaled reads as ~6% gray and
        # hashes/features as noise — rescale onto the 0-255 luma range
        rgb *= 255.0 / maxval
    return rgb @ np.array([0.299, 0.587, 0.114])


def _resize_gray(img: np.ndarray, side: int = 32) -> np.ndarray:
    """(h, w[, 3]) pixel array → (side, side) grayscale, by exact block
    means over an integral image (area interpolation, pure numpy) when
    shrinking, nearest-neighbor when a dimension is below ``side``."""
    img = np.asarray(img, dtype=np.float64)
    if img.ndim == 3:
        img = img @ np.array([0.299, 0.587, 0.114])
    h, w = img.shape
    if h < side or w < side:
        yi = np.minimum(np.arange(side) * h // side, h - 1)
        xi = np.minimum(np.arange(side) * w // side, w - 1)
        return img[np.ix_(yi, xi)]
    integral = np.zeros((h + 1, w + 1))
    integral[1:, 1:] = img.cumsum(0).cumsum(1)
    ye = np.arange(side + 1) * h // side
    xe = np.arange(side + 1) * w // side
    y0, y1 = ye[:-1], ye[1:]
    x0, x1 = xe[:-1], xe[1:]
    sums = (integral[np.ix_(y1, x1)] - integral[np.ix_(y0, x1)]
            - integral[np.ix_(y1, x0)] + integral[np.ix_(y0, x0)])
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return sums / area


def _pixel_features(pixels: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Decoded pixels → the FEATURE_DIM-vector the decode stage emits:
    4×4 block-mean pooling of the grayscale image scaled to [0, 1] —
    deterministic, resolution-independent, and comparable across engines."""
    side = int(np.sqrt(dim))
    pooled = _resize_gray(pixels, side=side) / 255.0
    return pooled.flatten().astype(np.float32)


def _fake_features_batch(payloads, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder+featurizer over a whole
    Arrow batch: md5-seeded counter-based splitmix64 expansion to uniform
    [-1, 1) — the same fully-vectorized generator as
    :func:`_fake_pixels_batch` (the per-row ``RandomState(seed)`` ctor it
    replaces cost ~170 µs/row and serialized the decode stage)."""
    n = len(payloads)
    if n == 0:
        return np.zeros((0, dim), dtype=np.float32)
    seeds = np.frombuffer(
        b"".join(hashlib.md5(bytes(p)).digest()[:8] for p in payloads),
        dtype=">u8").astype(np.uint64)
    ctr = ((np.arange(dim, dtype=np.uint64) + np.uint64(1))
           * np.uint64(0x9E3779B97F4A7C15))
    z = seeds[:, None] + ctr[None, :]
    # shift operands are PLAIN ints: a np.uint64(k) 0-d scalar forces the
    # shift ufunc onto a ~300x slower dispatch path (measured 2.95 s vs
    # 11 ms on a 5M-element array with this numpy build); results are
    # bit-identical and the array dtype stays uint64
    z ^= z >> 30
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> 27
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> 31
    u = (z >> 11).astype(np.float64) / float(1 << 53)
    return (u * 2.0 - 1.0).astype(np.float32)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Single-payload form of :func:`_fake_features_batch`."""
    return _fake_features_batch([payload], dim)[0]


def decode_features(fake_decode: bool = False,
                    media_col: str = "media",
                    decoder: Callable[[bytes], np.ndarray] | None = None
                    ) -> Callable[[DataFrame], DataFrame]:
    """mapInPandas decode/feature-extract stage: binary payload → float
    feature vector. Arrow-batched; each batch is decoded vectorized inside
    the executor Python worker.

    ``decoder``: a ``bytes -> pixel ndarray`` callable (e.g.
    :func:`decode_ppm`, or a PIL/ffmpeg wrapper on a real cluster) — its
    pixels are pooled to the FEATURE_DIM vector by :func:`_pixel_features`.
    Without a decoder, ``fake_decode=True`` selects the deterministic
    md5-seeded stand-in; otherwise the stage raises NotImplementedError."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads decode to NULL features (bytes(None) would
            # crash the whole stage with an opaque TypeError)
            if decoder is not None:
                feats = [None if p is None
                         else _pixel_features(decoder(bytes(p))).tolist()
                         for p in pdf[media_col]]
            elif fake_decode:
                present = [p for p in pdf[media_col] if p is not None]
                fb = iter(_fake_features_batch(present))
                feats = [None if p is None else next(fb).tolist()
                         for p in pdf[media_col]]
            else:
                raise NotImplementedError(
                    "no media decoder: pass decoder= (bytes -> pixel "
                    "ndarray, e.g. decode_ppm or a PIL/librosa/ffmpeg "
                    "wrapper) or fake_decode=True for the deterministic "
                    "test decoder")
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
        # ceil(duration/every_ms) frames: valid instants are t < duration
        # (half-open clip), so an exact multiple must not stamp a frame AT
        # the end; duration <= 0 yields no frames. The compact rows
        # repartition with an EXPLICIT count before the ~600x explode —
        # same AQE-coalesce/fan-out reasoning as audio_segments
        dur = F.col("media_meta.duration_ms")
        n_frames = ((dur + F.lit(every_ms - 1)) / F.lit(every_ms)).cast("int")
        return (
            df.filter(F.col("modality") == "video")
            .repartition(df.sparkSession.sparkContext.defaultParallelism)
            .withColumn("frame_no", F.explode(F.when(
                n_frames > 0, F.sequence(F.lit(0), n_frames - 1))
                .otherwise(F.array().cast("array<int>"))))
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


def _fake_pixels_batch(payloads, side: int = 32) -> np.ndarray:
    """Deterministic fake decode of a whole Arrow batch to (n, side, side)
    grayscale stacks — md5-seeded counter-based splitmix64 expansion, fully
    vectorized (the per-row ``RandomState(seed)`` constructor this replaces
    cost ~170 µs/row and serialized the decode stage). Identical payloads
    yield identical pixels; distinct payloads yield independent uniform
    noise (same caveat as _fake_features: swap for a real decoder on a
    cluster)."""
    n = len(payloads)
    if n == 0:
        return np.zeros((0, side, side))
    seeds = np.frombuffer(
        b"".join(hashlib.md5(bytes(p)).digest()[:8] for p in payloads),
        dtype=">u8").astype(np.uint64)
    ctr = ((np.arange(side * side, dtype=np.uint64) + np.uint64(1))
           * np.uint64(0x9E3779B97F4A7C15))
    out = np.empty((n, side * side))
    # chunked so each uint64 temporary stays ~2 MB — small enough that the
    # allocator serves every chunk from reused heap pages instead of fresh
    # mmap regions, whose first-touch faults dominate the arithmetic on a
    # cold worker (measured 7.5 s -> 0.5 s for a 5k-row batch)
    for s in range(0, n, 256):
        z = seeds[s:s + 256, None] + ctr[None, :]
        # plain-int shift operands (not np.uint64 scalars): see
        # _fake_features_batch — the 0-d scalar operand is ~300x slower
        z ^= z >> 30
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> 27
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> 31
        out[s:s + 256] = (z >> 11).astype(np.float64)
    out *= 255.0 / float(1 << 53)
    return out.reshape(n, side, side)


def _fake_pixels(payload: bytes, side: int = 32) -> np.ndarray:
    """Single-payload form of :func:`_fake_pixels_batch`."""
    return _fake_pixels_batch([payload], side)[0]


def phash64_batch(pixels: np.ndarray) -> np.ndarray:
    """Vectorized :func:`phash64` over a (n, 32, 32) pixel stack — one
    broadcast DCT matmul pair and a vectorized median/threshold/pack for
    the whole Arrow batch (identical bits to the scalar form, pinned by
    pytest). This is what keeps the hash stage compute-bound on BLAS
    rather than per-row Python overhead at corpus scale."""
    n = pixels.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    side = pixels.shape[1]
    # only the 8x8 low-frequency block is kept, so multiply by the first 8
    # DCT rows only — and as TWO large GEMMs over the whole batch instead
    # of n small batched matmuls (6x fewer flops, BLAS-efficient shapes);
    # each output element is the same length-`side` inner product as the
    # scalar form
    c8 = _dct_matrix(side)[:8]
    # asarray, not astype: the decode stage already yields float64, and
    # astype would copy 8·n·side² fresh bytes per batch — page-faulting
    # that allocation dominates the GEMMs on hosts with slow first-touch
    p = np.ascontiguousarray(np.asarray(pixels, dtype=np.float64)
                             .transpose(1, 0, 2).reshape(side, n * side))
    a = (c8 @ p).reshape(8, n, side).transpose(1, 0, 2)  # (n, 8, side)
    freq8 = np.ascontiguousarray(a).reshape(n * 8, side) @ c8.T
    block = freq8.reshape(n, 64)[:, 1:]
    med = np.median(block, axis=1, keepdims=True)
    bits = (block > med).astype(np.int64)
    weights = (np.int64(1) << np.arange(62, -1, -1, dtype=np.int64))
    return bits @ weights


def media_phash(fake_decode: bool = False, media_col: str = "media",
                decoder: Callable[[bytes], np.ndarray] | None = None
                ) -> Callable[[DataFrame], DataFrame]:
    """mapInPandas decode→perceptual-hash stage: binary payload → ``phash``
    bigint column. Arrow-batched like decode_features; the DCT/threshold
    math runs on whatever pixels the decoder yields.

    ``decoder``: a ``bytes -> pixel ndarray`` callable (any resolution,
    gray or RGB — pixels are area-resized to the 32×32 hash input by
    :func:`_resize_gray`); e.g. :func:`decode_ppm`, or a PIL wrapper on a
    real cluster. Without a decoder, ``fake_decode=True`` selects the
    deterministic stand-in; otherwise raises NotImplementedError."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is None and not fake_decode:
                raise NotImplementedError(
                    "no image decoder: pass decoder= (bytes -> pixel "
                    "ndarray, e.g. decode_ppm or a PIL wrapper) or "
                    "fake_decode=True for the deterministic test decoder")
            out = pdf.drop(columns=[media_col]).copy()
            if len(pdf):
                # NULL payloads hash to NULL (bytes(None) would crash the
                # stage); hash only the present payloads, then re-expand.
                # pandas nullable Int64 — a float64 NaN carrier would lose
                # the low bits of 64-bit hash values past 2^53
                present = [p for p in pdf[media_col] if p is not None]
                vals: list = [None] * len(pdf)
                if present:
                    if decoder is not None:
                        pix = np.stack([_resize_gray(decoder(bytes(p)))
                                        for p in present])
                        hv = phash64_batch(pix)
                    else:
                        # decode+hash in ~2 MB chunks: per-row bits are
                        # independent (pinned by the batch==scalar test),
                        # and small chunks keep every temporary on reused
                        # heap pages — an Arrow-batch-sized pixel stack is
                        # a fresh mmap region whose first-touch faults
                        # dominate on a cold worker (7.5 s -> 0.5 s / 5k)
                        hv = np.empty(len(present), dtype=np.int64)
                        for s in range(0, len(present), 256):
                            hv[s:s + 256] = phash64_batch(
                                _fake_pixels_batch(present[s:s + 256]))
                    j = 0
                    for i, payload in enumerate(pdf[media_col]):
                        if payload is not None:
                            vals[i] = int(hv[j])
                            j += 1
                out["phash"] = pd.array(vals, dtype="Int64")
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
        # candidate pairs via per-bucket POSTING LISTS (r10 opt, guide
        # §2.3 — same rewrite as ngram_jaccard/lsh_candidate_pairs, which
        # measured 2.6×): ONE shuffle groups each (band, val) bucket's
        # (_id, _h) structs and the pair fan-out happens map-side, instead
        # of hashing the band table TWICE for an a/b self-join. The sorted
        # set fans out pairs in struct order (= id order for unique ids);
        # the strict id_a < id_b filter keeps the old join's exclusion of
        # same-id pairs exactly, even under a duplicated upstream id. The
        # upstream decode/hash Arrow pass now has ONE consumer, so the
        # pipeline cache the self-join needed is gone too.
        from akka_stream_contrib_spark.functions.dedup import pair_fanout_expr
        pair_expr = pair_fanout_expr("a", "b")
        cand = (bands.groupBy("band", "val")
                .agg(F.array_sort(
                    F.collect_set(F.struct("_id", "_h"))).alias("_l"))
                .filter(F.size("_l") >= 2)
                .select(F.explode(F.expr(pair_expr)).alias("_p"))
                .filter(F.col("_p.a._id") < F.col("_p.b._id"))
                .select(F.col("_p.a._id").alias("id_a"),
                        F.col("_p.b._id").alias("id_b"),
                        F.col("_p.a._h").alias("_ha"),
                        F.col("_p.b._h").alias("_hb"))
                .distinct())
        ham = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
        return (cand.withColumn("hamming", ham)
                .filter(F.col("hamming") <= radius)
                .select("id_a", "id_b", "hamming"))

    return _apply


def audio_segments(frame_ms: int = 1000, threshold: float = 0.6
                   ) -> Callable[[DataFrame], DataFrame]:
    """Audio activity segmentation (VAD-shaped) plumbing: frame each audio
    payload on a fixed ``frame_ms`` grid, score per-frame energy, and merge
    consecutive active frames (energy ≥ ``threshold``) into segments via
    gaps-and-islands. The acoustic decode is the stub (per-frame energy is
    derived deterministically from the payload hash + frame number — a real
    deployment swaps in an RMS over decoded PCM); the framing arithmetic,
    activity thresholding, and segment merge are the real engine machinery
    a speech pipeline runs at corpus scale.

    Emits (doc_id, seg_start_ms, seg_end_ms, n_frames, energy_millis) — one
    row per contiguous active run; ``energy_millis`` is the exact integer
    sum of the per-frame milli-energies (the repo's exact-integer
    convention: no float aggregation, no 6-dp rounding-tie hazard).

    Scale shape (100 TB): the compact per-doc rows are hash-repartitioned
    on doc_id BEFORE the frame explode — a ~600× fan-out stage must never
    be bound to input-split parallelism (the shuffle moves only the small
    pre-explode rows; measured 3.0 s → sub-second at sf0.1, where the
    single-row-group fixture otherwise pins the explode to one core).
    The explode and energy scoring are map-side codegen (JVM md5 — no
    Python anywhere); the island window and the segment groupBy then
    REUSE that doc_id partitioning (no further exchange), with the
    threshold filter dropping inactive frames before the window sort.
    """

    def _apply(df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        frames = (
            df.filter(F.col("modality") == "audio")
            .select(
                "doc_id",
                F.md5(F.col("media")).alias("_ph"),
                F.col("media_meta.duration_ms").alias("_dur"))
            # EXPLICIT partition count: without it AQE sees only the tiny
            # pre-explode bytes and coalesces the shuffle back to one
            # partition, re-serializing the ~600x fan-out it exists to
            # spread (the planner can't know rows are about to multiply)
            .repartition(df.sparkSession.sparkContext.defaultParallelism,
                         F.col("doc_id"))
            .select(
                "doc_id", "_ph",
                # ceil(dur/frame_ms) frames: the last PARTIAL frame carries
                # audio, but an exact multiple must NOT grow a phantom frame
                # past the end; duration <= 0 yields NO frames (an untyped
                # sequence(0, -1) would default to step -1 and emit phantom
                # frames 0 and -1)
                F.explode(F.when(
                    F.col("_dur") > 0,
                    F.sequence(
                        F.lit(0),
                        ((F.col("_dur") + F.lit(frame_ms - 1))
                         / F.lit(frame_ms)).cast("int") - 1))
                    .otherwise(F.array().cast("array<int>")))
                .alias("frame_no"))
            .withColumn(
                "_e1000",
                F.pmod(
                    F.conv(F.substring(
                        F.md5(F.concat_ws(":", F.col("_ph"),
                                          F.col("frame_no"))), 1, 8),
                        16, 10).cast("bigint"),
                    F.lit(1000))))
        active = frames.filter(
            F.col("_e1000") >= F.lit(int(round(threshold * 1000))))
        w = Window.partitionBy("doc_id").orderBy("frame_no")
        islands = active.withColumn(
            "_isl", F.col("frame_no") - F.row_number().over(w))
        return (islands.groupBy("doc_id", "_isl")
                .agg(F.min("frame_no").alias("_f0"),
                     F.max("frame_no").alias("_f1"),
                     F.count(F.lit(1)).alias("n_frames"),
                     F.sum("_e1000").alias("_se"))
                .select(
                    "doc_id",
                    (F.col("_f0").cast("long") * frame_ms)
                    .alias("seg_start_ms"),
                    ((F.col("_f1").cast("long") + 1) * frame_ms)
                    .alias("seg_end_ms"),
                    "n_frames",
                    F.col("_se").cast("long").alias("energy_millis")))

    return _apply
