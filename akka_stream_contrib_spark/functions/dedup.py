"""Deduplication operators for the documents pipeline.

- ``dedup_exact``: hash-groupBy exact dedup (one shuffle on the content hash).
- ``minhash_lsh_dedup``: MinHash + banded LSH near-dup detection — the
  standard scale algorithm: shingle → minhash signature (map-side) → band
  buckets (shuffle on band key) → candidate pairs (bucket join) → exact
  Jaccard verification on candidates only. All-pairs comparison never happens;
  cost is O(N·S) + O(candidate pairs), which is what survives 100 TB.
- ``simhash``: 16-bit SimHash signatures from shingle hashes (map-side only).

Token/shingle hashing uses the portable md5-prefix hash
(functions.text.token_id) so every step is reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from akka_stream_contrib_spark.functions.text import token_id

MINHASH_P = 8191  # 2^13-1, prime modulus for the affine hash family


def dedup_exact(id_col: str = "doc_id", text_col: str = "text") -> Callable[[DataFrame], DataFrame]:
    """Exact dedup via content hash: one row per distinct content with the
    canonical (minimum) id and the duplicate count. Partial aggregation makes
    this a single shuffle on the 128-bit hash — no text comparison, no skew
    (hash keys are uniform)."""

    def _apply(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
            .agg(
                F.min(id_col).alias("canonical_doc_id"),
                F.count(F.lit(1)).alias("dup_count"),
            )
        )

    return _apply


def shingles(df: DataFrame, k: int = 3, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Distinct k-word shingles per document: (doc_id, shingle).

    Built with an array expression (`transform` over an index sequence) and a
    single `explode` — the shingling itself never leaves the JVM. Documents
    with fewer than k tokens produce no shingles (matching generate_series
    semantics in the oracle)."""
    toks = f"split({text_col}, ' ')"
    shingle_arr = (
        f"transform(sequence(0, size({toks}) - {k}),"
        f" i -> concat_ws(' ', slice({toks}, i + 1, {k})))"
    )
    return (
        df.filter(F.expr(f"size({toks}) >= {k}"))
        .select(F.col(id_col).alias("doc_id"),
                F.explode(F.array_distinct(F.expr(shingle_arr))).alias("shingle"))
    )


def minhash_signatures(sh: DataFrame, num_hashes: int = 8) -> DataFrame:
    """MinHash signature rows (doc_id, h, mh): for hash function h,
    mh = min over shingles of ((a_h * token_id(shingle) + b_h) mod P).

    The hash family is affine with fixed odd coefficients a=6h+7, b=3h+1 —
    deterministic, no RNG, reproducible in SQL. The per-doc min is a partial
    aggregate (map-side combine) shuffled on (doc_id, h)."""
    hparams = F.explode(
        F.expr(f"transform(sequence(0, {num_hashes - 1}),"
               f" h -> struct(h as h, 6*h + 7 as a, 3*h + 1 as b))")
    ).alias("hp")
    return (
        sh.select("doc_id", token_id(F.col("shingle")).alias("tid"))
        .select("doc_id", "tid", hparams)
        .groupBy("doc_id", F.col("hp.h").alias("h"))
        .agg(F.min((F.col("hp.a") * F.col("tid") + F.col("hp.b")) % MINHASH_P).alias("mh"))
    )


def lsh_candidate_pairs(sig: DataFrame, bands: int = 4, rows_per_band: int = 2) -> DataFrame:
    """Banded LSH: fold each band's signature rows into one integer key
    (positional base-P encoding — order-independent aggregation), bucket-join
    on (band, key), emit distinct candidate pairs (doc_a < doc_b).

    The join is an equi-join on the band key → hash-shuffle both sides; bucket
    sizes are small by construction (that is the LSH property), so no skew."""
    enc = F.sum(
        F.col("mh") * F.pow(F.lit(float(MINHASH_P + 1)), F.pmod(F.col("h"), F.lit(rows_per_band))).cast("bigint")
    )
    bandsig = (
        sig.withColumn("band", (F.col("h") / F.lit(rows_per_band)).cast("int"))
        .groupBy("doc_id", "band")
        .agg(enc.alias("band_key"))
    )
    a = bandsig.alias("a")
    b = bandsig.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame,
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH candidates → exact
    Jaccard verification on candidates only. Returns (doc_a, doc_b, jaccard)
    for pairs with Jaccard ≥ threshold."""
    sh = shingles(df, k=k, id_col=id_col, text_col=text_col)
    sig = minhash_signatures(sh, num_hashes=num_hashes)
    cand = lsh_candidate_pairs(sig, bands=bands, rows_per_band=num_hashes // bands)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sh.alias("sb"), (F.col("doc_b") == F.col("sb.doc_id"))
              & (F.col("sa.shingle") == F.col("sb.shingle")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.alias("na"), F.col("doc_a") == F.col("na.doc_id"))
        .join(sizes.alias("nb"), F.col("doc_b") == F.col("nb.doc_id"))
        .select(
            "doc_a", "doc_b",
            F.round(F.col("inter") / (F.col("na.n") + F.col("nb.n") - F.col("inter")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(id_col: str = "doc_id", text_col: str = "text", k: int = 3,
            bits: int = 16) -> Callable[[DataFrame], DataFrame]:
    """Per-document SimHash: for each bit b, sum ±1 votes of bit b of each
    shingle hash (mixed by the Knuth multiplier); bit set iff the vote sum is
    non-negative. One explode + one aggregation — fully distributed."""

    def _apply(df: DataFrame) -> DataFrame:
        sh = shingles(df, k=k, id_col=id_col, text_col=text_col)
        # second md5 slice (chars 9-16) = an independent, well-mixed 32-bit
        # hash — avoids multiplicative mixing that overflows bigint
        hashed = sh.select(
            "doc_id",
            F.conv(F.substring(F.md5(F.col("shingle")), 9, 8), 16, 10)
            .cast("bigint").alias("hx"))
        bitrows = hashed.select(
            "doc_id",
            F.explode(F.expr(
                f"transform(sequence(0, {bits - 1}),"
                f" b -> struct(b as b, CASE WHEN shiftright(hx, b) % 2 = 1 THEN 1 ELSE -1 END as vote))"
            )).alias("bv"),
        )
        votes = (
            bitrows.groupBy("doc_id", F.col("bv.b").alias("b"))
            .agg(F.sum("bv.vote").alias("v"))
        )
        return (
            votes.groupBy("doc_id")
            .agg(F.sum(
                F.when(F.col("v") >= 0, F.expr("shiftleft(cast(1 as bigint), cast(b as int))"))
                .otherwise(F.lit(0))
            ).alias("simhash"))
        )

    return _apply
