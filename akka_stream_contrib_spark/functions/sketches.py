"""Mergeable distinct-count sketches (Apache DataSketches HLL, Spark-native).

The 100 TB pattern for distinct counts: you cannot afford to re-scan raw
events for every (day, month, quarter, all-time) distinct-user question, and
exact distinct state at that scale is a shuffle of every key. Instead,
aggregate each fine-grained bucket ONCE into an HLL sketch (a few KB,
`hll_sketch_agg` — map-side partial aggregation like any hash agg), persist
the sketches, and answer every coarser rollup by UNIONING sketches
(`hll_union_agg`) — no raw-data access, error a few permille at lg_k=12+.
Union is associative/commutative, so rollups compose: daily → monthly →
all-time each read only the previous level's sketch table.

Reference anchor: none (approximate aggregation is a BASELINE.json
extension; the reference has no aggregation surface at all). Uses only
public Spark 4 `pyspark.sql.functions` sketch builtins.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_sketch_rollup(df: DataFrame, keys: Sequence[str], item: str,
                      lgk: int = 12, sketch_col: str = "sketch") -> DataFrame:
    """Aggregate one HLL sketch of ``item`` per ``keys`` group — the
    fine-grained sketch table you persist (binary column, a few KB/row)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(item), F.lit(lgk)).alias(sketch_col))


def hll_merge(sketch_df: DataFrame, keys: Sequence[str],
              sketch_col: str = "sketch",
              estimate_col: str = "approx_distinct") -> DataFrame:
    """Roll sketches up to coarser ``keys`` by union-merging, returning the
    distinct-count estimate. Reads ONLY the sketch table — this is the step
    that makes multi-granularity distinct counts O(buckets), not O(events).
    """
    return (sketch_df.groupBy(*keys)
            .agg(F.hll_union_agg(F.col(sketch_col)).alias("_merged"),
                 F.count(F.lit(1)).alias("n_buckets"))
            .withColumn(estimate_col,
                        F.hll_sketch_estimate(F.col("_merged")))
            .drop("_merged"))


def hll_overlap(sketch_df: DataFrame, key: str,
                sketch_col: str = "sketch") -> DataFrame:
    """Pairwise distinct-set OVERLAP estimates from HLL sketches alone:
    ``|A∩B| ≈ est(A) + est(B) − est(A ∪ B)`` (inclusion–exclusion over a
    sketch union-merge). The audience-overlap / retargeting primitive at
    100 TB: after ONE pass builds the per-key sketch table, every pairwise
    overlap is computed from the kilobyte sketches — the raw items are
    never re-read and no (key_a, key_b, item) fan-out ever exists.

    Input is a per-key sketch table (:func:`hll_sketch_rollup`). The pair
    join is over the KEYS (one row per key — broadcast-trivial), not the
    items. Returns (k_a, k_b, est_a, est_b, est_union, est_overlap) for
    every unordered key pair.

    Error: each estimate carries the published HLL relative standard
    error σ = 1.04/√(2^lgk); the subtraction compounds them, so the
    overlap's absolute error is bounded by ~σ·(|A|+|B|+|A∪B|) — small
    relative to the UNION, not to the intersection (tiny overlaps of
    huge sets drown in sketch noise; exact audits belong there).
    """
    a = sketch_df.select(F.col(key).alias("k_a"),
                         F.col(sketch_col).alias("_sa"))
    b = sketch_df.select(F.col(key).alias("k_b"),
                         F.col(sketch_col).alias("_sb"))
    est = (a.join(b, F.col("k_a") < F.col("k_b"))
           .select("k_a", "k_b",
                   F.hll_sketch_estimate("_sa").alias("est_a"),
                   F.hll_sketch_estimate("_sb").alias("est_b"),
                   F.hll_sketch_estimate(
                       F.expr("hll_union(_sa, _sb)")).alias("est_union")))
    return est.withColumn(
        "est_overlap", F.col("est_a") + F.col("est_b") - F.col("est_union"))


def mg_update(counters: dict, batch_counts, capacity: int) -> dict:
    """Merge a batch's item counts into Misra-Gries ``counters``, applying
    the batched decrement that keeps ≤ ``capacity`` entries: subtract the
    (size-capacity)-th smallest value from everyone and drop non-positives.
    Each unit of decrement removes ≥ capacity+1 total mass, so any item
    with share > 1/(capacity+1) of the stream so far survives — the
    classic MG guarantee, shared by the batch and streaming forms."""
    for item, c in batch_counts.items():
        counters[item] = counters.get(item, 0) + int(c)
    if len(counters) > capacity:
        vals = sorted(counters.values())
        dec = vals[len(counters) - capacity - 1]
        counters = {i: c - dec for i, c in counters.items() if c > dec}
    return counters


def mg_heavy_hitters(df: DataFrame, item_col: str, k: int = 50,
                     capacity: int = 4096) -> DataFrame:
    """Top-``k`` most frequent items via Misra-Gries candidate generation +
    exact recount — the frequent-items scale path.

    Why not plain ``groupBy().count()``: at 100 TB the item column's long
    tail (URLs, shingles, user agents) makes the count shuffle as large as
    the data. Misra-Gries keeps ≤ ``capacity`` counters per partition
    (mapInPandas, state lives across the partition's Arrow batches), and
    per-partition candidates are a guaranteed superset of every item with
    global share > 1/(capacity+1): if an item's global share exceeds that,
    some partition holds at least that local share, where MG's total
    decrement (≤ n_p/(capacity+1)) cannot erase it. The candidate union
    (≤ capacity × partitions rows) is broadcast back as a semi-join filter
    and ONLY candidate rows are exactly recounted — the shuffle carries the
    heavy head, never the tail.

    Result equals the exact top-k whenever the true k-th item has share
    > 1/(capacity+1) (size ``capacity`` ≫ k accordingly); ranking is
    (count DESC, item) so it is deterministic and engine-replayable.

    NULL items are excluded up front (explicitly, not by accident):
    pandas ``value_counts`` drops them from the MG counters and the
    candidate semi-join could never match a NULL key anyway — the top-k
    is over REAL item values; count NULLs separately if they matter.
    """
    import pandas as pd

    def _mg(batches):
        counters: dict = {}
        for pdf in batches:
            counters = mg_update(counters, pdf[item_col].value_counts(),
                                 capacity)
        yield pd.DataFrame({item_col: list(counters.keys())})

    items = df.select(item_col).filter(F.col(item_col).isNotNull())
    cands = (items.mapInPandas(_mg, schema=items.schema)
             .distinct())
    return (
        items.join(F.broadcast(cands), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), item_col)
        .limit(k)
    )


def cm_sketch(df: DataFrame, item_col: str, depth: int = 4,
              width: int = 256) -> DataFrame:
    """Count-Min sketch as a DataFrame: ``depth`` independent hash rows of
    ``width`` buckets, each cell holding the count of items hashing there —
    (row, bucket, cnt), depth×width cells total regardless of stream size.
    Hashing is the portable md5-prefix (row index salted into the hash), so
    the sketch — and every estimate read from it — is bit-identical on any
    engine. Merging two sketches = summing cells on (row, bucket); point
    estimates over-count only (collision bias), never under-count.

    Scale shape: one map-side explode into depth cells per item, then a
    partial-aggregated count on (row, bucket) — the same single-shuffle
    discipline as any hash aggregation, with output bounded at depth×width
    rows however large the input.
    """
    from akka_stream_contrib_spark.functions.text import token_id
    cells = F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            F.pmod(token_id(F.concat(F.lit(f"{i}:"), F.col(item_col))),
                   F.lit(width)).cast("int").alias("bucket"))
        for i in range(depth)
    ])
    return (df.select(F.explode(cells).alias("c"))
            .groupBy(F.col("c.row").alias("row"),
                     F.col("c.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cm_estimate(sketch: DataFrame, items: DataFrame, item_col: str,
                depth: int = 4, width: int = 256,
                out: str = "est_count") -> DataFrame:
    """Point-frequency estimates from a :func:`cm_sketch`: hash each query
    item with the same salted hashes, look its cells up in the sketch
    (broadcast — it is at most depth×width rows), and take the MIN over the
    depth rows. Reads only the sketch, never the original stream."""
    from akka_stream_contrib_spark.functions.text import token_id
    cells = F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            F.pmod(token_id(F.concat(F.lit(f"{i}:"), F.col(item_col))),
                   F.lit(width)).cast("int").alias("bucket"))
        for i in range(depth)
    ])
    probes = (items.select(F.col(item_col), F.explode(cells).alias("c"))
              .select(item_col, F.col("c.row").alias("row"),
                      F.col("c.bucket").alias("bucket")))
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return (joined.groupBy(item_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out)))


def _bloom_positions(key, m_bits: int, k_hashes: int):
    """The k bit positions of ``key`` — same portable affine family over the
    md5-prefix hash as the MinHash signatures (a=6i+7, b=3i+1), so every
    engine (and the DuckDB oracle) reproduces the sketch bit-for-bit."""
    from akka_stream_contrib_spark.functions.text import token_id
    h = token_id(key.cast("string"))
    return [
        (F.lit(6 * i + 7) * h + F.lit(3 * i + 1)) % F.lit(m_bits)
        for i in range(k_hashes)
    ]


def bloom_build(df: DataFrame, key_col: str, m_bits: int = 65536,
                k_hashes: int = 4) -> DataFrame:
    """Build a Bloom filter over a key column as a TABLE of 32-bit words
    (word, bits) — the mergeable, engine-portable representation: union two
    filters with ``bit_or`` on word, broadcast it to prune a join, persist
    it as the daily membership index. At 100 TB the filter for a billion
    keys at 1% fp is ~1.2 GB of words — shardable because it IS a table,
    unlike an opaque sketch blob.

    One map-side position expansion (k rows per key) + one bit_or
    aggregation on the uniform word index. No false negatives; false
    positives at the standard (1-e^{-kn/m})^k rate (asserted in tests).
    """
    pos = (df.select(F.explode(F.array(
        *_bloom_positions(F.col(key_col), m_bits, k_hashes))).alias("pos")))
    return (pos.select((F.col("pos") / F.lit(32)).cast("bigint").alias("word"),
                       F.expr("shiftleft(cast(1 as bigint),"
                              " cast(pos % 32 as int))").alias("_m"))
            .groupBy("word").agg(F.bit_or("_m").alias("bits")))


def bloom_probe(bloom: DataFrame, df: DataFrame, key_col: str,
                m_bits: int = 65536, k_hashes: int = 4) -> DataFrame:
    """Probe a `bloom_build` table: (key, member) for every input row —
    member = all k bits set (guaranteed true for every inserted key; false
    positives possible, false negatives never). The filter words broadcast
    (they are k·n bits / 32 words at most); the probe side is one map-side
    expansion + a per-key conditional count — the join-pruning shape:
    ``big.join(broadcast(bloom_probe(...)), ...)`` drops most non-matching
    rows before any shuffle of the big side."""
    # DISTINCT keys first: a key probed from m input rows would otherwise
    # contribute m*k hit rows and fail the sum == k membership test — a
    # false negative the filter's contract forbids (one output row per
    # distinct key either way)
    pos = df.select(F.col(key_col).alias("key")).distinct().select(
        "key",
        F.explode(F.array(
            *_bloom_positions(F.col("key"), m_bits, k_hashes))).alias("pos"))
    probed = (pos
              .withColumn("word", (F.col("pos") / F.lit(32)).cast("bigint"))
              .withColumn("_m", F.expr("shiftleft(cast(1 as bigint),"
                                       " cast(pos % 32 as int))"))
              .join(F.broadcast(bloom), "word", "left")
              .withColumn("_hit",
                          (F.coalesce(F.col("bits"), F.lit(0))
                           .bitwiseAND(F.col("_m")) != 0).cast("int")))
    return (probed.groupBy("key")
            .agg((F.sum("_hit") == F.lit(k_hashes)).alias("member")))


def histogram_quantiles(df: DataFrame, key: str, value: str = "value",
                        lo: float = 0.0, hi: float = 1000.0,
                        n_bins: int = 64, qs: Sequence[float] = (0.5, 0.9, 0.99),
                        ) -> DataFrame:
    """Mergeable fixed-bin histogram quantiles per ``key``: estimate each
    requested quantile by linear interpolation inside the first bin whose
    cumulative count reaches ``ceil(q*n)`` — the classic distributed
    quantile sketch (fixed boundaries make per-partition histograms
    trivially mergeable by addition, unlike exact percentiles which need a
    sort). Values clamp into [lo, hi).

    Output: (key, q, est, n). Scale shape: ONE map-side-combined shuffle to
    the (key, bin) count table (≤ n_bins rows per key); the cumulative
    walk and quantile probe are windows over those ≤ n_bins rows — no
    global sort, no per-value window, streaming/incremental friendly.
    Engine-stable: counts are integers and the interpolation is one double
    expression evaluated identically from them.
    """
    counts = histogram_build(df, key=key, value=value, lo=lo, hi=hi,
                             n_bins=n_bins)
    return histogram_probe(counts, qs=qs, lo=lo, hi=hi, n_bins=n_bins)


def histogram_build(df: DataFrame, key: str, value: str = "value",
                    lo: float = 0.0, hi: float = 1000.0, n_bins: int = 64
                    ) -> DataFrame:
    """Build stage of the histogram sketch: the (key, bin, cnt) count
    table. Mergeable by addition — works identically as a STREAMING
    aggregation (see streaming/rollup.py::histogram_stream) or a
    per-shard table merged with a second groupBy-sum."""
    w = (hi - lo) / n_bins
    v = F.col(value).cast("double")
    bin_ = F.least(F.greatest(F.floor((v - F.lit(lo)) / F.lit(w)), F.lit(0)),
                   F.lit(n_bins - 1)).cast("int")
    # NULL values carry no position: unfiltered they would form a NULL bin
    # that sorts FIRST in the probe's cumulative walk and inflates n,
    # shifting every quantile estimate. The same goes for NaN — Spark's
    # double->long floor coerces NaN to 0, silently counting every NaN in
    # bin 0 and dragging all estimates toward lo.
    return (df.filter(v.isNotNull() & ~F.isnan(v))
            .select(F.col(key).alias("key"), bin_.alias("bin"))
            .groupBy("key", "bin").agg(F.count(F.lit(1)).alias("cnt")))


def histogram_build_split(df: DataFrame, is_live, key: str,
                          ref_value, live_value,
                          lo: float = 0.0, hi: float = 1000.0,
                          n_bins: int = 64) -> tuple[DataFrame, DataFrame]:
    """Both sides of a live-vs-reference histogram pair from ONE scan of a
    single source, for the case the two slices are a row-level split of
    the same table (`is_live` must be non-NULL on every row) — the
    sketch-level twin of ``ml.psi_drift_split``. Two separate
    ``histogram_build`` calls over complementary filters each read every
    row of the source (a residue/id-parity predicate prunes no row
    groups), doubling the corpus scan+decode for zero extra information.

    One conditional-count aggregate yields both (key, bin, cnt) tables;
    the ≤ keys x n_bins tagged table is pipeline-cached so the two slices
    and all four of ``psi_probe``'s reads share the single scan.
    Value-identical to the two-build form by construction: each side's
    rows are binned on ITS value expression, the NULL/NaN guard applies
    to the side-selected value (scaling preserves NULL/NaN-ness either
    way), and the cnt>0 slice filters reproduce exactly
    ``histogram_build``'s only-bins-with-counts row set."""
    from akka_stream_contrib_spark.util import pipeline_cache

    w = (hi - lo) / n_bins
    v = F.when(is_live, live_value).otherwise(ref_value).cast("double")
    bin_ = F.least(F.greatest(F.floor((v - F.lit(lo)) / F.lit(w)), F.lit(0)),
                   F.lit(n_bins - 1)).cast("int")
    live_i = is_live.cast("int")
    tagged = (df.filter(v.isNotNull() & ~F.isnan(v))
              .select(F.col(key).alias("key"), bin_.alias("bin"),
                      live_i.alias("_l"))
              .groupBy("key", "bin")
              .agg(F.sum("_l").alias("_cl"),
                   F.sum(F.lit(1) - F.col("_l")).alias("_cr")))
    tagged = pipeline_cache(tagged)
    live = (tagged.filter(F.col("_cl") > 0)
            .select("key", "bin", F.col("_cl").alias("cnt")))
    ref = (tagged.filter(F.col("_cr") > 0)
           .select("key", "bin", F.col("_cr").alias("cnt")))
    return live, ref


def histogram_probe(counts: DataFrame, qs: Sequence[float] = (0.5, 0.9, 0.99),
                    lo: float = 0.0, hi: float = 1000.0, n_bins: int = 64
                    ) -> DataFrame:
    """Probe stage: quantile estimates from a (key, bin, cnt) table —
    windows over ≤ n_bins rows per key, so it can run on every
    micro-batch snapshot of a streaming build for pennies."""
    w = (hi - lo) / n_bins
    from pyspark.sql import Window
    wk = Window.partitionBy("key")
    cum = (counts
           .withColumn("cum", F.sum("cnt").over(
               wk.orderBy("bin").rowsBetween(Window.unboundedPreceding,
                                             Window.currentRow)))
           .withColumn("n", F.sum("cnt").over(wk)))
    probes = cum.select(
        "*", F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"))
    # clamp to >= 1: q = 0.0 gives rank 0, which no (cum >= rank AND
    # cum - cnt < rank) bin can satisfy — the probe silently emitted no
    # row for the requested min-estimate quantile
    rank = F.greatest(F.ceil(F.col("q") * F.col("n")), F.lit(1)).cast("bigint")
    hit = probes.filter((F.col("cum") >= rank) & (F.col("cum") - F.col("cnt") < rank))
    est = (F.lit(lo) + F.lit(w) * (F.col("bin")
           + (rank - (F.col("cum") - F.col("cnt"))).cast("double") / F.col("cnt")))
    return hit.select("key", "q", F.round(est, 6).alias("est"), "n")


def psi_probe(counts: DataFrame, ref_counts: DataFrame,
              eps: float = 1e-6) -> DataFrame:
    """Population-Stability-Index drift of a live ``(key, bin, cnt)``
    histogram sketch against a frozen reference sketch with the SAME bin
    geometry — the streaming drift monitor: maintain the live sketch with
    ``streaming/rollup.py::histogram_stream`` (state bounded at
    keys × n_bins, no watermark) and probe any micro-batch snapshot
    against the reference for pennies. Same term math as
    ``ml.psi_drift`` (1e-6 floor on empty buckets, per-bucket terms
    rounded to 9 dp and summed as exact decimal), so a batch recompute
    over the same rows yields the identical PSI.

    Only keys present in BOTH sketches are scored (a key with no
    reference has no drift baseline); within a scored key, a bucket
    missing on one side is a 0-count bucket (the floored share). Returns
    the psi_drift-shaped long form per key:
    (key, bin, p, q, psi_term, psi) with p = reference share, q = live
    share.

    Scale shape: every join/window here runs over sketch-cardinality
    rows (≤ keys × n_bins), never the raw stream — the probe cost is
    independent of how much data the sketch has absorbed.
    """
    from pyspark.sql import Window

    rt = ref_counts.groupBy("key").agg(F.sum("cnt").alias("_tp"))
    lt = counts.groupBy("key").agg(F.sum("cnt").alias("_tq"))
    keys = rt.join(lt, "key")
    merged = (ref_counts.select("key", "bin", F.col("cnt").alias("_cp"))
              .join(counts.select("key", "bin", F.col("cnt").alias("_cq")),
                    ["key", "bin"], "full_outer")
              .join(keys, "key"))
    p = (F.coalesce("_cp", F.lit(0)).cast("double")
         / F.col("_tp").cast("double"))
    q = (F.coalesce("_cq", F.lit(0)).cast("double")
         / F.col("_tq").cast("double"))
    pe = F.greatest(p, F.lit(eps))
    qe = F.greatest(q, F.lit(eps))
    term = F.round((pe - qe) * F.log(pe / qe), 9).cast("decimal(15,9)")
    per = merged.select("key", "bin",
                        (F.round(p, 6) + F.lit(0.0)).alias("p"),
                        (F.round(q, 6) + F.lit(0.0)).alias("q"),
                        term.alias("_term"))
    wk = Window.partitionBy("key")
    return per.select(
        "key", "bin", "p", "q",
        (F.col("_term").cast("double") + F.lit(0.0)).alias("psi_term"),
        (F.round(F.sum("_term").over(wk).cast("double"), 6) + F.lit(0.0))
        .alias("psi"))
