"""Incremental time-bucket rollup (continuous aggregate / "hypertable
rollup"): a streaming tumbling-window aggregation materialized into a
partitioned parquet table that downstream batch queries read directly.

Mechanics: the streaming aggregation runs in ``update`` output mode, so each
micro-batch emits only the buckets the batch touched, carrying the NEW
cumulative totals from the state store. The foreachBatch writer dynamically
overwrites exactly those buckets' partitions — an upsert with plain parquet,
no table format. A checkpoint replay recomputes the same cumulative rows and
rewrites the same partitions (idempotent, same argument as
:mod:`~akka_stream_contrib_spark.streaming.sinks`).

At 100 TB of history this is the standard pattern: the rollup table is
~(buckets × keys) rows however large the raw stream is, reads prune on the
bucket partition column, and each trigger's write touches only the buckets
in that trigger — never the history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def incremental_rollup(stream_df: DataFrame, path: str, ts_col: str = "ts",
                       bucket: str = "1 hour", value_col: str = "value",
                       keys: Sequence[str] = (),
                       watermark: str | None = None) -> DataStreamWriter:
    """Return a ready-to-``start()`` writer maintaining count/sum/min/max per
    (time bucket, keys...) at ``path``, partitioned by ``bucket_id``.

    ``watermark`` (e.g. ``"2 hours"``) bounds state: buckets older than the
    watermark are finalized and evicted from the state store — without it the
    state grows with the number of open buckets forever.
    """
    from akka_stream_contrib_spark.util import normalize_cols
    keys = normalize_cols(keys)  # keys="user_id" must not splat into chars
    src = stream_df
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    agg = (
        src.groupBy(F.window(ts_col, bucket).alias("_w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(value_col).alias("sum_value"),
             F.min(value_col).alias("min_value"),
             F.max(value_col).alias("max_value"))
        .select(
            F.date_format("_w.start", "yyyy-MM-dd-HH-mm-ss").alias("bucket_id"),
            F.col("_w.start").alias("bucket_start"), *keys,
            "n", "sum_value", "min_value", "max_value")
    )

    group_keys = ["bucket_id", *keys]

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        """Merge-on-write into the touched bucket partitions. Update mode
        emits only the (bucket, keys) rows this batch changed — but a
        dynamic partition overwrite replaces whole bucket directories, so
        rows of OTHER keys in a touched bucket must be carried over:
        read them back, anti-join on the full group key, union, rewrite.
        ``localCheckpoint`` materializes the carried rows first (a path
        cannot be overwritten while a plan still reads from it). Work per
        trigger is O(touched buckets), never O(history). Idempotent on
        checkpoint replay: re-merging the same rows yields the same
        partitions."""
        spark = batch_df.sparkSession
        out = batch_df
        touched = [r.bucket_id for r in
                   batch_df.select("bucket_id").distinct().collect()]
        if not touched:
            # nothing to upsert. Returning (instead of writing an empty
            # frame) also avoids creating a bare output directory, which a
            # later batch would read as UNABLE_TO_INFER_SCHEMA — an empty
            # or all-NULL-ts first batch must not poison the path
            return
        # NULL-safe touched-partition filter. Spark's window() drops
        # NULL-ts rows, so this writer never produces a NULL bucket_id
        # itself — but isin([None]) silently matching nothing is exactly
        # the bug class that loses the __HIVE_DEFAULT_PARTITION__ carry if
        # a caller ever lands NULL buckets here, so handle it anyway.
        non_null = [b for b in touched if b is not None]
        touched_cond = (F.col("bucket_id").isin(non_null)
                        if non_null else F.lit(False))
        if any(b is None for b in touched):
            touched_cond = touched_cond | F.col("bucket_id").isNull()
        try:
            existing = spark.read.parquet(path).filter(touched_cond)
            # NULL-SAFE anti join: a NULL grouping key never matches under
            # plain equality, so the stale (bucket, NULL) row would survive
            # next to the fresh one and downstream reads would double-count
            fresh_keys = batch_df.select(
                *[F.col(k).alias(f"_fk_{i}")
                  for i, k in enumerate(group_keys)]).distinct()
            anti_cond = None
            for i, k in enumerate(group_keys):
                c = existing[k].eqNullSafe(F.col(f"_fk_{i}"))
                anti_cond = c if anti_cond is None else (anti_cond & c)
            carried = (existing.join(fresh_keys, anti_cond, "left_anti")
                       .localCheckpoint(eager=True))
            out = batch_df.unionByName(carried)
        except AnalysisException as ex:
            # a missing target OR a bare directory with no data files yet
            # (UNABLE_TO_INFER_SCHEMA — e.g. a crashed first write) is
            # "first batch"; any other failure must surface — swallowing it
            # here and overwriting would drop the carried rows of every
            # other key in the touched buckets
            if ("PATH_NOT_FOUND" not in str(ex)
                    and "UNABLE_TO_INFER_SCHEMA" not in str(ex)):
                raise
        # writer-level option, NOT a session-conf toggle: two concurrent
        # foreachBatch writers toggling the session conf race each other, and
        # a concurrently-restored "static" would turn this into a whole-table
        # overwrite
        (out.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("bucket_id").parquet(path))

    return agg.writeStream.outputMode("update").foreachBatch(_upsert)


def read_rollup(spark, path: str) -> DataFrame:
    """Read the materialized rollup (partition pruning applies on
    ``bucket_id``)."""
    return spark.read.parquet(path)


def expire_buckets(spark, path: str, keep_from_bucket_id: str) -> int:
    """Retention for the rollup table: drop bucket partitions strictly older
    than ``keep_from_bucket_id`` (lexicographic on the yyyy-MM-dd-HH-mm-ss
    bucket id — its format sorts chronologically by construction). Returns
    the number of partitions removed. Directory-level deletes: O(expired
    buckets), never touches surviving data."""
    import glob
    import os
    import shutil

    if "://" in path:
        raise ValueError(
            "expire_buckets operates on local paths only; for object stores "
            "delete the bucket_id= prefixes with the store's API")
    removed = 0
    for d in glob.glob(os.path.join(path, "bucket_id=*")):
        bucket = os.path.basename(d).split("=", 1)[1]
        if bucket < keep_from_bucket_id:
            shutil.rmtree(d)
            removed += 1
    return removed


def ohlc_stream(stream_df: DataFrame, ts_col: str = "ts",
                key_col: str = "user_id", value_col: str = "value",
                seq_col: str = "event_id", bucket: str = "1 hour",
                watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of `operators/resample.py::ohlc_resample`: tick→bar
    OHLC candles per (key, event-time window) as a watermarked windowed
    aggregation — the SAME min/max-over-packed-struct aggregate, so batch
    and stream produce identical candles for closed windows. The watermark
    bounds state (open candles only); closed windows finalize and evict.

    Returns a streaming DataFrame (key, window_start, open, high, low,
    close, n) — attach any sink; Trigger.AvailableNow for batch-like runs.
    """
    from pyspark.sql import functions as F

    v = F.col(value_col).cast("decimal(18,4)")
    packed = F.struct(F.col(ts_col).alias("_t"), F.col(seq_col).alias("_q"),
                      v.alias("_v"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col).alias("key"), F.window(ts_col, bucket))
        .agg(F.min(packed).alias("_first"),
             F.max(packed).alias("_last"),
             F.max(v).alias("high"), F.min(v).alias("low"),
             F.count(F.lit(1)).alias("n"))
        .select("key", F.col("window.start").alias("window_start"),
                F.col("_first._v").cast("double").alias("open"),
                F.col("high").cast("double").alias("high"),
                F.col("low").cast("double").alias("low"),
                F.col("_last._v").cast("double").alias("close"),
                "n")
    )


def hll_distinct_stream(stream_df: DataFrame, key_col: str = "event_type",
                        item_col: str = "user_id", lgk: int = 12
                        ) -> DataFrame:
    """Streaming twin of functions/sketches.py::hll_sketch_rollup +
    hll_merge: per-key distinct-count ESTIMATES maintained as HLL sketch
    state in a plain streaming aggregation. The sketch is a commutative
    mergeable monoid (union), so the streaming state equals the batch
    sketch of all data seen so far for ANY batch split, arrival order or
    replay — the histogram_stream merge-soundness argument with union in
    place of addition. State is bounded at keys × 2^lgk registers
    regardless of stream volume (no watermark needed: the sketch never
    grows), and the same snapshot feeds functions/sketches.py::hll_overlap
    for streaming audience-overlap monitoring."""
    from pyspark.sql import functions as F

    return (stream_df
            .filter(F.col(item_col).isNotNull())
            .groupBy(F.col(key_col).alias("key"))
            .agg(F.hll_sketch_agg(F.col(item_col), F.lit(lgk))
                 .alias("sketch"))
            .withColumn("approx_distinct",
                        F.hll_sketch_estimate(F.col("sketch"))))


def histogram_stream(stream_df: DataFrame, key_col: str = "event_type",
                     value_col: str = "value", lo: float = 0.0,
                     hi: float = 1000.0, n_bins: int = 64) -> DataFrame:
    """Streaming twin of functions/sketches.py::histogram_build: the
    per-(key, bin) count table as a plain streaming aggregation. Fixed bin
    boundaries make the histogram mergeable by addition, so the streaming
    state IS the exact batch histogram at every micro-batch — run
    functions/sketches.py::histogram_probe over any snapshot for
    quantiles. State is bounded at keys × n_bins rows regardless of
    stream volume (no watermark needed: the sketch never grows)."""
    from pyspark.sql import functions as F
    w = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    bin_ = F.least(F.greatest(F.floor((v - F.lit(lo)) / F.lit(w)), F.lit(0)),
                   F.lit(n_bins - 1)).cast("int")
    # NULL values carry no position (matches histogram_build): unfiltered,
    # greatest(NULL, 0) = 0 would silently count them in bin 0 and skew
    # every probe quantile low
    return (stream_df
            .filter(v.isNotNull())
            .select(F.col(key_col).alias("key"), bin_.alias("bin"))
            .groupBy("key", "bin")
            .agg(F.count(F.lit(1)).alias("cnt")))
