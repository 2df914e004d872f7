"""Time-window family.

- ``time_window``: tumbling-window aggregate — reference ``TimeWindow.scala:33-34``
  (conflateWithSeed + Pulse). Wall-clock duration becomes event-time windows.
- ``sliding_window``: Spark-native generalization (reference has none).
- ``session_window_agg``: gap-based sessions — the ``maxDuration`` trigger of
  ``AccumulateWhileUnchanged.scala:115-126`` in its durable event-time form.
- ``pulse``: at most one element per interval — reference ``Pulse.scala:24-44``
  ("latest value per pulse"); batch form = last row per time bucket.
- ``interval_based_rate_limiter``: batches of ≤ maxBatchSize at least
  minInterval apart — reference ``IntervalBasedRateLimiter.scala:28-29``.
  Batch form materializes the batch assignment (bucket + batch ordinal);
  streaming admission control is ``maxOffsetsPerTrigger`` + ProcessingTime
  trigger on the query (§4.1 of SURVEY.md).

All are plain groupBy/window aggregates: partial aggregation map-side, one
shuffle on (keys, window) — the canonical scalable shape.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from akka_stream_contrib_spark.util import normalize_cols


def time_window(
    duration: str,
    agg_exprs: Sequence[Column],
    ts: str = "ts",
    partition_by: Sequence[str] | None = None,
    start_col: str = "window_start",
) -> Callable[[DataFrame], DataFrame]:
    """Tumbling event-time window aggregate; emits one row per window."""

    def _apply(df: DataFrame) -> DataFrame:
        keys = normalize_cols(partition_by)
        out = df.groupBy(*keys, F.window(ts, duration).alias("_w")).agg(*agg_exprs)
        return out.withColumn(start_col, F.col("_w.start")).drop("_w")

    return _apply


def sliding_window(
    duration: str,
    slide: str,
    agg_exprs: Sequence[Column],
    ts: str = "ts",
    partition_by: Sequence[str] | None = None,
    start_col: str = "window_start",
) -> Callable[[DataFrame], DataFrame]:
    """Sliding event-time window aggregate (each row lands in
    duration/slide windows)."""

    def _apply(df: DataFrame) -> DataFrame:
        keys = normalize_cols(partition_by)
        out = df.groupBy(*keys, F.window(ts, duration, slide).alias("_w")).agg(*agg_exprs)
        return out.withColumn(start_col, F.col("_w.start")).drop("_w")

    return _apply


def session_window_agg(
    gap: str,
    agg_exprs: Sequence[Column],
    ts: str = "ts",
    partition_by: Sequence[str] | None = None,
    start_col: str = "session_start",
) -> Callable[[DataFrame], DataFrame]:
    """Sessions closed by ``gap`` of inactivity, per key."""

    def _apply(df: DataFrame) -> DataFrame:
        keys = normalize_cols(partition_by)
        out = df.groupBy(*keys, F.session_window(ts, gap).alias("_w")).agg(*agg_exprs)
        return out.withColumn(start_col, F.col("_w.start")).drop("_w")

    return _apply


def pulse(
    interval: str,
    ts: str = "ts",
    partition_by: Sequence[str] | None = None,
    bucket_col: str = "bucket_start",
    tiebreak: str | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Latest element per ``interval`` bucket (per key) — conflate + pulse.

    ``tiebreak``: extra ordering column (e.g. a seq) used when two rows share a
    timestamp, keeping the result deterministic.
    """

    def _apply(df: DataFrame) -> DataFrame:
        keys = normalize_cols(partition_by)
        out = df.withColumn(bucket_col, F.window(ts, interval)["start"])
        order = [F.col(ts).desc()] + ([F.col(tiebreak).desc()] if tiebreak else [])
        w = Window.partitionBy(*keys, bucket_col).orderBy(*order)
        return (
            out.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    return _apply


def interval_based_rate_limiter(
    min_interval: str,
    max_batch_size: int,
    ts: str = "ts",
    seq: str = "seq",
    partition_by: Sequence[str] | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Assign each row to an emission batch: bucket = tumbling ``min_interval``
    window of ``ts``; within a bucket, rows are chunked into batches of
    ``max_batch_size`` in ``seq`` order.

    Output: one row per batch with ``bucket_start``, ``batch_no``,
    ``batch_size``, ``first_seq``/``last_seq`` — the invariants tested by
    ``IntervalBasedRateLimiterSpec.scala:94-106`` (no loss, no reorder, size
    cap) are assertable directly on this frame.
    """

    def _apply(df: DataFrame) -> DataFrame:
        keys = normalize_cols(partition_by)
        out = df.withColumn("bucket_start", F.window(ts, min_interval)["start"])
        w = Window.partitionBy(*keys, "bucket_start").orderBy(seq)
        out = out.withColumn(
            "batch_no", ((F.row_number().over(w) - 1) / F.lit(max_batch_size)).cast("bigint")
        )
        return (
            out.groupBy(*keys, "bucket_start", "batch_no")
            .agg(
                F.count(F.lit(1)).alias("batch_size"),
                F.min(seq).alias("first_seq"),
                F.max(seq).alias("last_seq"),
            )
        )

    return _apply


def windowed_fold(
    duration: str,
    seed,
    fold,
    value_col: str = "value",
    ts: str = "ts",
    partition_by: Sequence[str] | None = None,
    out_type: str = "double",
):
    """Tumbling window with an ARBITRARY Python fold — the reference
    `TimeWindow.scala:33-34` contract in full generality (`seed: A => S`,
    `aggregate: (S, A) => S` as opaque lambdas, not just algebraic
    aggregates Catalyst knows).

    Rows inside each (keys, window) group are folded IN EVENT-TIME ORDER
    (ties broken by value) inside an Arrow-batched applyInPandas — the fold
    runs once per group, so parallelism = number of windows × keys, and no
    executor ever holds more than one group's rows. Use `time_window` with
    Column aggregates whenever the fold is algebraic — this is the escape
    hatch for genuinely non-algebraic state (the reference's user lambdas).

    Output: (keys..., window_start, result).
    """
    from pyspark.sql.types import (
        StructField, StructType, TimestampType, _parse_datatype_string)
    import pandas as pd

    def _apply(df: DataFrame) -> DataFrame:
        keys = normalize_cols(partition_by)
        spark_fields = [df.schema[k] for k in keys]
        out_schema = StructType(
            spark_fields
            + [StructField("window_start", TimestampType()),
               StructField("result", _parse_datatype_string(out_type))]
        )

        def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values([ts, value_col], kind="mergesort")
            acc = None
            first = True
            for v in pdf[value_col]:
                acc = seed(v) if first else fold(acc, v)
                first = False
            head = {k: [pdf[k].iloc[0]] for k in keys}
            head["window_start"] = [pdf["_ws"].iloc[0]]
            head["result"] = [acc]
            return pd.DataFrame(head)

        grouped = (
            df.withColumn("_ws", F.window(ts, duration).start)
            .groupBy(*keys, "_ws")
        )
        return grouped.applyInPandas(_fold, out_schema)

    return _apply
