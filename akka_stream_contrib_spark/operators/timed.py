"""Instrumentation operators.

- ``timed_interval_between``: interval between consecutive elements matching a
  predicate — reference ``Timed.timedIntervalBetween`` (Timed.scala:71-87,
  164-197). Pure ``lag`` window expression over event time.
- ``with_ingest_ts`` / ``latency_columns``: per-element in→out latency —
  reference ``LatencyTimer`` (latencyTimer.scala:145-199). The reference wraps
  a flow with start/stop probes; on Spark the probe is an ingest timestamp
  column stamped at source and differenced at the sink.
- ``timed_section``: wall time of a whole section — reference ``Timed.timed``
  (Timed.scala:28-56) — as a context manager around an action.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from akka_stream_contrib_spark.util import epoch_micros, normalize_cols


def timed_interval_between(
    matching: Column,
    ts: str = "ts",
    seq: str = "seq",
    partition_by: Sequence[str] | None = None,
    out: str = "interval_us",
) -> Callable[[DataFrame], DataFrame]:
    """For elements matching the predicate, microseconds since the previous
    matching element (in ``seq`` order); first match has NULL (the reference
    only reports from the second match on, Timed.scala:180-189)."""

    def _apply(df: DataFrame) -> DataFrame:
        matched = df.filter(matching)
        if partition_by:
            w = Window.partitionBy(*normalize_cols(partition_by)).orderBy(seq)
            return matched.withColumn(
                out, epoch_micros(ts) - F.lag(epoch_micros(ts)).over(w))
        # unkeyed = TRUE global order: two-phase range lag — never a
        # single-partition Window.orderBy (the 100 TB scale shape)
        from akka_stream_contrib_spark.operators.global_order import global_lag
        lagged = global_lag(matched, seq, epoch_micros(ts), "_prev_us")
        return (lagged
                .withColumn(out, epoch_micros(ts) - F.col("_prev_us"))
                .drop("_prev_us"))

    return _apply


def with_ingest_ts(col: str = "ingest_ts") -> Callable[[DataFrame], DataFrame]:
    """Stamp processing-time at ingest (LatencyTimer's StartTimeFlow).

    The stamp is the PLAN-BUILD wall clock (a driver-side literal), not
    ``current_timestamp()``: Spark evaluates current_timestamp once per
    query, so stamping and measuring inside the same query would subtract
    the constant from itself and report zero latency for every row. With a
    build-time literal, ``latency_columns`` in the same query measures
    build→execution delay; across materializations (stamp, persist/write,
    measure later — the LatencyTimer deployment shape) it measures real
    pipeline latency. In Structured Streaming, stamp per micro-batch
    inside ``foreachBatch`` for an execution-time stamp."""

    def _apply(df: DataFrame) -> DataFrame:
        if df.isStreaming:
            # a streaming plan is built ONCE: the literal would stamp every
            # future micro-batch with the same instant and measured latency
            # would grow without bound — loud error instead of silent drift
            raise ValueError(
                "with_ingest_ts on a streaming DataFrame would freeze the "
                "stamp at plan-build time; stamp each micro-batch inside "
                "foreachBatch instead (df.transform(with_ingest_ts()) on "
                "the batch frame)")
        from datetime import datetime, timezone
        stamp = datetime.now(timezone.utc).replace(tzinfo=None)
        return df.withColumn(col, F.lit(stamp).cast("timestamp"))

    return _apply


def latency_columns(ingest_col: str = "ingest_ts", out: str = "latency_us") -> Callable[[DataFrame], DataFrame]:
    """Measure in→out latency at the sink side (LatencyTimer's StopTimeFlow).
    Emit alongside the element — the reference's TimedResult side channel is a
    second writer over the same frame."""

    def _apply(df: DataFrame) -> DataFrame:
        return df.withColumn(
            out, F.unix_micros(F.current_timestamp()) - F.unix_micros(F.col(ingest_col))
        )

    return _apply


@contextmanager
def timed_section(on_complete: Callable[[float], None]):
    """Measure wall time of a section of driver code containing Spark actions —
    ``Timed.timed``'s Future-completion callback becomes a context exit."""
    t0 = time.monotonic()
    try:
        yield
    finally:
        on_complete(time.monotonic() - t0)


def observed(df, name: str, *agg_cols):
    """Attach an Observation — the exact analogue of the reference's
    materialized summary values (`LastElement.scala:39-46` Future[Option],
    `ZipInputStreamSource.scala:92-94` Future[Long] total bytes): metrics
    computed DURING the main pass, delivered out-of-band after the action,
    with zero extra jobs.

    Returns (df_with_observation, observation); read ``observation.get``
    after any action on the returned frame.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *agg_cols), obs
