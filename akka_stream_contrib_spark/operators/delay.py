"""Delay operators.

``delay_flow`` re-expresses ``DelayFlow`` (DelayFlow.scala:21-161): delay each
element by ``strategy.nextDelay(elem)``. Processing-time sleeping does not
exist in a batch plan; the durable Spark semantic is an event-time shift — a
``deliver_ts`` column the downstream windows/sinks key on. The built-in
strategies map to Column expressions:

- ``fixedDelay`` → constant interval.
- per-element strategy → any Column in seconds (e.g. derived from the row).
- ``linearIncreasingDelay`` (DelayFlow.scala:60-102: step * consecutive
  "needsIncrease" elements, reset on false, capped) → windowed run-length of
  the needsIncrease predicate × step, capped with ``least``.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from akka_stream_contrib_spark.util import normalize_cols


def delay_flow(
    delay_seconds: Column,
    ts: str = "ts",
    out: str = "deliver_ts",
) -> Callable[[DataFrame], DataFrame]:
    """Shift each element's event time by a per-element delay (seconds)."""

    def _apply(df: DataFrame) -> DataFrame:
        return df.withColumn(
            out, F.timestamp_add("SECOND", delay_seconds.cast("int"), F.col(ts))
        )

    return _apply


def linear_increasing_delay(
    needs_increase: Column,
    step_seconds: float,
    max_delay_seconds: float,
    seq: str = "seq",
    partition_by: Sequence[str] | None = None,
) -> Column:
    """Delay column implementing DelayStrategy.linearIncreasingDelay
    (DelayFlow.scala:60-102): delay = step × (length of the current
    consecutive run of needs_increase rows), reset when the predicate is
    false, capped at max.

    Uses the islands trick: run id = cumsum of NOT-predicate markers; the
    position within the run is the multiplier.
    """
    base = Window.partitionBy(*normalize_cols(partition_by)) if partition_by else Window.partitionBy()
    cum = base.orderBy(seq).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # closed form: run-position = cumulative trues minus cumulative trues as of
    # the most recent false row (the run start)
    trues = F.sum(F.when(needs_increase, 1).otherwise(0)).over(cum)
    run_start_trues = F.max(F.when(~needs_increase, trues)).over(cum)
    mult = F.when(needs_increase, trues - F.coalesce(run_start_trues, F.lit(0))).otherwise(F.lit(0))
    return F.least(mult * F.lit(step_seconds), F.lit(max_delay_seconds))
