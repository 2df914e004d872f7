"""Slowly-changing-dimension (type 2) interval build.

Collapse a keyed change-event stream into validity intervals: one row per
run of an unchanged attribute value, carrying ``[valid_from, valid_to)`` and
an ``is_current`` flag. This is the warehouse-side dual of
``AccumulateWhileUnchanged`` (reference
`src/main/scala/akka/stream/contrib/AccumulateWhileUnchanged.scala:26-126`):
the same run detection over an explicit order column, but the emitted shape
is the dimension-table contract (interval endpoints) instead of the buffered
element group.

Scale shape: one hash shuffle on the key; both window passes (lag for run
starts, lead for interval ends) and the intermediate filter share that
partitioning, so Catalyst plans a single Exchange. State per key is O(1) —
no collect_list, intervals derive from the run-start rows alone.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(key: str = "user_id", attr: str = "event_type",
                   ts: str = "ts", seq: str = "event_id",
                   ) -> Callable[[DataFrame], DataFrame]:
    """Build SCD2 validity intervals for ``attr`` per ``key``.

    A new interval opens at every row whose ``attr`` differs from the
    previous row of the same key (in ``seq`` order; null-safe so a null
    attribute is a state too). ``valid_to`` is the next interval's
    ``valid_from`` (exclusive end; NULL = still open), the half-open
    convention that lets point-in-time lookups use
    ``valid_from <= t AND (t < valid_to OR valid_to IS NULL)``.
    """

    def _apply(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(key).orderBy(seq)
        prev = F.lag(attr).over(w)
        is_first = F.row_number().over(w) == 1  # null-safe run start
        starts = df.withColumn(
            "_new_run",
            is_first | ~F.col(attr).eqNullSafe(prev),
        ).filter("_new_run")
        return starts.select(
            F.col(key),
            F.col(attr).alias("state"),
            F.col(seq).alias("valid_from_seq"),
            F.col(ts).alias("valid_from"),
            F.lead(ts).over(w).alias("valid_to"),
            F.lead(ts).over(w).isNull().alias("is_current"),
        )

    return _apply


def scd2_as_of(at, key: str = "user_id",
               ) -> Callable[[DataFrame], DataFrame]:
    """Point-in-time lookup over an SCD2 interval table (the output of
    :func:`scd2_intervals` or ``streaming/sinks.py::read_scd2``): each
    key's state valid AT the given instant, under the half-open
    ``[valid_from, valid_to)`` contract — a change AT ``at`` is already in
    effect, the closed-out state is not.

    Keys whose first interval opens after ``at`` have no row (they did not
    exist yet). Emits (key, state, valid_from, valid_from_seq).

    Scale shape: a pure map-side filter over the interval table — the
    predicate prunes to ≤ one row per key with no window, join, or
    shuffle; with the table partitioned on ``valid_from`` date the scan
    itself prunes to the intervals overlapping ``at``.
    """

    def _apply(df: DataFrame) -> DataFrame:
        t = F.lit(at).cast("timestamp")
        return (df.filter((F.col("valid_from") <= t)
                          & (F.col("valid_to").isNull()
                             | (t < F.col("valid_to"))))
                .select(key, "state", "valid_from", "valid_from_seq"))

    return _apply
