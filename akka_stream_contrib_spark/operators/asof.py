"""As-of (time-travel) join.

Not in the reference surface (SURVEY.md §2.7 lists joins as absent), but a
required capability for time-series/feature pipelines: for every left row,
attach the most recent right row with ``right.ts <= left.ts`` per key.

Spark has no ASOF JOIN; the scalable formulation is the **union trick**:

    union(left tagged, right tagged)
      → window last_value(right payload, ignoreNulls) over
        (partition by key order by ts, side rows unbounded preceding..current)
      → keep left rows

One shuffle on the key (the same shuffle a plain join would pay), no range
explosion, no skew beyond the key distribution — this is the plan that
survives 100 TB, unlike a theta-join (`r.ts <= l.ts`) which Spark executes as
a broadcast-nested-loop.

Right rows sort before left rows at equal ts (side 0 < side 1), so an exact
timestamp match IS matched — same tie rule as DuckDB ASOF JOIN (>=).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str = "ts",
    right_cols: Sequence[str] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """Attach to each ``left`` row the latest ``right`` row at-or-before its
    ``ts``, matching on the ``on`` key columns. Right payload columns appear
    as ``<col><suffix>`` (null when no right row precedes)."""
    right_cols = list(right_cols) or [
        c for c in right.columns if c not in set(on) | {ts}]
    lcols = [c for c in left.columns]
    l_tagged = left.select(
        *[F.col(c) for c in on], F.col(ts),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in on], F.col(ts),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*right_cols).alias("_r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (Window.partitionBy(*on).orderBy(ts, "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.withColumn("_rlast", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        "_l.*",
        *[F.col(f"_rlast.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out
