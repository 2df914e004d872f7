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
    direction: str = "backward",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Attach to each ``left`` row the nearest ``right`` row per the ``on``
    key columns: ``direction="backward"`` (default) takes the latest right
    row with ``right.ts <= left.ts``; ``"forward"`` the earliest with
    ``right.ts >= left.ts`` (same reversed-order window — still one
    shuffle). ``tolerance_s`` bounds the match's age in seconds (pandas
    ``merge_asof`` semantics): a nearest row further away yields NULLs.
    Right payload columns appear as ``<col><suffix>``."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_cols = list(right_cols) or [
        c for c in right.columns if c not in set(on) | {ts}]
    lcols = [c for c in left.columns]
    # carry the matched right row's ts inside the payload for the tolerance test
    r_payload = [*[F.col(c) for c in right_cols], F.col(ts).alias("_rts")]
    l_tagged = left.select(
        *[F.col(c) for c in on], F.col(ts),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*r_payload).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in on], F.col(ts),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*r_payload).alias("_r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # _side asc puts right (0) before left (1) at equal ts in BOTH directions,
    # so an exact timestamp match is matched (>= / <= tie rule)
    order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (Window.partitionBy(*on).orderBy(order, F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.withColumn("_rlast", F.last("_r", ignorenulls=True).over(w))
    matched = F.col("_rlast").isNotNull()
    if tolerance_s is not None:
        from akka_stream_contrib_spark.util import epoch_micros
        age = (epoch_micros(F.col(ts)) - epoch_micros(F.col("_rlast._rts"))
               if direction == "backward"
               else epoch_micros(F.col("_rlast._rts")) - epoch_micros(F.col(ts)))
        matched = matched & (age <= F.lit(int(tolerance_s * 1_000_000)))
    out = carried.filter(F.col("_side") == 1).select(
        "_l.*",
        *[F.when(matched, F.col(f"_rlast.{c}")).alias(f"{c}{suffix}")
          for c in right_cols],
    )
    return out
