"""Time-series regularization: resample each key onto a fixed-step grid and
forward-fill the last observation.

The standard feature-engineering prep for event streams feeding training
pipelines (models want regular time steps; events arrive irregularly).
Scale shape: grid generation is per-key `sequence()` + explode (map-side
after one tiny bounds aggregate), and the fill is ONE window pass over a
single hash shuffle on the key — the same union trick as
`operators/asof.py::as_of_join` (reference analogue: KeepAliveConcat's
extrapolate-on-idle, `KeepAliveConcat.scala:54-61`, with event-time grid
ticks instead of wall-clock timers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    value: str = "value",
    step: str = "interval 1 day",
    align: str = "day",
) -> DataFrame:
    """Per ``key``: emit one row per ``step`` from ``date_trunc(align,
    min(ts))`` through ``max(ts)``, carrying the most recent observation at
    or before each grid instant (null until the first observation).

    Output: (key, grid_ts, value_ffill). Observations sort before the grid
    tick at the same instant, so an exact-time observation fills its own
    tick; ties among observations break on the ordering of ``value`` rows'
    original positions being irrelevant — supply unique (key, ts) or accept
    the max-position row.
    """
    bounds = df.groupBy(key).agg(
        F.date_trunc(align, F.min(ts)).alias("_mn"), F.max(ts).alias("_mx"))
    grid = bounds.select(
        key, F.explode(F.expr(f"sequence(_mn, _mx, {step})")).alias(ts))
    obs = df.select(key, ts, F.col(value).alias("_v"), F.lit(0).alias("_src"))
    ticks = grid.select(key, ts, F.lit(None).cast(obs.schema["_v"].dataType).alias("_v"),
                        F.lit(1).alias("_src"))
    w = (Window.partitionBy(key).orderBy(ts, "_src")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        obs.unionByName(ticks)
        .withColumn("_fill", F.last("_v", ignorenulls=True).over(w))
        .filter(F.col("_src") == 1)
        .select(key, F.col(ts).alias("grid_ts"), F.col("_fill").alias("value_ffill"))
    )
