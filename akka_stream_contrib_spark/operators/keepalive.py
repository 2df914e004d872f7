"""Keep-alive / heartbeat.

``keep_alive_concat`` re-expresses ``KeepAliveConcat`` (KeepAliveConcat.scala:34-81):
maintain a base output rate by injecting extrapolated elements when upstream is
idle for longer than ``interval``.

Batch/event-time form: for each gap between consecutive elements (per key)
longer than the interval, generate heartbeat rows on the interval grid carrying
the extrapolated (last-seen) value. ``sequence()`` + ``explode`` generates the
grid inside the executors — no driver involvement, scales with the data.

Processing-time streaming form: ``streaming.stateful.keep_alive_stream``
(state timer re-emitting the last value).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from akka_stream_contrib_spark.util import normalize_cols


def keep_alive_concat(
    interval_seconds: int,
    value_cols: Sequence[str],
    ts: str = "ts",
    partition_by: Sequence[str] | None = None,
    heartbeat_col: str = "is_heartbeat",
) -> Callable[[DataFrame], DataFrame]:
    """Union of the original rows (``is_heartbeat=false``) and extrapolated
    heartbeat rows (``is_heartbeat=true``) emitted every ``interval_seconds``
    inside gaps where the next element is more than one interval away.

    Heartbeats for the gap after row r occur at ts(r)+i, ts(r)+2i, ...
    strictly before ts(next); their ``value_cols`` repeat row r's values
    (extrapolate = repeat-last, the reference's canonical strategy).
    """

    def _apply(df: DataFrame) -> DataFrame:
        keys = normalize_cols(partition_by)
        base = Window.partitionBy(*keys) if keys else Window.partitionBy()
        w = base.orderBy(ts)
        step = F.expr(f"INTERVAL {interval_seconds} SECOND")
        nxt = F.lead(ts).over(w)
        src = df.select(*keys, ts, *value_cols).withColumn("_next_ts", nxt)
        hb = (
            src.filter(F.col("_next_ts") > F.col(ts) + step)
            .withColumn(
                "_grid",
                F.sequence(
                    F.col(ts) + step,
                    F.col("_next_ts") - F.expr("INTERVAL 1 MICROSECOND"),
                    step,
                ),
            )
            .withColumn("_hb_ts", F.explode("_grid"))
            .select(
                *keys,
                F.col("_hb_ts").alias(ts),
                *value_cols,
                F.lit(True).alias(heartbeat_col),
            )
        )
        orig = df.select(*keys, ts, *value_cols).withColumn(heartbeat_col, F.lit(False))
        return orig.unionByName(hb)

    return _apply
