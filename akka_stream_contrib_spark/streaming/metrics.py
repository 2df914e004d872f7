"""Streaming observability — the reference's instrumentation side-channels.

- ``ProgressRecorder``: StreamingQueryListener collecting per-microbatch
  progress (rows, durations) — the durable form of ``LatencyTimer``'s
  TimedResult side sink (latencyTimer.scala:94-124) and ``Timed``'s
  materialized duration callback (Timed.scala:28-56).
- ``pulse_stream``: conflate-to-latest per trigger — the streaming form of
  ``Pulse`` (Pulse.scala:24-44): at most one element per key per microbatch,
  demand (trigger) driven.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchProgress:
    batch_id: int
    num_input_rows: int
    duration_ms: dict


class ProgressRecorder(StreamingQueryListener):
    """Attach with ``spark.streams.addListener(rec)``; read ``rec.batches``.
    The reference's onComplete/onInterval callbacks become listener events."""

    def __init__(self):
        self.batches: list[BatchProgress] = []
        self.started = False
        self.terminated = False

    def onQueryStarted(self, event):
        self.started = True

    def onQueryProgress(self, event):
        p = event.progress
        self.batches.append(BatchProgress(
            batch_id=p.batchId,
            num_input_rows=p.numInputRows,
            duration_ms=dict(p.durationMs) if p.durationMs else {},
        ))

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        self.terminated = True


def pulse_stream(df: DataFrame, key_col: str, order_col: str) -> DataFrame:
    """Latest row per key per microbatch (conflate + pulse). Use with
    ``outputMode('update')`` or foreachBatch; each trigger emits at most one
    row per key — exactly the reference's one-element-per-pulse contract.

    Rows whose ``order_col`` is NULL are unordered and excluded up front:
    max_by already ignores NULL ordering keys, but a key whose batch rows
    are ALL NULL-ordered would otherwise emit a fabricated all-NULL payload
    row (the reference's Pulse never invents elements)."""
    return (df.filter(F.col(order_col).isNotNull())
            .groupBy(key_col).agg(
        F.max_by(F.struct(*[c for c in df.columns if c != key_col]),
                 F.col(order_col)).alias("_latest")
    ).select(key_col, "_latest.*"))
