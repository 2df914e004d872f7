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


def embedding_drift_sink(stream_df: DataFrame, ref_profile: DataFrame,
                         path: str, vec_col: str = "embedding",
                         min_batch_rows: int = 2):
    """Per-micro-batch embedding-drift monitor — the streaming twin of
    ``functions/ml.py::embedding_dim_drift``: every batch's per-dimension
    moments are compared against a PRECOMPUTED reference profile and the
    standardized mean difference lands as one row per dimension per batch
    at ``path`` (parquet, partitioned by ``batch_id`` with dynamic
    partition overwrite — a foreachBatch retry rewrites its own batch's
    partition instead of appending duplicates), so an encoder swap in a
    live ingest shows up within one trigger interval.

    Layout note: the batch_id-partitioned layout is NOT compatible with a
    path written by the pre-r10 flat-append form of this sink — point an
    upgraded query at a fresh path (mixing the two trips Spark's partition
    discovery). Readers see ``batch_id`` as an inferred integer partition
    column (directory-name inference), not the written long.

    ``ref_profile`` must carry (dim, mean_ref, var_ref) — build it once
    from the reference corpus::

        ref.select(F.posexplode(...)) .groupBy("dim").agg(avg, var_pop)

    It is collected ONCE at sink construction (embedding-width rows — the
    bounded-broadcast budget class) so each micro-batch pays only its own
    map-side explode + one width-sized aggregation, never a join against
    a second stream. Batches with fewer than ``min_batch_rows`` vectors
    are recorded with NULL smd (a 1-vector batch has no variance).

    Returns a ready-to-``start()`` DataStreamWriter (foreachBatch).
    """
    prof = {int(r["dim"]): (float(r["mean_ref"]), float(r["var_ref"]))
            for r in ref_profile.collect()}
    spark_ref = stream_df.sparkSession
    monitor = _drift_monitor(prof, spark_ref, path, vec_col, min_batch_rows)
    return stream_df.writeStream.foreachBatch(monitor)


def _drift_monitor(prof: dict, spark_ref, path: str, vec_col: str,
                   min_batch_rows: int):
    """The per-micro-batch monitor body, factored out so tests can replay
    a batch_id (the foreachBatch at-least-once retry) directly."""

    def _monitor(batch_df: DataFrame, batch_id: int) -> None:
        ex = batch_df.select(
            F.posexplode(F.col(vec_col).cast("array<double>"))
            .alias("dim", "_v"))
        stats = (ex.groupBy("dim")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.avg("_v").alias("mean_cur"),
                      F.var_pop("_v").alias("var_cur"))
                 .collect())
        rows = []
        for r in stats:
            d = int(r["dim"])
            if d not in prof:
                continue
            m_ref, v_ref = prof[d]
            if int(r["n"]) >= min_batch_rows:
                pooled = ((v_ref + float(r["var_cur"])) / 2.0) ** 0.5
                smd = (round((float(r["mean_cur"]) - m_ref) / pooled, 6)
                       if pooled > 0 else None)
            else:
                smd = None
            rows.append((int(batch_id), d, int(r["n"]),
                         round(float(r["mean_cur"]), 6), m_ref, smd))
        if rows:
            # foreachBatch is AT-LEAST-ONCE: a retried micro-batch must
            # overwrite ITS OWN batch_id partition, not append a duplicate
            # set of monitor rows (r9 ADVICE). Dynamic partition overwrite
            # touches only the partitions present in this write — exactly
            # this batch_id — leaving every other batch's rows intact.
            (spark_ref.createDataFrame(
                rows, "batch_id long, dim int, n long, mean_cur double, "
                      "mean_ref double, smd double")
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id")
             .parquet(path))

    return _monitor
