"""Exactly-once foreachBatch sinks.

Structured Streaming's checkpoint gives at-least-once delivery to a
foreachBatch callback: a crash between the sink write and the offset commit
replays the batch with the SAME batch_id. Exactly-once therefore reduces to
making the write idempotent per batch_id — the contract the reference leaves
to its sinks (its sources are replayable the same way: FileTailSource
re-reads from ``position``, PagedSource from ``nextKey``).

The pattern here: partition the output directory by ``_batch_id`` and
dynamically overwrite ONLY the replayed batch's partition. A replay rewrites
byte-identical files into the same directory instead of appending
duplicates. Partition-granular overwrite is atomic-enough at any scale (one
directory per micro-batch, bounded by trigger admission), needs no table
format, and keeps the output a plain parquet table that downstream batch
queries read with partition pruning on ``_batch_id``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BATCH_COL = "_batch_id"


def idempotent_parquet_sink(path: str) -> Callable[[DataFrame, int], None]:
    """Return a ``foreachBatch`` callback writing each micro-batch to
    ``path`` partitioned by batch id, with dynamic partition overwrite so a
    checkpoint replay of batch N rewrites partition N instead of duplicating
    it::

        q = (df.writeStream
               .foreachBatch(idempotent_parquet_sink("/data/out"))
               .option("checkpointLocation", ckpt).start())
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        # writer-level option, NOT a session-conf toggle (concurrent writers
        # toggling the session conf race; a restored "static" would truncate
        # the whole table)
        (batch_df.withColumn(BATCH_COL, F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy(BATCH_COL).parquet(path))

    return _write


def read_sink(spark, path: str) -> DataFrame:
    """Read an :func:`idempotent_parquet_sink` output without the batch-id
    bookkeeping column."""
    return spark.read.parquet(path).drop(BATCH_COL)


def incremental_dedup_sink(path: str, id_col: str = "doc_id",
                           text_col: str = "text",
                           hash_col: str = "text_hash",
                           ) -> Callable[[DataFrame], None]:
    """``foreachBatch`` callback implementing STREAMING first-seen dedup
    against a growing on-disk hash index — the continuous form of
    ``functions.dedup.dedup_incremental``: each micro-batch is reduced to
    content the pipeline has never emitted (across ALL previous batches and
    restarts — the index, not executor state, is the memory), survivors are
    appended to ``path``/docs and their hashes to ``path``/index.

    Unlike ``dropDuplicatesWithinWatermark`` this has no state horizon: the
    index is a plain parquet hash table (16 bytes/doc) read via an anti
    join, so the dedup window is the pipeline's whole lifetime. The
    append-twice sequence is idempotent-enough under batch replay IF the
    caller pairs it with a batch-id guard (see ``idempotent_parquet_sink``)
    or accepts at-least-once hashes (a duplicate hash row only strengthens
    the filter)."""
    from akka_stream_contrib_spark.functions import dedup_incremental

    def _write(batch_df: DataFrame, batch_id: int = 0) -> None:
        spark = batch_df.sparkSession
        try:
            seen = spark.read.parquet(f"{path}/index")
        except Exception:
            seen = spark.createDataFrame([], f"{hash_col} string")
        fresh = dedup_incremental(batch_df, seen, id_col=id_col,
                                  text_col=text_col, hash_col=hash_col)
        fresh = fresh.localCheckpoint(eager=True)  # read index BEFORE writing it
        fresh.drop(hash_col).write.mode("append").parquet(f"{path}/docs")
        fresh.select(hash_col).write.mode("append").parquet(f"{path}/index")

    return _write
