"""Single-file byte tail as a streaming data source.

Re-expresses ``FileTailSource`` (reference
src/main/java/akka/stream/contrib/FileTailSource.java:35-170): read from
``startingPosition``, emit chunks of at most ``maxChunkSize`` bytes, then keep
polling for appended data. The reference's async-read + timer loop
(FileTailSource.java:103,119-121) becomes offset bookkeeping: the stream
offset IS the byte position, the poll interval is the query trigger.

Usage::

    spark.dataSource.register(FileTailDataSource)
    df = (spark.readStream.format("file_tail")
          .option("path", "/var/log/app.log")
          .option("maxChunkSize", 8192)
          .load())  # schema: position bigint, chunk binary
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

SCHEMA = StructType([
    StructField("position", LongType()),
    StructField("chunk", BinaryType()),
])


class _FileTailReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("file_tail requires option 'path'")
        self.max_chunk = int(options.get("maxChunkSize", 8192))
        self.start_pos = int(options.get("startingPosition", 0))

    def initialOffset(self):
        return {"position": self.start_pos}

    def read(self, start: dict):
        pos = start["position"]
        try:
            size = os.path.getsize(self.path)
        except OSError:
            return iter([]), start
        if size < pos:
            if pos == self.start_pos:
                # nothing has been READ yet: a size below the CONFIGURED
                # start is "the file has not grown to the offset", not a
                # shrink — the reference polls until data reaches it
                # (tailing from a known future offset / a recreated file
                # that will refill). Only an offset we actually consumed
                # past can witness truncation.
                return iter([]), start
            # the file SHRANK below consumed data: truncation/rotation —
            # fail loudly like the replay path does, instead of stalling
            # forever and then resuming mid-content at an offset from the
            # OLD file's coordinate space (silent corruption)
            raise IOError(
                f"file_tail: {self.path} shrank below the tracked offset "
                f"({size} < {pos}) — truncated or rotated; restart the "
                "stream from a fresh checkpoint (or offset 0)")
        if size == pos:
            # nothing appended; reference just re-arms its poll timer
            return iter([]), start
        rows = []
        with open(self.path, "rb") as f:
            f.seek(pos)
            while pos < size:
                chunk = f.read(min(self.max_chunk, size - pos))
                if not chunk:
                    break
                rows.append((pos, chunk))
                pos += len(chunk)
        return iter(rows), {"position": pos}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for recovery (exactly-once): re-read the range
        rows = []
        pos = start["position"]
        stop = end["position"]
        with open(self.path, "rb") as f:
            f.seek(pos)
            while pos < stop:
                chunk = f.read(min(self.max_chunk, stop - pos))
                if not chunk:
                    # the committed range no longer exists (file rotated or
                    # truncated between commit and recovery) — replaying a
                    # shorter prefix would silently deliver DIFFERENT data
                    # than the original batch; fail the recovery loudly
                    raise IOError(
                        f"file_tail replay: {self.path} ended at byte {pos} "
                        f"but the checkpoint committed through {stop}; the "
                        "file was truncated or rotated — exactly-once replay "
                        "is impossible")
                rows.append((pos, chunk))
                pos += len(chunk)
        return iter(rows)


class FileTailDataSource(DataSource):
    @classmethod
    def name(cls):
        return "file_tail"

    def schema(self):
        return SCHEMA

    def simpleStreamReader(self, schema):
        return _FileTailReader(self.options)
