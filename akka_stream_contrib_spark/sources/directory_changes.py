"""Directory-change feed as a streaming data source.

Re-expresses ``DirectoryChanges`` (reference
src/main/java/akka/stream/contrib/DirectoryChanges.java:38-165): emit
``(path, change)`` where change ∈ {Creation, Modification, Deletion}. The
JDK-WatchService push model becomes snapshot-diff state per microbatch: the
stream offset carries ``{path: mtime_ns}``, and each ``read`` diffs the
current listing against it. ``maxBufferSize`` (DirectoryChanges.java:162-165
fails the stage on overflow) becomes the same failure if one batch exceeds
the bound.

Schema: ``path string, change string, mtime_ns bigint``.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType([
    StructField("path", StringType()),
    StructField("change", StringType()),
    StructField("mtime_ns", LongType()),
])

CREATION, MODIFICATION, DELETION = "Creation", "Modification", "Deletion"


def _snapshot(directory: str) -> dict[str, int]:
    snap: dict[str, int] = {}
    try:
        it = os.scandir(directory)
    except FileNotFoundError:
        # a missing DIRECTORY means an empty snapshot
        return snap
    with it as entries:  # scandir's __enter__ returns the iterator itself
        for e in entries:
            try:
                if e.is_file():
                    snap[e.path] = e.stat().st_mtime_ns
            except FileNotFoundError:
                # a file deleted between the listing and its stat() is a
                # routine race under concurrent writers: skip THIS entry
                # only. Catching it around the whole scan would commit a
                # truncated snapshot — every not-yet-scanned file would
                # emit a phantom Deletion now and a phantom Creation next
                # batch.
                continue
    return snap


def _diff(old: dict[str, int], new: dict[str, int]):
    for p, m in new.items():
        if p not in old:
            yield (p, CREATION, m)
        elif old[p] != m:
            yield (p, MODIFICATION, m)
    for p, m in old.items():
        if p not in new:
            yield (p, DELETION, m)


class _DirectoryChangesReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.directory = options.get("path")
        if not self.directory:
            raise ValueError("directory_changes requires option 'path'")
        self.max_buffer = int(options.get("maxBufferSize", 10000))
        self.emit_initial = options.get("emitInitial", "false").lower() == "true"

    def initialOffset(self):
        # start from the current state so only *changes* stream (the reference
        # watches from subscription time); emitInitial=true treats existing
        # files as creations instead
        return {"snap": {} if self.emit_initial else _snapshot(self.directory)}

    def read(self, start: dict):
        old = {p: int(m) for p, m in start["snap"].items()}
        new = _snapshot(self.directory)
        rows = list(_diff(old, new))
        if len(rows) > self.max_buffer:
            raise RuntimeError(
                f"directory_changes: {len(rows)} events exceed maxBufferSize="
                f"{self.max_buffer} (reference DirectoryChanges.java:162-165 "
                "fails the stage on overflow)")
        return iter(rows), {"snap": new}

    def readBetweenOffsets(self, start: dict, end: dict):
        old = {p: int(m) for p, m in start["snap"].items()}
        new = {p: int(m) for p, m in end["snap"].items()}
        return iter(list(_diff(old, new)))


class DirectoryChangesDataSource(DataSource):
    @classmethod
    def name(cls):
        return "directory_changes"

    def schema(self):
        return SCHEMA

    def simpleStreamReader(self, schema):
        return _DirectoryChangesReader(self.options)
