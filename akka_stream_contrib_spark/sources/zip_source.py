"""Zip-archive exploder.

Re-expresses ``ZipInputStreamSource`` (reference
ZipInputStreamSource.scala:49-220): stream ``(ZipEntryData(name, creationTime),
ByteString)`` chunks out of possibly-nested zip archives — directories
skipped, ``.zip`` entries recursed (ZipInputStreamSource.scala:169-184),
chunks of ``chunk_size`` bytes (default 8192, ZipInputStreamSource.scala:27),
total-bytes materialized value (ZipInputStreamSource.scala:92-94).

Spark form: ``spark.read.format("binaryFile")`` scans the archives in
parallel (one task per file); a mapInPandas stage explodes each archive into
chunk rows *inside the executors* — the decompression never touches the
driver and scales with the number of archives.
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_CHUNK_SIZE = 8192  # reference ZipInputStreamSource.scala:27

ZIP_SCHEMA = (
    "archive string, entry_name string, entry_mtime bigint, "
    "chunk_no int, content binary"
)


def _explode_zip_bytes(archive_name: str, data: bytes, chunk_size: int,
                       allowed_ext: tuple[str, ...], prefix: str = ""):
    """Yield (archive, entry_name, mtime, chunk_no, chunk) rows, recursing
    into nested archives like the reference's next() (ZipInputStreamSource.scala:169-184)."""
    try:
        zf_open = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile:
        # a zero-byte or non-zip payload behind a .zip name yields NO
        # entries, like the reference's ZipInputStream whose getNextEntry
        # returns null on invalid data (ZipInputStreamSource.scala:169-184)
        # — a raise here would fail the whole job for every archive
        return
    with zf_open as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue  # reference skips directories
            name = prefix + info.filename
            payload = zf.read(info)
            if any(info.filename.endswith(ext) for ext in allowed_ext):
                yield from _explode_zip_bytes(
                    archive_name, payload, chunk_size, allowed_ext,
                    prefix=name + "/")
                continue
            # interpret the zip's DOS timestamp as UTC: naive .timestamp()
            # would apply the executor's local zone, making entry_mtime
            # machine-dependent (breaks engine-deterministic reproducibility)
            _dt = __import__("datetime")
            mtime = int(_dt.datetime(*info.date_time,
                                     tzinfo=_dt.timezone.utc).timestamp())
            if not payload:
                yield (archive_name, name, mtime, 0, b"")
                continue
            for i in range(0, len(payload), chunk_size):
                yield (archive_name, name, mtime, i // chunk_size,
                       payload[i:i + chunk_size])


def zip_entries(spark: SparkSession, path: str,
                chunk_size: int = DEFAULT_CHUNK_SIZE,
                allowed_zip_extensions: tuple[str, ...] = (".zip",)) -> DataFrame:
    """Explode every archive under ``path`` into chunk rows."""
    binary = spark.read.format("binaryFile").load(path)

    def _explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for apath, content in zip(pdf["path"], pdf["content"]):
                rows.extend(_explode_zip_bytes(
                    apath, bytes(content), chunk_size, allowed_zip_extensions))
            yield pd.DataFrame(
                rows, columns=["archive", "entry_name", "entry_mtime",
                               "chunk_no", "content"])

    return binary.select("path", "content").mapInPandas(_explode, schema=ZIP_SCHEMA)


def zip_entries_udtf(spark: SparkSession, path: str,
                     chunk_size: int = DEFAULT_CHUNK_SIZE) -> DataFrame:
    """Python-UDTF variant of the exploder (the table-function extension
    surface of SURVEY.md §2.7): LATERAL-joinable, one UDTF eval per archive.
    Same output as ``zip_entries``; kept alongside the mapInPandas form to
    exercise both extension APIs."""
    from pyspark.sql.functions import col, udtf

    @udtf(returnType=ZIP_SCHEMA)
    class ZipExplode:
        def eval(self, apath: str, content: bytes):  # noqa: D401
            yield from _explode_zip_bytes(apath, bytes(content), chunk_size, (".zip",))

    spark.udtf.register("zip_explode", ZipExplode)
    binary = spark.read.format("binaryFile").load(path)
    binary.createOrReplaceTempView("_zip_binary")
    return spark.sql(
        "SELECT z.* FROM _zip_binary, LATERAL zip_explode(path, content) z")


def total_bytes(entries: DataFrame) -> int:
    """The reference's materialized value Future[Long] = total bytes read
    (ZipInputStreamSource.scala:92-94) as a tiny aggregate."""
    return entries.agg(F.sum(F.octet_length("content"))).collect()[0][0] or 0
