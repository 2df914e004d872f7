"""Custom sources re-expressing the reference's source stages on the PySpark
Python Data Source API (pyspark.sql.datasource) and DataFrame utilities.

| reference                         | here                                   |
|-----------------------------------|----------------------------------------|
| FileTailSource.java               | file_tail.FileTailDataSource           |
| DirectoryChanges.java             | directory_changes.DirectoryChangesDataSource |
| PagedSource.scala                 | paged.paged_source / PagedDataSource   |
| ZipInputStreamSource.scala        | zip_source.zip_entries                 |
| SourceRepeatEval.scala            | repeat_eval.repeat_eval_stream         |

Register the streaming sources once per session with ``register_sources``.
"""

from pyspark.sql import SparkSession

from akka_stream_contrib_spark.sources.file_tail import FileTailDataSource
from akka_stream_contrib_spark.sources.directory_changes import DirectoryChangesDataSource
from akka_stream_contrib_spark.sources.paged import PagedDataSource, paged_source
from akka_stream_contrib_spark.sources.zip_source import zip_entries
from akka_stream_contrib_spark.sources.repeat_eval import repeat_eval_stream


def register_sources(spark: SparkSession) -> None:
    spark.dataSource.register(FileTailDataSource)
    spark.dataSource.register(DirectoryChangesDataSource)
    spark.dataSource.register(PagedDataSource)


from akka_stream_contrib_spark.sources.ingest import (  # noqa: E402
    read_jsonl_docs,
    ingest_report,
)

__all__ = [
    "FileTailDataSource", "DirectoryChangesDataSource", "PagedDataSource",
    "paged_source", "zip_entries", "repeat_eval_stream", "register_sources",
    "read_jsonl_docs", "ingest_report",
]
