"""Small-file compaction: rewrite a parquet directory into right-sized files.

The operational reality behind every streaming sink and partitioned write at
scale: micro-batches and fine partitions produce thousands of KB-sized files,
and at 100 TB the NameNode/object-store listing and per-file open costs
dominate reads. Compaction rewrites a directory to ~``target_file_bytes``
files (Spark's default 128 MB parquet target) in one distributed pass.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def parquet_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of a parquet directory tree."""
    files = [f for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                                  recursive=True)
             if os.path.isfile(f)]
    return len(files), sum(os.path.getsize(f) for f in files)


def compact_parquet(spark: SparkSession, path: str, out_path: str,
                    target_file_bytes: int = 128 * 1024 * 1024,
                    partition_cols: list[str] | None = None) -> DataFrame:
    """Rewrite ``path`` into ``out_path`` with ~``target_file_bytes`` files.

    File count is sized from the actual input bytes (coalesce — a repartition
    would add a shuffle; compaction only needs to merge splits). With
    ``partition_cols`` the directory layout is preserved and
    ``maxRecordsPerFile`` bounds each partition's files instead — rows of one
    Hive partition must stay in its directory, so a global coalesce cannot
    apply.

    Returns the compacted DataFrame (lazily re-readable from ``out_path``).
    """
    if "://" in path or "://" in out_path:
        raise ValueError("compact_parquet sizes files via the local "
                         "filesystem; object-store paths are not supported")
    if os.path.abspath(out_path) == os.path.abspath(path):
        raise ValueError("out_path must differ from path (no in-place rewrite)")
    n_files, total = parquet_file_stats(path)
    if n_files == 0:
        raise ValueError(f"no parquet files under {path!r}")
    df = spark.read.parquet(path)
    if partition_cols:
        rows = df.count()
        bytes_per_row = max(total / max(rows, 1), 1e-9)
        (df.write.mode("overwrite")
         .option("maxRecordsPerFile",
                 max(1, int(target_file_bytes / bytes_per_row)))
         .partitionBy(*partition_cols).parquet(out_path))
    else:
        want = max(1, -(-total // target_file_bytes))
        df.coalesce(want).write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
