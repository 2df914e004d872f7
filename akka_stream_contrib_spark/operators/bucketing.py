"""Bucketed tables: pre-shuffled, co-located storage for repeated joins.

At 100 TB the dominant cost of a fact-fact equi-join is the shuffle of both
sides. Bucketing pays that shuffle ONCE at write time: rows are hash-
partitioned into a fixed number of buckets on the join key (and optionally
sorted within buckets), so every later join or aggregation on that key reads
co-located, pre-sorted buckets and Catalyst plans a zero-Exchange
SortMergeJoin. This is the Spark-native analogue of the reference's
"partitioned stream stays partitioned" discipline, and the standard prep
step for iterated training-data joins (events ⋈ features, doc ⋈ dedup
verdicts) that would otherwise re-shuffle per run.

Usage contract: both sides of the intended join must use the SAME bucket
count and the SAME key columns; `assert_no_shuffle_join` verifies the plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, keys: Sequence[str],
                   num_buckets: int = 32,
                   sort_keys: Sequence[str] | None = None) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    ``sort_keys`` defaults to ``keys`` — sorted buckets let SortMergeJoin
    skip its sort entirely (the plan shows neither Exchange nor Sort).
    """
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")
    keys = list(keys)
    if not keys:
        raise ValueError("keys must name at least one bucket column")
    sort_keys = list(sort_keys) if sort_keys is not None else keys
    if not sort_keys:
        raise ValueError(
            "sort_keys must be non-empty (omit it to sort by the bucket keys)")
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, keys[0], *keys[1:])
        .sortBy(sort_keys[0], *sort_keys[1:])
        .saveAsTable(table_name)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: Sequence[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket keys."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Raise AssertionError if the physical plan of ``df`` contains a
    shuffle Exchange. Used to verify bucket co-location actually held —
    a silent mis-bucketing (different counts/keys) degrades to a full
    shuffle without warning otherwise.

    BroadcastExchange and ReusedExchange nodes are NOT flagged: a broadcast
    join moves no bucket data, and a ReusedExchange only re-reads an exchange
    that — if it were a shuffle — is already flagged at its original site."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    if re.search(r"(?:^|[^A-Za-z])Exchange[ (]", plan):
        raise AssertionError(
            "expected a zero-shuffle co-located join but the plan contains "
            "a shuffle Exchange:\n" + plan)


def write_partitioned(df: DataFrame, path: str, partition_cols: Sequence[str],
                      mode: str = "overwrite") -> None:
    """Hive-style directory partitioning — the *pruning* complement of
    bucketing: bucketing co-locates join keys, directory partitioning lets a
    filter on the partition column skip entire directories at planning time,
    so a 100 TB table filtered to one day reads one day's files and nothing
    else (verify with :func:`~akka_stream_contrib_spark.plans.assert_partition_pruned`).

    Keep partition cardinality bounded (date / type / source — never a
    high-cardinality key like user_id): each value is a directory, and
    small-file explosion is the standard failure mode at scale."""
    cols = list(partition_cols)
    if not cols:
        raise ValueError("partition_cols must name at least one column")
    df.write.mode(mode).partitionBy(*cols).parquet(path)
