"""Physical-plan introspection helpers.

The 100 TB discipline is enforceable: these helpers let tests assert that a
query's plan has the shape that survives scale — filters pushed into the
parquet scan, small dimensions broadcast (no shuffle of the fact table),
bounded exchange counts — rather than hoping the optimizer did the right
thing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert some PushedFilters entry mentions ``fragment`` (a column name or
    literal) — i.e. the predicate reaches the parquet reader."""
    plan = formatted_plan(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    if not any(fragment in l for l in pushed):
        raise AssertionError(
            f"filter on {fragment!r} not pushed to scan; PushedFilters lines: {pushed}")


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin")
    if n < min_count:
        raise AssertionError(
            f"expected ≥{min_count} BroadcastHashJoin, found {n}")


def count_exchanges(df: DataFrame) -> int:
    """Number of DISTINCT shuffle exchanges (excludes broadcast exchanges
    and ReusedExchange references) — the scale-limiting resource of a plan.

    Distinct by the exchange's ARGUMENTS (partitioning expression incl.
    expression ids, plan_id stripped), not by formatted-plan node id: a
    cached (InMemoryRelation) subtree prints its build plan once per
    consumer — and under AQE once more as the cache's initial plan — while
    its exchanges execute at most once; node-id dedup double-counted those
    reprints (same partitioning, same expr ids, different print ids). Two
    genuinely distinct shuffles always differ in arguments (fresh expr ids
    per operator output), and a ReusedExchange re-reads shuffle files
    instead of re-shuffling."""
    import re
    plan = formatted_plan(df)
    ids = set()
    # details section: one "(N) NodeName" header per node, its metadata
    # lines (Input/Arguments/...) following until the next header
    for block in re.split(r"\n(?=\(\d+\) )", plan):
        m = re.match(r"\((\d+)\) Exchange\b", block)
        if not m:
            continue
        a = re.search(r"Arguments: ([^\n]*)", block)
        args = (re.sub(r"\[plan_id=\d+\]", "", a.group(1)) if a
                else m.group(1))
        ids.add(args)
    return len(ids)


def assert_partition_pruned(df: DataFrame, column: str) -> None:
    """Assert the scan node carries a PartitionFilters entry on ``column`` —
    i.e. a filter on a directory-partition column prunes partitions at
    planning time instead of reading every file and filtering rows."""
    plan = formatted_plan(df)
    part = [l for l in plan.splitlines() if "PartitionFilters" in l]
    if not any(column in l for l in part):
        raise AssertionError(
            f"no partition pruning on {column!r}; PartitionFilters lines: {part}")
