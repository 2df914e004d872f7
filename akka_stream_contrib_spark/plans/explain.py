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

    MAIN-plan exchanges count by node id (two independent shuffles always
    count twice, even when their printed arguments collide — e.g. two
    SinglePartition aggregates). Exchanges nested under an InMemoryRelation
    print once per consumer — and under AQE once more as the cache's
    initial-plan copy — while they execute AT MOST once (the cache build);
    those dedupe by partitioning ARGUMENTS (plan_id stripped), which
    collapses the reprints of one build plan without hiding main-plan
    shuffles. A ReusedExchange re-reads shuffle files instead of
    re-shuffling and is excluded by name."""
    import re
    plan = formatted_plan(df)
    # tree walk over EVERY section (main plan AND "===== Subqueries ====="
    # trees — a shuffle inside a subquery is a real shuffle): a node line
    # renders as "...+- NodeName (N)"; children are indented deeper, so
    # everything deeper than an InMemoryRelation line (until indentation
    # returns) is that cache's build-plan rendering. A section boundary
    # resets the indent stack.
    owner, main_ids, stack = {}, set(), []
    for line in plan.splitlines():
        if line.startswith("=====") or line.lstrip().startswith("Subquery"):
            stack = []
            continue
        m = re.search(r"([A-Za-z][A-Za-z]*) \((\d+)\)\s*$", line)
        if not m:
            continue
        name, node_id = m.group(1), m.group(2)
        indent = re.search(r"[A-Za-z*]", line).start()
        while stack and indent <= stack[-1][0]:
            stack.pop()
        if name == "Exchange":
            if stack:
                owner[node_id] = stack[0][1]  # outermost owning relation
            else:
                main_ids.add(node_id)
        if name == "InMemoryRelation":
            stack.append((indent, node_id))
    # details: node id -> Arguments. Cached build exchanges dedupe by
    # (owning relation's arguments, exchange arguments): the relation's
    # detail carries its OUTPUT expr ids, identical across reprints of one
    # cache and distinct between different caches — so two caches whose
    # build shuffles print the same partitioning (e.g. SinglePartition)
    # still count separately, while AQE/consumer reprints collapse.
    args = {}
    for block in re.split(r"\n(?=\(\d+\) )", plan):
        m = re.match(r"\((\d+)\) [A-Za-z]", block)
        a = re.search(r"Arguments: ([^\n]*)", block) if m else None
        if m and a:
            args[m.group(1)] = re.sub(r"\[plan_id=\d+\]", "", a.group(1))
    cached = {(args.get(rel, rel), args.get(ex, ex))
              for ex, rel in owner.items()}
    return len(main_ids) + len(cached)


def assert_partition_pruned(df: DataFrame, column: str) -> None:
    """Assert the scan node carries a PartitionFilters entry on ``column`` —
    i.e. a filter on a directory-partition column prunes partitions at
    planning time instead of reading every file and filtering rows."""
    plan = formatted_plan(df)
    part = [l for l in plan.splitlines() if "PartitionFilters" in l]
    if not any(column in l for l in part):
        raise AssertionError(
            f"no partition pruning on {column!r}; PartitionFilters lines: {part}")
