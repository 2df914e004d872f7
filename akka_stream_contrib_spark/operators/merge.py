"""Ordered merge.

``merge_by_index`` re-expresses ``MergeByIndex`` (MergeByIndex.scala:41-169):
merge N branch streams into one stream ordered by a monotonic Long index,
tolerating gaps, failing on duplicate indices.

Spark form: the N branches are unioned (``UNION ALL`` — no shuffle) and order
is re-established by the index column. The reference needs a priority-queue
k-way merge (MergeByIndex.scala:80) because it must emit incrementally; on
Spark, ``SortExec``/range-partitioned sort is the same k-way merge run in
parallel per range — at scale the sort shuffles once on the index with
range partitioning, which is the plan you want.

Duplicate-index detection (MergeByIndex.scala:139-143 fails the stream) is a
window count over the index — surfaced either as a raised error (eager
``validate="raise"``) or as a boolean column.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_by_index(
    branches: Sequence[DataFrame],
    index: str = "idx",
    validate: str = "raise",
    rank_col: str | None = "rnk",
) -> DataFrame:
    """Union ``branches`` and restore total order by ``index``.

    ``validate``: "raise" runs an aggregate check and raises ``ValueError`` on
    duplicate indices (the reference fails the stream); "column" adds
    ``_dup_index`` instead; "none" skips. ``rank_col`` (optional) materializes
    the restored position via ``row_number`` so order survives as data —
    downstream DataFrame ops would otherwise discard sort order.
    """
    if not branches:
        raise ValueError("merge_by_index needs at least one branch")
    # bool is a likely caller slip for the string enum — map it rather than
    # silently skipping the duplicate check (validate=True ≠ any branch below)
    if validate is True:
        validate = "raise"
    elif validate is False or validate is None:
        validate = "none"
    if validate not in ("raise", "column", "none"):
        raise ValueError(f"merge_by_index: unknown validate={validate!r} "
                         "(expected 'raise', 'column', or 'none')")
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)

    # rank BEFORE the eager "raise" validation when both are requested:
    # global_rank pipeline-caches the range-shuffled union (its summary
    # collect materializes it), so the duplicate check below reads that
    # cache instead of re-evaluating every branch — one pass over the
    # union instead of two (r11 scan census: the query's 6 branch scans
    # of events fell to 3). Duplicate indices don't perturb the rank
    # build (row_number ties break arbitrarily inside a range; the check
    # still raises before anything is returned), and the error contract
    # is unchanged — it just surfaces after the rank pass.
    if rank_col:
        # distributed two-phase rank (operators/global_order.py) — the
        # parallel form of the reference's k-way priority-queue merge
        from akka_stream_contrib_spark.operators.global_order import global_rank
        out = global_rank(out, index, rank_col)

    if validate == "raise":
        dup = (
            out.groupBy(index).count().filter(F.col("count") > 1).limit(1).collect()
        )
        if dup:
            raise ValueError(
                f"merge_by_index: duplicate index {dup[0][index]!r} "
                "(reference MergeByIndex.scala:139-143 fails on non-monotonic input)")
    elif validate == "column":
        # window AFTER the rank so the count rides the ranked cache too;
        # restore the pre-r11 column order (…, _dup_index, rank_col) —
        # callers hash the schema
        w = Window.partitionBy(index)
        out = out.withColumn("_dup_index", F.count(F.lit(1)).over(w) > 1)
        if rank_col:
            others = [c for c in out.columns
                      if c not in ("_dup_index", rank_col)]
            out = out.select(*others, "_dup_index", rank_col)
    return out
