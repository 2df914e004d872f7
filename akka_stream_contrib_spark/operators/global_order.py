"""Distributed global-order primitives: rank, running sum, and lag over a
TOTAL order without ever sorting into a single partition.

The reference's operators are single-stream by construction (one GraphStage,
one actor — e.g. ``Accumulate.scala:60-69``, ``TokenThrottle.scala:42-143``),
so "global order" is free there. On Spark a naive
``Window.partitionBy().orderBy(seq)`` moves ALL rows to one partition — the
classic scale-killer. Every primitive here uses the two-phase range form
instead:

1. ``repartitionByRange(order)`` — parallel range shuffle, ranges are
   disjoint and ordered by construction;
2. ONE tiny per-partition summary (count / sum / last value) collected to the
   driver — K rows for K partitions, independent of data size;
3. the global result = local window inside each range + the broadcast
   exclusive prefix of the summaries.

Every per-row value is independent of WHERE the range boundaries land, so the
result is deterministic even though ``repartitionByRange`` samples boundaries.
Running doubles are summed per-range then offset — exact for integer/decimal
costs; for raw doubles the grouping differs from strict sequential order (use
decimal inputs where cross-engine bit-equality matters, per the repo's money
conventions).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from akka_stream_contrib_spark.util import normalize_cols


def _ranged(df: DataFrame, order_cols: Sequence[str]) -> DataFrame:
    """Range-partition on the order columns, tag the partition id, and pin
    the placement (pipeline-scoped persist) so the summary pass and the
    main pass see the SAME partitioning.

    persist, not ``localCheckpoint(eager=True)``: the caller's summary
    ``collect()`` doubles as the cache materialization, so the separate
    checkpoint job (which under AQE runs every intermediate stage eagerly
    at BUILD time, plus a full row copy into the checkpoint store) and its
    write barrier disappear — measured 6.6 s → 1.3 s build / 25 → 11 jobs
    on perplexity_buckets at sf0.1, same discipline as the r10 graph-loop
    migration. The placement pin survives cache loss: the range boundaries
    come from seeded reservoir sampling (XORShiftRandom(byteswap32(idx)))
    over a deterministic input, so a recomputed partition lands on the
    same ``_pid``; every caller additionally orders by a TOTAL order, so
    the per-row result is reproducible either way."""
    from akka_stream_contrib_spark.util import pipeline_cache
    ranged = (df.repartitionByRange(*[F.col(c) for c in order_cols])
              .withColumn("_pid", F.spark_partition_id()))
    return pipeline_cache(ranged)


def _offset_expr(per_pid: dict[int, object], zero) -> Column:
    """Broadcast map pid -> exclusive prefix of per-partition summaries."""
    offsets, acc = {}, zero
    for pid in sorted(per_pid):
        offsets[pid] = acc
        acc += per_pid[pid]
    if not offsets:
        # argless map() types as map<void,void> and can't be indexed
        return F.lit(zero)
    m = F.create_map(*[F.lit(x) for pid in offsets for x in (pid, offsets[pid])])
    return m[F.col("_pid")]


def global_rank(df: DataFrame, order_cols: str | Sequence[str],
                out: str = "rnk") -> DataFrame:
    """1-based global position of each row under ``order_cols`` order."""
    return global_rank_total(df, order_cols, out)[0]


def global_rank_total(df: DataFrame, order_cols: str | Sequence[str],
                      out: str = "rnk") -> tuple[DataFrame, int]:
    """:func:`global_rank` plus the EXACT total row count, read from the
    same K-row per-range summary the rank offsets already collect — a
    caller that needs N (equal-count bucket cuts, stage boundaries) bakes
    it in as a literal instead of running a second count aggregate over
    the ranked frame and broadcast-crossJoining its 1-row result (one
    aggregate job + one BroadcastExchange less per consumer; same number
    by construction: both are the row count of the ranged frame)."""
    order_cols = normalize_cols(order_cols)
    ranged = _ranged(df, order_cols)
    counts = {r._pid: r.cnt for r in
              ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    ranked = (ranged.withColumn(out, F.row_number().over(w) + _offset_expr(counts, 0))
              .drop("_pid"))
    return ranked, sum(counts.values())


#: prefix-combinable running folds: (window agg, per-partition summary agg,
#: python combine for the driver-side prefix, combine Column expr, identity)
_MONOIDS = {
    "sum": (F.sum, F.sum, lambda a, b: a + b,
            lambda loc, off: loc + off, 0),
    "count": (lambda c: F.count(F.lit(1)), lambda c: F.count(F.lit(1)),
              lambda a, b: a + b, lambda loc, off: loc + off, 0),
    "min": (F.min, F.min, min, F.least, None),
    "max": (F.max, F.max, max, F.greatest, None),
}


def global_running_agg(df: DataFrame, order_cols: str | Sequence[str],
                       value_col: str | Sequence[str],
                       out: str | Sequence[str],
                       fn: str = "sum") -> DataFrame:
    """Inclusive global running fold of one or several value columns under
    the total order, for any prefix-combinable monoid
    (``sum``/``count``/``min``/``max``): local running fold inside each
    range, combined with the exclusive prefix of the per-range summaries.

    Passing sequences for ``value_col``/``out`` folds every column in ONE
    shared range shuffle + checkpoint + driver summary round-trip (chaining
    the single-column form would re-range and re-checkpoint the same frame
    per column — measured as one extra plan exchange per column in
    `ks_statistic` before the shared pass existed)."""
    return global_running_agg_total(df, order_cols, value_col, out, fn)[0]


def global_running_agg_total(df: DataFrame, order_cols: str | Sequence[str],
                             value_col: str | Sequence[str],
                             out: str | Sequence[str],
                             fn: str = "sum",
                             ) -> tuple[DataFrame, list]:
    """:func:`global_running_agg` plus each column's COMPLETE fold (the
    final carry of the per-range summaries — e.g. the corpus total for
    ``sum``), read from the same K-row driver summary the prefix offsets
    already collect. A caller that needs the total (budget thresholds,
    normalizing denominators) bakes it in as a literal instead of running
    a second aggregate over the running-fold output and
    broadcast-crossJoining its 1-row result. ``None`` when every range's
    summary is NULL/empty (matches what that aggregate would return)."""
    try:
        local_agg, summary_agg, py_comb, col_comb, _ident = _MONOIDS[fn]
    except KeyError:
        raise ValueError(f"fn must be one of {sorted(_MONOIDS)}, got {fn!r}")
    value_cols = ([value_col] if isinstance(value_col, str)
                  else list(value_col))
    outs = [out] if isinstance(out, str) else list(out)
    if len(value_cols) != len(outs):
        raise ValueError("global_running_agg: value_col and out must pair up")
    order_cols = normalize_cols(order_cols)
    ranged = _ranged(df, order_cols)
    # ONE summary aggregation collects every column's per-range folds
    rows = (ranged.groupBy("_pid")
            .agg(*[summary_agg(c).alias(f"_s{i}")
                   for i, c in enumerate(value_cols)])
            .collect())
    w = (Window.partitionBy("_pid").orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out_cols = []
    totals = []
    for i, (c, o) in enumerate(zip(value_cols, outs)):
        summaries = {r["_pid"]: r[f"_s{i}"] for r in rows}
        # exclusive prefix-combine of the summaries (skipping empty/None
        # ranges). carry starts as None — NOT the monoid identity — so
        # ranges before the first non-NULL value get NO offset and an
        # all-NULL local prefix stays NULL (window semantics); seeding
        # sum's identity 0 here would turn a leading all-NULL run into 0.
        prefix, carry = {}, None
        for pid in sorted(summaries):
            prefix[pid] = carry
            s = summaries[pid]
            if s is not None:
                carry = s if carry is None else py_comb(carry, s)
        totals.append(carry)  # the complete fold over every range
        local = local_agg(c).over(w)
        pairs = [x for pid in prefix if prefix[pid] is not None
                 for x in (pid, prefix[pid])]
        if pairs:
            off = F.create_map(*[F.lit(x) for x in pairs])[F.col("_pid")]
            # window aggregates skip NULLs, so a row whose in-range prefix
            # is all-NULL must inherit the carried offset (NULL+off would
            # be NULL); with no offset the all-NULL local result (NULL) is
            # already right
            combined = (F.when(off.isNull(), local)
                        .when(local.isNull(), off)
                        .otherwise(col_comb(local, off)))
        else:
            combined = local
        out_cols.append(combined.alias(o))
    # REPLACE semantics for an `out` that names an existing column (the
    # single-column withColumn behavior this function consolidated): a
    # plain select("*", ...) would append a duplicate-named column and
    # every downstream reference would raise AMBIGUOUS_REFERENCE
    keep = [c for c in ranged.columns
            if c != "_pid" and c not in set(outs)]
    return ranged.select(*keep, *out_cols), totals


def global_running_sum(df: DataFrame, order_cols: str | Sequence[str],
                       value_col: str, out: str) -> DataFrame:
    """Inclusive global prefix sum of ``value_col`` under the total order."""
    return global_running_agg(df, order_cols, value_col, out, fn="sum")


def global_running_sums(df: DataFrame, order_cols: str | Sequence[str],
                        value_cols: Sequence[str], outs: Sequence[str],
                        ) -> DataFrame:
    """Inclusive global prefix sums of SEVERAL columns sharing one range
    pass — the multi-column form of `global_running_agg(fn="sum")`."""
    return global_running_agg(df, order_cols, value_cols, outs, fn="sum")


def global_lag(df: DataFrame, order_cols: str | Sequence[str],
               value: Column, out: str) -> DataFrame:
    """``lag(value, 1)`` under the total order: local lag inside each range;
    each range's FIRST row takes the LAST value of the previous non-empty
    range from the broadcast per-partition summary (NULL for the global
    first row, matching ``F.lag``).

    Assumes ``value`` itself is non-null (the boundary substitution cannot
    distinguish "first row of range" from "previous value was NULL").
    """
    order_cols = normalize_cols(order_cols)
    ranged = _ranged(df, order_cols).withColumn("_v", value)
    last_rows = (ranged.groupBy("_pid")
                 .agg(*[F.max_by("_v", F.struct(*order_cols)).alias("last_v")])
                 .collect())
    lasts = {r._pid: r.last_v for r in last_rows}
    prev_last, carry = {}, None
    for pid in sorted(lasts):
        prev_last[pid] = carry
        carry = lasts[pid] if lasts[pid] is not None else carry
    pairs = [x for pid in prev_last if prev_last[pid] is not None
             for x in (pid, prev_last[pid])]
    boundary = (F.create_map(*[F.lit(x) for x in pairs])[F.col("_pid")]
                if pairs else F.lit(None))
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (ranged
            .withColumn(out, F.coalesce(F.lag("_v").over(w), boundary))
            .drop("_pid", "_v"))
