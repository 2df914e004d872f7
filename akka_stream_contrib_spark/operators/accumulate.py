"""Accumulation family.

- ``accumulate``: running fold emitting every intermediate value —
  reference ``Accumulate.scala:25-70`` ("use scan and drop(1)"). Spark form:
  cumulative window aggregate over the explicit order column.
- ``accumulate_while_unchanged``: buffer while a property is unchanged, emit
  per-run groups — reference ``AccumulateWhileUnchanged.scala:26-126``. Spark
  form: gaps-and-islands (lag + cumulative sum of change markers), with the
  reference's ``maxElements`` bound as a secondary bucket.
- ``last_element``: materialize the final element — reference
  ``LastElement.scala:39-78``. Spark form: ``max_by`` over the order column.

Scale note: the reference's streams are *globally* ordered, so the faithful
re-expression uses an unpartitioned window — fine for bounded/demo data but a
single-partition sort at 100 TB. Every operator therefore takes
``partition_by`` so real pipelines run the keyed variant (per-user, per-shard),
which distributes the window across the cluster.
"""

from __future__ import annotations

import re
import warnings
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from akka_stream_contrib_spark.util import normalize_cols


def _window(seq: str, partition_by: Sequence[str] | None) -> WindowSpec:
    w = Window.partitionBy(*normalize_cols(partition_by)) if partition_by else Window.partitionBy()
    return w.orderBy(seq).rowsBetween(Window.unboundedPreceding, Window.currentRow)


#: simple prefix-combinable monoid over a plain column — the shapes the
#: range-partitioned ``global_running_agg`` path supports (count excluded:
#: its monoid counts rows, not non-null values of the argument)
_MONOID_EXPR = re.compile(r"^(sum|min|max)\((\w+)\)$")


def _monoid_spec(agg: Column) -> tuple[str, str] | None:
    """``F.sum("value")`` → ``("sum", "value")``; None for anything the
    distributed prefix-fold can't express (casts, arithmetic, collect_list,
    non-monoid aggregates)."""
    m = re.search(r"Column<'([^']*)'>", str(agg))
    if not m:
        return None
    mm = _MONOID_EXPR.match(m.group(1))
    return (mm.group(1), mm.group(2)) if mm else None


def accumulate(
    agg: Column,
    out: str = "acc",
    seq: str = "seq",
    partition_by: Sequence[str] | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Running fold: ``out`` = aggregate of all rows up to and including the
    current row in ``seq`` order (per ``partition_by`` group if given).

    ``agg`` is any aggregate Column (``F.sum("value")``, ``F.max(...)``,
    ``F.collect_list(...)``); arbitrary non-associative folds belong in
    ``streaming.stateful`` (transformWithState) instead.

    Scale path: the UNKEYED form with a prefix-combinable aggregate
    (``sum``/``min``/``max`` of a plain column) routes through
    ``global_running_agg`` — a ``repartitionByRange`` + per-range local fold
    + broadcast exclusive prefix, so the total order never collapses into a
    single partition. Only a generic unkeyed fold (e.g. ``collect_list``, or
    an expression the prefix-fold can't combine) falls back to the
    partition-less window, with a warning.
    """

    def _apply(df: DataFrame) -> DataFrame:
        if not partition_by:
            spec = _monoid_spec(agg)
            if spec is not None:
                from akka_stream_contrib_spark.operators.global_order import (
                    global_running_agg)
                fn, value_col = spec
                vdtype = dict(df.dtypes).get(value_col)
                if fn == "sum" and vdtype in ("float", "double"):
                    warnings.warn(
                        f"unkeyed running sum of {value_col} "
                        f"({vdtype}) routes through the "
                        "range-partitioned prefix fold, which regroups the "
                        "IEEE additions — low bits may differ from a strict "
                        "sequential sum; use decimal where cross-engine "
                        "bit-equality matters", stacklevel=2)
                return global_running_agg(df, seq, value_col, out, fn=fn)
            warnings.warn(
                "unkeyed accumulate with a non-prefix-combinable aggregate "
                f"({agg}) falls back to a single-partition window — fine for "
                "bounded/demo data, a scale-killer on a real cluster; pass "
                "partition_by or use a sum/min/max of a plain column",
                stacklevel=2)
        return df.withColumn(out, agg.over(_window(seq, partition_by)))

    return _apply


def accumulate_while_unchanged(
    property_col: str,
    agg_exprs: Sequence[Column],
    seq: str = "seq",
    partition_by: Sequence[str] | None = None,
    max_elements: int | None = None,
    group_col: str = "grp",
) -> Callable[[DataFrame], DataFrame]:
    """Group consecutive rows with an unchanged ``property_col`` (in ``seq``
    order) and aggregate each run.

    Islands construction: mark rows where the property differs from the
    previous row (lag), cumulative-sum the markers to get a run id, then
    ``groupBy(run)``. ``max_elements`` splits runs longer than the reference's
    ``maxElements`` cap into sub-buckets (AccumulateWhileUnchanged.scala:79-90).
    The time-based ``maxDuration`` trigger is the streaming session-window form
    (see ``operators.windows.session_window_agg``).

    Output columns: ``partition_by`` keys, ``grp`` (run ordinal), the property,
    plus ``agg_exprs``.
    """

    def _apply(df: DataFrame) -> DataFrame:
        base = Window.partitionBy(*normalize_cols(partition_by)) if partition_by else Window.partitionBy()
        w = base.orderBy(seq)
        # null-safe run detection: a new run starts at the partition's first
        # row (row_number, NOT lag-is-null — a NULL *property* mid-stream
        # must compare, not restart) or when the property differs null-safely
        # (NULL after 'a' is a change; NULL after NULL is the same run)
        prev = F.lag(property_col).over(w)
        changed = (
            F.when(
                (F.row_number().over(w) == 1)
                | ~F.col(property_col).eqNullSafe(prev),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        runs = df.withColumn(group_col, F.sum(changed).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        group_keys = normalize_cols(partition_by) + [group_col]
        if max_elements is not None:
            wg = Window.partitionBy(*group_keys).orderBy(seq)
            runs = runs.withColumn(
                "_bucket",
                ((F.row_number().over(wg) - 1) / F.lit(max_elements)).cast("bigint"),
            )
            group_keys = group_keys + ["_bucket"]
        return (
            runs.groupBy(*group_keys)
            .agg(F.first(property_col).alias(property_col), *agg_exprs)
        )

    return _apply


def last_element(
    seq: str = "seq",
    partition_by: Sequence[str] | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """The element with the greatest ``seq`` (per partition key if given) —
    the reference's ``Future[Option[A]]`` materialized value becomes an
    ordinary (tiny) result DataFrame. ``max_by`` runs as a partial+final
    aggregate: no sort, no single-partition bottleneck."""

    def _apply(df: DataFrame) -> DataFrame:
        payload = F.struct(*[F.col(c) for c in df.columns])
        if partition_by:
            out = df.groupBy(*partition_by).agg(
                F.max_by(payload, F.col(seq)).alias("_last"))
        else:
            out = df.groupBy().agg(F.max_by(payload, F.col(seq)).alias("_last"))
        # empty input → global agg yields one null struct; the reference
        # materializes None (LastElement.scala:61-69) → drop it
        return out.filter(F.col("_last").isNotNull()).select("_last.*")

    return _apply
