"""Cost-based throttling.

``token_throttle`` re-expresses ``TokenThrottle`` (TokenThrottle.scala:42-143):
an element passes only when its cost can be covered by tokens drawn from a
token stream; the stream completes when tokens are exhausted and the next
element is unaffordable.

Batch form: with a bounded token stream the accounting collapses to a prefix
condition — element i (in ``seq`` order) is emitted iff
``cumsum(cost)[..i] <= total_tokens``. That is one cumulative window sum plus a
filter; the "tokens consumed == Σ emitted costs" exactness pinned by
``TokenThrottleSpec.scala:56-68`` holds by construction.

Streaming form (unbounded token stream, lazy pulls): see
``streaming.stateful.token_throttle_stream`` — token-balance state per key via
applyInPandasWithState.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from akka_stream_contrib_spark.util import normalize_cols


def token_throttle(
    cost: Column,
    total_tokens: int | None = None,
    tokens_df: DataFrame | None = None,
    token_amount: str = "amount",
    seq: str = "seq",
    partition_by: Sequence[str] | None = None,
    cum_col: str = "cum_cost",
    overwrite_cost: bool = False,
) -> Callable[[DataFrame], DataFrame]:
    """Emit rows whose cumulative cost (in ``seq`` order, per ``partition_by``)
    stays within the token budget.

    The budget is ``total_tokens`` or ``sum(tokens_df[token_amount])`` —
    computed as a 1-row aggregate and folded into the filter as a scalar
    (broadcast to every task, no join). Negative costs raise at plan time in
    the reference (TokenThrottle.scala:117-121); here the filter
    ``cost >= 0`` guard raises lazily via an ANSI assert column.
    """
    if (total_tokens is None) == (tokens_df is None):
        raise ValueError("pass exactly one of total_tokens / tokens_df")

    def _apply(df: DataFrame) -> DataFrame:
        budget = (
            total_tokens
            if total_tokens is not None
            else (tokens_df.agg(F.sum(token_amount)).collect()[0][0] or 0)
        )
        out = df.withColumn("_cost", cost)
        out = out.withColumn(
            "_cost",
            F.when(F.col("_cost") < 0, F.raise_error(F.lit("negative cost"))).otherwise(F.col("_cost")),
        )
        if partition_by:
            w = (Window.partitionBy(*normalize_cols(partition_by)).orderBy(seq)
                 .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            out = out.withColumn(cum_col, F.sum("_cost").over(w))
        else:
            # unkeyed = TRUE global order: two-phase range prefix sum — never
            # a single-partition Window.orderBy (the 100 TB scale shape)
            from akka_stream_contrib_spark.operators.global_order import (
                global_running_sum,
            )
            out = global_running_sum(out, seq, "_cost", cum_col)
        out = out.filter(F.col(cum_col) <= F.lit(budget))
        if "cost" in df.columns:
            # the computed per-element cost REPLACES an input column of the
            # same name; silently overwriting a business column named
            # "cost" would destroy user data. Column expressions carry no
            # stable identity to compare against (repr is not an API), so
            # the caller must state the intent explicitly.
            if not overwrite_cost:
                raise ValueError(
                    "token_throttle: input already has a 'cost' column. "
                    "Pass overwrite_cost=True if the cost expression is "
                    "that column (or intentionally replaces it); otherwise "
                    "rename the input column to avoid silently "
                    "overwriting it")
            out = out.drop("cost")
        return out.withColumnRenamed("_cost", "cost")

    return _apply
