"""Routing / pass-through operators.

- ``partition_with`` re-expresses ``PartitionWith`` (PartitionWith.scala:28-104):
  route each element to side 0 or side 1 with per-side payloads (the reference's
  ``Either[Out0, Out1]``). In the DataFrame model a sum type becomes a tag
  column plus nullable payload columns; the two "outlets" are two filters over
  one tagged frame, which Spark evaluates in a single pass per branch with the
  predicate pushed down.

- ``pass_through`` re-expresses ``PassThroughFlow`` (PassThroughFlow.scala:91-110):
  run an inner transform but keep the original element. The reference needs a
  Broadcast+Zip graph and a strict 1:1 ordering caveat (PassThroughFlow.scala:19-28);
  in the columnar model computed columns never destroy their inputs, so this is
  just ``withColumn`` — the caveat disappears by construction.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partition_with(
    predicate: Column,
    left: dict[str, Column] | None = None,
    right: dict[str, Column] | None = None,
    tag_col: str = "side",
) -> Callable[[DataFrame], DataFrame]:
    """Tag each row with ``side`` = 0 (predicate true → Left) or 1 (Right) and
    attach nullable per-side payload columns.

    Returns the *tagged* frame; callers materialize the two outlets as
    ``out.filter("side = 0")`` / ``out.filter("side = 1")`` — both branches
    share one scan (Spark caches/exchanges reuse), mirroring the reference's
    single upstream.
    """
    left = left or {}
    right = right or {}

    def _apply(df: DataFrame) -> DataFrame:
        out = df.withColumn(tag_col, F.when(predicate, F.lit(0)).otherwise(F.lit(1)))
        # one withColumn per OUTPUT name: a name used by both sides becomes a
        # single two-branch CASE (two separate withColumns would let the
        # right side silently null the left payload)
        for name in dict.fromkeys([*left, *right]):
            lcol, rcol = left.get(name), right.get(name)
            if lcol is not None and rcol is not None:
                expr = (F.when(F.col(tag_col) == 0, lcol)
                        .when(F.col(tag_col) == 1, rcol))
            elif lcol is not None:
                expr = F.when(F.col(tag_col) == 0, lcol)
            else:
                expr = F.when(F.col(tag_col) == 1, rcol)
            out = out.withColumn(name, expr)
        return out

    return _apply


def outlets(tagged: DataFrame, tag_col: str = "side") -> tuple[DataFrame, DataFrame]:
    """Split a ``partition_with`` result into its two outlet DataFrames."""
    return tagged.filter(F.col(tag_col) == 0), tagged.filter(F.col(tag_col) == 1)


def pass_through(out_cols: dict[str, Column]) -> Callable[[DataFrame], DataFrame]:
    """Attach inner-flow outputs while retaining every input column —
    ``PassThroughFlow(flow, Keep.both)`` for free."""

    def _apply(df: DataFrame) -> DataFrame:
        return df.withColumns(out_cols)

    return _apply
