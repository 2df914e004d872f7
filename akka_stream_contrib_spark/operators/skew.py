"""Skew-mitigation utilities.

AQE's skew-join splitting (on in session.py) handles join-side skew at
runtime; these helpers cover the aggregation-side hot-key case: a handful of
keys holding a large share of rows serializes their groups through single
reducers. ``salted_aggregate`` runs the classic two-phase form — a salted
partial aggregation fans each hot key over ``salt`` reducers, then a final
merge by the true key. Results are exactly equal for algebraic aggregates.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial aggregate, merge aggregate) pairs per supported algebraic function
_MERGES = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: out_col -> (fn, in_col) with fn in {sum, count, min, max}.
    Phase 1 groups by (keys..., salt) where salt spreads rows of the same key
    across ``salt`` reducers; phase 2 merges partials by the true key. avg is
    intentionally absent — express it as sum/count and divide.
    """
    unsupported = {fn for fn, _ in aggs.values()} - set(_MERGES)
    if unsupported:
        raise ValueError(f"unsupported aggregate(s) {unsupported}; use {_MERGES.keys()}")
    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    phase1 = salted.groupBy(*keys, "_salt").agg(*[
        _MERGES[fn][0](F.col(col)).alias(out)
        for out, (fn, col) in aggs.items()
    ])
    return phase1.groupBy(*keys).agg(*[
        _MERGES[fn][1](F.col(out)).alias(out)
        for out, (fn, _) in aggs.items()
    ])
