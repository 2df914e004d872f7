"""Skew-mitigation utilities.

AQE's skew-join splitting (on in session.py) handles join-side skew at
runtime; these helpers cover the cases it can't:

- ``salted_aggregate`` — aggregation-side hot keys: a salted partial
  aggregation fans each hot key over ``salt`` reducers, then a final merge
  by the true key. Results are exactly equal for algebraic aggregates.
- ``salted_join`` — join-side hot keys when the other side is too big to
  broadcast and AQE's post-shuffle splitting is defeated (e.g. a single key
  larger than an executor): the small side is replicated ``salt``× and the
  skewed side's rows spread over the replicas, so no reducer ever sees a
  whole hot key.
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


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: spread the skewed side over ``salt`` sub-keys and
    replicate the small side once per sub-key, then join on (keys..., salt).

    Replication multiplies the small side's shuffle volume by ``salt`` — the
    deliberate price for breaking a hot key across reducers. Join semantics
    (including row multiplicity) are identical to ``skewed.join(small, on,
    how)`` for inner/left joins; every skewed row carries exactly one salt
    value and every small row exists once per salt value.
    """
    if salt <= 0:
        raise ValueError(f"salt must be positive, got {salt}")
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    for side, cols in (("skewed", skewed.columns), ("small", small.columns)):
        if "_salt" in cols:
            raise ValueError(
                f"the {side} side already has a '_salt' column, which this "
                "operator would clobber and drop — rename it first")
    spread = skewed.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int"))
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(s) for s in range(salt)])))
    return (
        spread.join(replicated, [*on, "_salt"], how)
        .drop("_salt")
    )
