"""Sampling operators.

Re-expresses ``Sample`` (reference: Sample.scala:22-76): keep every nth
element, or step-sample with a dynamic step. The reference counts elements
one-at-a-time; on Spark the element position must be an explicit column, so
these are pure ``filter`` expressions — Catalyst pushes them into the scan
where possible, and they stay inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic LCG parameters (Lehmer / MINSTD) used for reproducible
# "random" step sampling that a SQL oracle can replicate exactly.
_LCG_A = 48271
_LCG_M = 65536


def sample_nth(nth: int, seq: str = "seq") -> Callable[[DataFrame], DataFrame]:
    """Keep elements at 1-based positions nth, 2*nth, ... of the ``seq`` order.

    Semantics pinned by the reference test ``SampleSpec.scala:22-30``
    (``list.filter(_ % n == 0)`` for a 1-based dense sequence). ``seq`` must be
    a dense 0- or 1-based monotonic index column; pass ``one_based=False``
    via a +1 shift upstream if needed.

    Scale: a single Column predicate — no shuffle, no state; predicate is
    eligible for scan-level pushdown.
    """
    if nth <= 0:
        raise ValueError("nth must be positive")

    def _apply(df: DataFrame) -> DataFrame:
        return df.filter(F.pmod(F.col(seq), F.lit(nth)) == 0)

    return _apply


def sample_step(max_step: int, seq: str = "seq",
                threshold_num: int | None = None) -> Callable[[DataFrame], DataFrame]:
    """Deterministic pseudo-random sampling ≈ ``Sample(next)`` / ``Sample.random``
    (Sample.scala:32-76) with expected keep-rate 1/max_step.

    The reference draws a random step in [1, maxStep] and keeps the element the
    step lands on — a rate-1/E[step] sampler. Here each element is kept iff
    ``(seq * 48271) mod 65536 < 65536/max_step`` — a stateless Lehmer-style
    hash that (a) needs no sequential scan, so it parallelizes over any number
    of partitions, and (b) is exactly reproducible in ANSI SQL for the oracle.

    Documented deviation: the reference's ``next: () => Int`` is an arbitrary
    stateful callable whose draws are consumed SEQUENTIALLY — replaying that
    exactly would need a cumulative sum of the draw sequence (a global-order
    scan; SURVEY §2.2 notes the same), coupling every row to its predecessors
    for no statistical benefit. This operator is the statistical equivalent
    (identical keep-rate, deterministic), not a draw-for-draw replay; a
    pipeline that truly needs replayed stateful draws can feed the draw
    sequence as a column and filter on its running sum via
    ``operators.global_order.global_running_sum``.
    """
    if max_step <= 0:
        raise ValueError("max_step must be positive")
    if max_step > _LCG_M:
        raise ValueError(
            f"max_step must be <= {_LCG_M}: the keep-threshold {_LCG_M}//max_step "
            "floors to 0 beyond that and the sampler would keep nothing")
    thr = threshold_num if threshold_num is not None else _LCG_M // max_step

    def _apply(df: DataFrame) -> DataFrame:
        return df.filter(
            F.pmod(F.col(seq) * F.lit(_LCG_A), F.lit(_LCG_M)) < F.lit(thr)
        )

    return _apply


def sample_random(fraction: float, seed: int = 42) -> Callable[[DataFrame], DataFrame]:
    """Statistical sampling via Spark's native Bernoulli sampler (non-oracle
    path — not bit-reproducible across engines, but the right tool at scale:
    sampling happens during the scan with zero shuffle)."""

    def _apply(df: DataFrame) -> DataFrame:
        return df.sample(fraction=fraction, seed=seed)

    return _apply


def reservoir_sample(k: int, id_col: str = "seq") -> Callable[[DataFrame], DataFrame]:
    """Deterministic k-row uniform sample without replacement: rank every row
    by a multiplicative-congruential hash of its id (Lehmer-style multiplier
    2654435761 = Knuth's 2^32/phi, modulus 2^31) and keep the k smallest.

    The distributed analogue of reservoir sampling (the reference's
    ``Sample.random``, Sample.scala:32-44, draws per-element random steps):
    identical output on every engine/run for a given id set, unlike
    ``df.sample`` whose draw depends on partition layout. Plan shape: a
    map-side expression + TakeOrdered(k) — each partition keeps its local
    top-k and only k rows per partition reach the driver-side merge; no
    full sort, no shuffle of the data. Survives any scale where k fits in
    memory; for k beyond that, swap the limit for a rank-filter window.
    """
    if k <= 0:
        raise ValueError(f"reservoir_sample requires k >= 1, got {k}")

    def _apply(df: DataFrame) -> DataFrame:
        key = F.pmod(F.pmod(F.col(id_col).cast("bigint"), F.lit(2147483648))
                     * F.lit(2654435761), F.lit(2147483648))
        return (df.withColumn("_rsv_key", key)
                .orderBy("_rsv_key", id_col)
                .limit(k)
                .drop("_rsv_key"))

    return _apply
