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
    stateful callable whose draws are consumed SEQUENTIALLY. This operator is
    the statistical equivalent (identical keep-rate, deterministic), the
    right default at scale; :func:`sample_step_replay` is the exact
    draw-for-draw replay (driver-side cumulative targets + broadcast
    semi-join) when the reference sequence itself is the contract.
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


def sample_step_replay(next_step: Callable[[int], int], seq: str = "seq",
                       n_rows: int | None = None,
                       max_kept: int = 10_000_000
                       ) -> Callable[[DataFrame], DataFrame]:
    """EXACT draw-for-draw replay of ``Sample(next: () => Int)``
    (Sample.scala:32-76): the i-th draw ``g_i = next_step(i) >= 1`` consumes
    ``g_i`` upstream elements and emits the one it lands on, so the emitted
    1-based positions are the cumulative sums ``g_1, g_1+g_2, ...`` —
    the sequential semantics ``sample_step`` deliberately trades away
    (see its docstring).

    This stays scale-safe because the POSITIONS are generated, not scanned:
    the draw sequence is replayed DRIVER-side (a pure recurrence — the
    reference consumes the same callable single-threadedly, so this is not
    a new serial bottleneck; it just runs on tiny integers instead of the
    data), producing ≤ n/min_step target positions (hard-capped at
    ``max_kept``), and the data-side work is the two-phase global rank
    plus a broadcast semi-join against the target table. One range
    exchange total; the one extra eager job is the ``count()`` bounding
    the recurrence (skipped when ``n_rows`` is supplied).

    ``next_step`` takes the 1-based draw index (a stateful reference
    callable ports as ``lambda i: my_draws[i]``) and must return >= 1.
    """

    def _apply(df: DataFrame) -> DataFrame:
        from akka_stream_contrib_spark.operators.global_order import (
            global_rank)

        n = df.count() if n_rows is None else n_rows
        targets, pos, i = [], 0, 0
        while True:
            i += 1
            g = next_step(i)
            if g < 1:
                raise ValueError(
                    f"next_step must return >= 1, got {g} at draw {i}")
            pos += g
            if pos > n:
                break
            targets.append(pos)
            if len(targets) > max_kept:
                raise ValueError(
                    f"sample_step_replay: more than {max_kept} kept "
                    "positions — raise max_kept or use the stateless "
                    "sample_step for rates this dense")
        spark = df.sparkSession
        tdf = spark.createDataFrame([(t,) for t in targets], "_pos bigint")
        ranked = global_rank(df, [seq], out="_pos")
        return (ranked.join(F.broadcast(tdf), "_pos", "left_semi")
                .drop("_pos"))

    return _apply
