"""Retry combinators.

``Retry`` (reference Retry.scala:42-176) wraps a fallible 1:1 flow
``(I, S) => (Try[O], S)`` and re-injects failed elements through the flow using
``retryWith(state)``. Spark plans are DAGs, so the reference's cyclic graph
becomes **driver-side iteration over DataFrames** (SURVEY.md §3.2): apply the
flow to the whole pending set (one distributed pass per round — the loop is per
*round*, not per element), split ok/failed, derive retry inputs, repeat.

Failure-as-data convention (SURVEY.md §7): the flow marks rows with a boolean
``ok`` column plus nullable ``value``/``error`` payloads — the reference's
``Try[O]``.

Scale notes: each round is a full DataFrame transformation (no collect); the
per-round attempt set is pipeline-persisted (r10, the graph.py discipline:
the round's termination count doubles as the cache materialization — no
eager checkpoint job per round) with an EAGER checkpoint every 8th round to
bound analyzed-tree growth at deep retry chains;
``retries_limit``/``buffer_limit`` (Retry.scala:234-271) become aggregate
guard checks that abort the loop.
"""

from __future__ import annotations

from functools import reduce
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FlowFn = Callable[[DataFrame], DataFrame]          # adds ok/value/error cols
RetryWithFn = Callable[[DataFrame], DataFrame]     # failed rows -> new attempt rows


def _union_all(frames: list[DataFrame]) -> DataFrame:
    # allowMissingColumns: given-up rows may be in the flow's INPUT schema
    # (no ok/value/error yet) — missing payload columns null-fill
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)


def _give_up_as_failures(gave_up: DataFrame) -> DataFrame:
    """Rows retry_with marked give_up=true are emitted as FINAL FAILURES
    (reference: retryWith(s) = None). They may arrive in the flow's input
    schema — normalize the failure-as-data columns so the union is sound."""
    out = gave_up.drop("give_up")
    if "ok" not in out.columns:
        out = out.withColumn("ok", F.lit(False))
    if "error" not in out.columns:
        out = out.withColumn("error", F.lit("gave_up"))
    return out


def retry(
    df: DataFrame,
    flow: FlowFn,
    retry_with: RetryWithFn,
    max_rounds: int = 64,
) -> DataFrame:
    """Run ``flow`` over ``df``; rows with ``ok=false`` are transformed by
    ``retry_with`` into a new attempt set (rows it drops are given up and
    emitted as failures) and re-run, up to ``max_rounds``.

    ``retry_with`` receives the failed rows (with ``attempts``) and returns the
    next attempt set in the flow's input schema. Failures it will not retry
    (the reference's ``retryWith(s) = None``) must be returned with a boolean
    ``give_up = true`` marker — those are emitted as final failures. An empty
    retry set ends the loop. Emitted rows carry ``attempts`` = number of flow
    applications.
    """
    from akka_stream_contrib_spark.util import pipeline_cache

    emitted: list[DataFrame] = []
    pending = df.withColumn("attempts", F.lit(0))
    for rnd in range(max_rounds):
        applied = flow(pending).withColumn("attempts", F.col("attempts") + 1)
        # pipeline-persist, eager checkpoint every 8th round (see module
        # docstring); the count probe below scans every partition of
        # `applied` and so fully materializes the round's cache
        applied = (applied.localCheckpoint(eager=True)
                   if rnd % 8 == 7 else pipeline_cache(applied))
        succeeded = applied.filter(F.col("ok"))
        failed = applied.filter(~F.col("ok"))
        emitted.append(succeeded)
        retried = retry_with(failed)
        if "give_up" in retried.columns:
            emitted.append(_give_up_as_failures(retried.filter(F.col("give_up"))))
            retried = retried.filter(~F.col("give_up")).drop("give_up")
        if retried.count() == 0:
            break
        pending = retried
    else:
        raise RuntimeError(f"retry: exceeded max_rounds={max_rounds}")
    return _union_all(emitted)


def retry_concat(
    df: DataFrame,
    flow: FlowFn,
    retry_with: RetryWithFn,
    retries_limit: int | None = None,
    buffer_limit: int | None = None,
    max_rounds: int = 64,
) -> DataFrame:
    """``Retry.concat`` (Retry.scala:84-95): ``retry_with`` may emit *several*
    retry rows per failure (split a heavy element). ``retries_limit`` caps the
    cumulative number of re-injected rows and ``buffer_limit`` caps the emitted
    output size; exceeding either raises (the reference fails the stage,
    Retry.scala:234-239, 263-271). With both limits None (default) the loop
    runs ONE counting action per round — the termination check on the retry
    set; the emitted side is never counted."""
    from akka_stream_contrib_spark.util import pipeline_cache

    emitted: list[DataFrame] = []
    emitted_rows = 0
    retried_rows = 0
    pending = df.withColumn("attempts", F.lit(0))
    for rnd in range(max_rounds):
        applied = flow(pending).withColumn("attempts", F.col("attempts") + 1)
        # pipeline-persist; eager checkpoint every 8th round (module
        # docstring) — the per-round termination count materializes it
        applied = (applied.localCheckpoint(eager=True)
                   if rnd % 8 == 7 else pipeline_cache(applied))
        succeeded = applied.filter(F.col("ok"))
        failed = applied.filter(~F.col("ok"))
        emitted.append(succeeded)
        if buffer_limit is not None:
            emitted_rows += succeeded.count()
            if emitted_rows > buffer_limit:
                raise RuntimeError(f"retry_concat: buffer_limit={buffer_limit} exceeded")
        retried = retry_with(failed)
        if "give_up" in retried.columns:
            emitted.append(_give_up_as_failures(retried.filter(F.col("give_up"))))
            retried = retried.filter(~F.col("give_up")).drop("give_up")
        n = retried.count()
        if n == 0:
            break
        retried_rows += n
        if retries_limit is not None and retried_rows > retries_limit:
            raise RuntimeError(f"retry_concat: retries_limit={retries_limit} exceeded")
        pending = retried
    else:
        raise RuntimeError(f"retry_concat: exceeded max_rounds={max_rounds}")
    return _union_all(emitted)
