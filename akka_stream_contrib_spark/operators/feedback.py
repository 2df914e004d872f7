"""Cyclic generation combinators.

- ``feedback_loop``: reference ``FeedbackLoop.scala:18-38`` — feed one output
  of a fan-out flow back into its input (MergePreferred + overflow-fail
  buffer; Fibonacci golden test FeedbackLoopSpec.scala:166). Spark plans are
  acyclic, so the cycle is driver-side iteration over DataFrames: each round
  applies the forward flow to the current feedback frame (one distributed pass
  per round), accumulates output rows lazily, and the reference's
  ``feedbackBufferSize`` fail-on-overflow becomes a guard count.

- ``unfold_flow``: reference ``SourceGen.unfoldFlow`` (SourceGen.scala:35-111)
  — loop a state through a flow emitting ``(S, E)`` until exhaustion. A single
  seed is inherently sequential, but unfolding is embarrassingly parallel
  *across seeds*, so the Spark-first form runs the per-seed state machine
  inside ``mapInPandas`` — trajectories for millions of seeds compute in
  parallel on executors with zero driver round-trips (this is also how the
  Collatz golden test UnfoldFlowSpec.scala:22-27 is expressed distributively).
"""

from __future__ import annotations

from functools import reduce
from typing import Callable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ForwardFn = Callable[[DataFrame], Tuple[DataFrame, DataFrame]]  # -> (out, feedback)
StepFn = Callable[[object], "tuple[object, object] | None"]     # state -> (next_state, emit) | None


def feedback_loop(
    initial: DataFrame,
    forward: ForwardFn,
    max_iters: int,
    feedback_buffer_size: int | None = None,
    check_every: int = 0,
) -> DataFrame:
    """Iterate ``forward`` starting from ``initial``; union all per-round
    outputs.

    With a fixed ``max_iters`` and ``check_every=0`` the whole loop is *lazy*:
    no job runs until the result is consumed (40 Fibonacci rounds = one Spark
    job). Set ``check_every=k`` for convergence-style loops: every k rounds the
    feedback frame is localCheckpoint-ed (lineage truncation) and tested for
    emptiness / the reference's buffer overflow (FeedbackLoop.scala:34,
    OverflowStrategy.fail → RuntimeError here).
    """
    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    outs: list[DataFrame] = []
    fb = initial
    for i in range(max_iters):
        out, fb = forward(fb)
        outs.append(out)
        if check_every and (i + 1) % check_every == 0:
            fb = fb.localCheckpoint(eager=True)
            n = fb.count()
            if feedback_buffer_size is not None and n > feedback_buffer_size:
                raise RuntimeError(
                    f"feedback_loop: feedback buffer overflow ({n} > {feedback_buffer_size})")
            if n == 0:
                break
    return reduce(lambda a, b: a.unionByName(b), outs)


def unfold_flow(
    seeds: DataFrame,
    step: StepFn,
    seed_col: str = "seed",
    out_schema: str = "seed bigint, step int, value bigint",
    max_steps: int = 100_000,
) -> DataFrame:
    """Distributed unfold: for every row of ``seeds``, run the sequential
    ``step`` state machine to exhaustion inside executors, emitting one row per
    step: (seed, step_no, emitted value).

    ``step(state) -> (next_state, emit) | None``; the initial state is the
    seed value itself. ``max_steps`` bounds runaway state machines (the
    reference guards half-closed cycles with a timeout, UnfoldFlow.scala:33-50).
    """

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows_seed, rows_step, rows_val = [], [], []
            for s in pdf[seed_col]:
                state = s
                for i in range(max_steps):
                    nxt = step(state)
                    if nxt is None:
                        break
                    state, emit = nxt
                    rows_seed.append(s)
                    rows_step.append(i)
                    rows_val.append(emit)
                else:
                    raise RuntimeError(f"unfold_flow: seed {s} exceeded max_steps={max_steps}")
            yield pd.DataFrame({"seed": rows_seed, "step": rows_step, "value": rows_val})

    return seeds.mapInPandas(_gen, schema=out_schema)


def unfold_flow_with(
    seeds: DataFrame,
    flow: Callable[[object], object],
    unfold_with: Callable[[object], "tuple[object, object] | None"],
    seed_col: str = "seed",
    out_schema: str = "seed bigint, step int, value bigint",
    max_steps: int = 100_000,
) -> DataFrame:
    """Reference ``SourceGen.unfoldFlowWith`` (SourceGen.scala:70-95): unlike
    ``unfoldFlow``'s fused ``S => Option[(S, E)]`` step, the flow ``S => O``
    and the continue/stop decision ``unfoldWith: O => Option[(S, E)]`` are
    SEPARATE functions — the flow computes, the decision function decides
    whether its output re-enters the loop and what to emit. The composition
    is exactly ``unfold_flow`` with ``step = unfold_with ∘ flow``, so it
    inherits the same distributed per-seed execution."""

    def step(state):
        return unfold_with(flow(state))

    return unfold_flow(seeds, step, seed_col=seed_col,
                       out_schema=out_schema, max_steps=max_steps)
