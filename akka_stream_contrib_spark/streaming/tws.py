"""transformWithState operators: the timer-carrying state API.

The reference's timer-based stages (`KeepAliveConcat.scala:50` idle timer,
`Pulse.scala:38-44` periodic pull, `AccumulateWhileUnchanged.scala:115-126`
maxDuration flush) map onto `StatefulProcessor` timers one-to-one: state
lives in the per-key store, `handle.registerTimer` is
`scheduleOnce`, and `handleExpiredTimer` is `onTimer`. This module carries
the keep-alive operator on that API; `stateful.py` keeps the
applyInPandasWithState forms (broader version reach, same semantics).

Requires spark >= 4.0 AND the python ``protobuf`` package (the
transformWithState driver worker speaks protobuf to the state server) —
absent in minimal containers, in which case `stateful.py`'s
applyInPandasWithState twins are the runnable path; the accompanying test
import-skips accordingly.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)


class KeepAliveProcessor(StatefulProcessor):
    """Per-key keep-alive (reference `KeepAliveConcat.scala:34-81`):
    pass elements through; whenever a key is idle for ``interval_ms`` of
    processing time, emit its last value flagged ``is_heartbeat=true`` and
    re-arm — the repeat-last extrapolation.

    One timer per key is live at any moment (last write wins): input rows
    delete the pending timer and arm a fresh one, expiry re-arms itself, so
    heartbeats tick every interval until new data or query stop."""

    def __init__(self, interval_ms: int, key_col: str = "key") -> None:
        self.interval_ms = interval_ms
        self.key_col = key_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.last = handle.getValueState("last", "value long")

    def _rearm(self, timer_values: TimerValues) -> None:
        for t in list(self.handle.listTimers()):
            self.handle.deleteTimer(t)
        self.handle.registerTimer(
            timer_values.getCurrentProcessingTimeInMs() + self.interval_ms)

    def handleInputRows(self, key: Any, rows: Iterator[pd.DataFrame],
                        timer_values: TimerValues) -> Iterator[pd.DataFrame]:
        last = None
        for pdf in rows:
            for v in pdf["value"]:
                if pd.isna(v):
                    # a NULL value cannot be extrapolated as a heartbeat;
                    # int(NaN) would kill the whole streaming query
                    continue
                last = int(v)
                yield pd.DataFrame(
                    {self.key_col: [key[0]], "value": [last],
                     "is_heartbeat": [False]})
        if last is not None:
            self.last.update((last,))
            self._rearm(timer_values)

    def handleExpiredTimer(self, key: Any, timer_values: TimerValues,
                           expired: ExpiredTimerInfo) -> Iterator[pd.DataFrame]:
        if self.last.exists():
            (last,) = self.last.get()
            yield pd.DataFrame(
                {self.key_col: [key[0]], "value": [int(last)],
                 "is_heartbeat": [True]})
        self._rearm(timer_values)

    def close(self) -> None:
        pass


def keep_alive_tws(elements: DataFrame, interval_ms: int,
                   key_col: str = "key") -> DataFrame:
    """`keep_alive_stream` on the transformWithState API (real per-key
    timers instead of a single GroupStateTimeout)."""
    key_t = elements.schema[key_col].dataType.simpleString()
    return (
        elements.groupBy(key_col)
        .transformWithStateInPandas(
            KeepAliveProcessor(interval_ms, key_col),
            outputStructType=f"{key_col} {key_t}, value long, is_heartbeat boolean",
            outputMode="append",
            timeMode="ProcessingTime",
        )
    )


class DelayFlowProcessor(StatefulProcessor):
    """Timer-based delayed EMISSION for an arbitrary stateful DelayStrategy —
    the transformWithState rendering of ``DelayFlow(strategySupplier)``
    (DelayFlow.scala:52-53 and the stateful trait at :107-119). Where
    ``stateful.py::delay_strategy_stream`` records the delay decision as an
    event-time shift column, this processor actually HOLDS each element in
    the state store and releases it when its per-element timer fires — the
    reference's timerScheduled→push behavior (DelayFlow.scala:135-152).

    ``strategy`` is the same (state_schema_ddl, init_state, next_delay)
    triple: the strategy state persists in a per-key value state, buffered
    elements in a list state keyed by their due processing time, and one
    timer per due instant releases everything that has matured.
    """

    def __init__(self, strategy, key_col: str = "key") -> None:
        self.state_ddl, self.init_state, self.next_delay = strategy
        self.key_col = key_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.strategy_state = handle.getValueState("strategy", self.state_ddl)
        self.pending = handle.getListState(
            "pending", "seq long, delay_s double, due_ms long")

    def handleInputRows(self, key: Any, rows: Iterator[pd.DataFrame],
                        timer_values: TimerValues) -> Iterator[pd.DataFrame]:
        st = (tuple(self.strategy_state.get())
              if self.strategy_state.exists() else tuple(self.init_state))
        now = timer_values.getCurrentProcessingTimeInMs()
        # concat ALL Arrow chunks before the one sort: a key with more rows
        # than the Arrow batch size arrives as several pdfs, and per-chunk
        # sorting would feed seq 10050 to the strategy before seq 9990
        chunks = list(rows)
        batch = pd.concat(chunks) if chunks else pd.DataFrame()
        immediate = []
        if len(batch):
            for _, r in batch.sort_values("seq").iterrows():
                delay, st = self.next_delay(st, r)
                if delay <= 0:
                    # non-positive delay pushes IMMEDIATELY (DelayFlow.
                    # scala:144-145 "if (delay <= Duration.Zero) push")
                    # instead of holding the element behind a timer until
                    # the next trigger (r9 ADVICE)
                    immediate.append((int(r["seq"]), float(delay)))
                    continue
                due = now + int(float(delay) * 1000)
                self.pending.appendValue((int(r["seq"]), float(delay), due))
                self.handle.registerTimer(due)
        self.strategy_state.update(st)
        if immediate:
            return iter((pd.DataFrame(
                {self.key_col: [key[0]] * len(immediate),
                 "seq": [s for s, _ in immediate],
                 "delay_s": [d for _, d in immediate]}),))
        return iter(())

    def handleExpiredTimer(self, key: Any, timer_values: TimerValues,
                           expired: ExpiredTimerInfo) -> Iterator[pd.DataFrame]:
        fire = expired.getExpiryTimeInMs()
        keep, release = [], []
        for seq, delay_s, due in self.pending.get():
            (release if due <= fire else keep).append(
                (int(seq), float(delay_s), int(due)))
        self.pending.clear()
        for row in keep:
            self.pending.appendValue(row)
        if release:
            release.sort()
            yield pd.DataFrame(
                {self.key_col: [key[0]] * len(release),
                 "seq": [s for s, _, _ in release],
                 "delay_s": [d for _, d, _ in release]})

    def close(self) -> None:
        pass


def delay_flow_tws(elements: DataFrame, strategy,
                   key_col: str = "key") -> DataFrame:
    """``DelayFlow`` with a user-supplied stateful strategy on real
    transformWithState timers: elements are held per key and pushed when
    their delay matures. Output: (key, seq, delay_s) in release order."""
    key_t = elements.schema[key_col].dataType.simpleString()
    return (
        elements.groupBy(key_col)
        .transformWithStateInPandas(
            DelayFlowProcessor(strategy, key_col),
            outputStructType=f"{key_col} {key_t}, seq long, delay_s double",
            outputMode="append",
            timeMode="ProcessingTime",
        )
    )
