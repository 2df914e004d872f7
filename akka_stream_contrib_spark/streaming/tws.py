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
