"""Valve — pause/resume gate for a streaming pipeline.

Re-expresses ``Valve`` (reference Valve.scala:16-145): a materialized switch
with ``flip(Open|Close)`` and ``getMode()``. Closed = backpressure upstream;
nothing is lost. The durable Spark equivalent is query lifecycle control:
stopping a checkpointed query halts consumption (offsets persist — *better*
than the reference, which can drop one in-flight element on close+complete,
Valve.scala:40-58), restarting resumes exactly where it stopped.
"""

from __future__ import annotations

import enum
import threading
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


class SwitchMode(enum.Enum):
    OPEN = "open"
    CLOSED = "closed"


class Valve:
    """Wraps a query-starting thunk with open/close semantics.

    ``start_query`` must start (or restart) the checkpointed StreamingQuery
    and return it — the checkpoint is what makes flip(Open) resume without
    loss.
    """

    def __init__(self, start_query: Callable[[], StreamingQuery],
                 mode: SwitchMode = SwitchMode.OPEN):
        self._start = start_query
        self._query: StreamingQuery | None = None
        self._mode = SwitchMode.CLOSED
        # the reference's materialized switch is safe to flip from any
        # thread (Future[Boolean]); without a lock two racing flip(OPEN)
        # calls both pass the mode check and start TWO queries against one
        # checkpoint (the leaked handle keeps running), and a racing close
        # can stop None
        self._lock = threading.RLock()
        if mode == SwitchMode.OPEN:
            self.flip(SwitchMode.OPEN)

    def _sync(self) -> None:
        """Reconcile with reality: a query that terminated or failed on its
        own (source error, external stop) leaves the valve CLOSED — without
        this, get_mode() would report OPEN forever and flip(OPEN) would
        refuse to restart a dead query."""
        if self._mode == SwitchMode.OPEN and (
                self._query is None or not self._query.isActive):
            self._query = None
            self._mode = SwitchMode.CLOSED

    def flip(self, mode: SwitchMode) -> bool:
        """Returns True if the mode changed (reference Valve.scala:25-31
        returns Future[Boolean] with the same contract). Thread-safe like
        the reference's switch."""
        with self._lock:
            self._sync()
            if mode == self._mode:
                return False
            if mode == SwitchMode.OPEN:
                self._query = self._start()
            else:
                if self._query is None:
                    raise RuntimeError("Valve: no query to close")
                self._query.stop()
                self._query = None
            self._mode = mode
            return True

    def get_mode(self) -> SwitchMode:
        with self._lock:
            self._sync()
            return self._mode

    @property
    def query(self) -> StreamingQuery | None:
        return self._query
