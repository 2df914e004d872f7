"""Watermarked stream-stream interval join.

The enrichment/attribution shape every event pipeline needs live: pair two
unbounded streams on a key where the right event falls inside a time window
anchored at the left event (impression ⋈ click within 30 min, request ⋈
response within a timeout, sensor ⋈ calibration within the hour).

Reference anchor: none — the reference has no joins at all (SURVEY.md §2.7);
this is the streaming member of the engine's join family (`operators/asof.py`,
`operators/interval_join.py`, `range_join` are the batch members).

Scale shape: Spark's stream-stream join keeps BOTH sides' unmatched rows in
keyed state; the watermarks plus the time-bound condition are what make that
state BOUNDED — the state watermark derived from ``lower_s``/``upper_s``
evicts a row as soon as no future partner can match it. Without the time
bound the state grows forever, which is why this wrapper refuses to build
the join without one. Per micro-batch cost is one hash shuffle of each
side's new rows on the key — the same co-partitioned equi-join shape as the
batch ``snapshot_diff``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    l_ts: str,
    r_ts: str,
    lower_s: int = 0,
    upper_s: int = 3600,
    l_watermark: str = "1 hour",
    r_watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``left`` and ``right`` sharing the ``on`` key(s) where
    ``l_ts + lower_s <= r_ts <= l_ts + upper_s`` (inclusive bounds, in
    seconds). Both sides are watermarked here — pass raw streaming frames.

    ``how``: ``inner`` or ``left_outer`` (unmatched left rows emit with
    NULL right columns once the watermark proves no partner can arrive —
    the attribution "impression with no click" row). Other outer forms are
    deliberately out: right/full outer holds the unbounded side's state
    open and is rarely what an attribution pipeline means.

    Column contract: key columns exist on both sides under the same names
    (emitted once); every OTHER column name must be disjoint between the
    sides (raise, don't silently alias — the caller should name columns
    intentionally). ``l_ts``/``r_ts`` must differ so the bound reads
    unambiguously. NULL keys never match (standard equi-join semantics);
    filter them upstream if they carry meaning.

    Works on batch frames too (watermarks are a no-op there) — handy for
    backtests of the exact streaming semantics.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError("stream_interval_join needs at least one key")
    # the bounds are interpolated into SQL interval literals below — coerce
    # to int here so a stray string/float from config parsing becomes a
    # loud error at the call site, not a parse error (or a different join
    # condition) deep inside the plan
    lower_s, upper_s = int(lower_s), int(upper_s)
    if lower_s > upper_s:
        raise ValueError(
            f"empty interval: lower_s={lower_s} > upper_s={upper_s}")
    if how not in ("inner", "left_outer", "leftOuter"):
        raise ValueError(
            f"how must be 'inner' or 'left_outer', got {how!r}")
    if l_ts == r_ts:
        raise ValueError(
            "l_ts and r_ts must be distinct column names (rename one side: "
            "the time-bound condition must reference both unambiguously)")
    for side, ts_col, cols in (("left", l_ts, left.columns),
                               ("right", r_ts, right.columns)):
        if ts_col not in cols:
            raise ValueError(f"{side} side has no column {ts_col!r}")
    missing = [k for k in keys
               if k not in left.columns or k not in right.columns]
    if missing:
        raise ValueError(f"key column(s) {missing} must exist on both sides")
    l_rest = [c for c in left.columns if c not in keys]
    r_rest = [c for c in right.columns if c not in keys]
    clash = sorted(set(l_rest) & set(r_rest))
    if clash:
        raise ValueError(
            f"non-key column name(s) {clash} exist on both sides — rename "
            "them; silent aliasing would make the output schema a guess")

    lw = left.withWatermark(l_ts, l_watermark)
    # key columns are emitted from the LEFT side; the right side's copies
    # are renamed before the join so the output never carries duplicates
    # (and a left_outer NULL-pad leaves the left key intact)
    rw = right.withWatermark(r_ts, r_watermark).select(
        *[F.col(k).alias(f"_sij_{k}") for k in keys], *r_rest)
    cond = None
    for k in keys:
        c = F.col(k) == F.col(f"_sij_{k}")
        cond = c if cond is None else cond & c
    cond = cond & (
        F.col(r_ts) >= F.col(l_ts) + F.expr(f"INTERVAL {lower_s} SECOND")
    ) & (
        F.col(r_ts) <= F.col(l_ts) + F.expr(f"INTERVAL {upper_s} SECOND")
    )
    joined = lw.join(rw, cond,
                     "left_outer" if how != "inner" else "inner")
    return joined.select(*keys, *l_rest, *r_rest)
