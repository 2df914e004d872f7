"""Shared small helpers."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

_US_PER_DAY = 86_400_000_000


def epoch_micros(c: Column | str) -> Column:
    """Wall-clock microseconds since epoch, safe for BOTH ``timestamp`` and
    ``timestamp_ntz`` inputs (``F.unix_micros`` rejects NTZ with
    DATATYPE_MISMATCH — the driver's parquet fixtures read as NTZ).

    Decomposes into date + time-of-day fields, so for an NTZ column the result
    is session-timezone-independent; for an LTZ column under the engine's
    pinned UTC session it equals ``unix_micros``. ``date_part('SECOND')``
    carries the microsecond fraction as an exact decimal.
    """
    if isinstance(c, str):
        c = F.col(c)
    return (
        F.unix_date(F.to_date(c)).cast("bigint") * F.lit(_US_PER_DAY)
        + F.hour(c).cast("bigint") * F.lit(3_600_000_000)
        + F.minute(c).cast("bigint") * F.lit(60_000_000)
        + (F.date_part(F.lit("SECOND"), c) * F.lit(1_000_000)).cast("bigint")
    )


def normalize_cols(cols: str | Sequence[str] | None) -> list[str]:
    """Accept a bare column name, a sequence of names, or None. A bare
    string would otherwise iterate character-by-character through
    ``Window.partitionBy(*cols)`` — a silent wrong-plan bug."""
    if cols is None:
        return []
    if isinstance(cols, str):
        return [cols]
    return list(cols)
