"""Shared small helpers."""

from __future__ import annotations

from collections.abc import Sequence


def normalize_cols(cols: str | Sequence[str] | None) -> list[str]:
    """Accept a bare column name, a sequence of names, or None. A bare
    string would otherwise iterate character-by-character through
    ``Window.partitionBy(*cols)`` — a silent wrong-plan bug."""
    if cols is None:
        return []
    if isinstance(cols, str):
        return [cols]
    return list(cols)
