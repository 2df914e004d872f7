"""Failure-as-data — the engine-wide convention for the reference's
``Try[O]``/``Either`` payloads (SURVEY.md §7): a uniform
``(ok boolean, value, error string)`` row shape.

``try_transform`` wraps an arbitrary per-row Python function as an
Arrow-batched stage that never fails the job: each row yields either
(ok=true, value, null) or (ok=false, null, error-message) — the row-level
analogue of ``Retry``'s failure capture (Retry.scala:43) and ``LastElement``'s
failure recovery (LastElement.scala:66-69). Feed the failed side to
``operators.retry`` for re-processing.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame


def try_transform(
    fn: Callable[[object], object],
    in_col: str,
    value_type: str = "string",
    keep_cols: tuple[str, ...] = (),
) -> Callable[[DataFrame], DataFrame]:
    """mapInPandas stage applying ``fn`` per element with per-row failure
    capture. Output: keep_cols..., ok boolean, value <value_type>,
    error string."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            oks, vals, errs = [], [], []
            for x in pdf[in_col]:
                try:
                    vals.append(fn(x))
                    oks.append(True)
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — failure IS the data
                    vals.append(None)
                    oks.append(False)
                    errs.append(f"{type(e).__name__}: {e}")
            out = pdf[list(keep_cols)].copy() if keep_cols else pd.DataFrame(index=pdf.index)
            out["ok"] = oks
            out["value"] = vals
            out["error"] = errs
            yield out

    def _apply(df: DataFrame) -> DataFrame:
        keep_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in df.schema if f.name in keep_cols)
        schema = ", ".join(filter(None, [
            keep_schema, f"ok boolean, value {value_type}, error string"]))
        return df.mapInPandas(_run, schema=schema)

    return _apply
