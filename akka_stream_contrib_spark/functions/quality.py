"""Data-quality gates: expectation checks and distribution-tail clamping.

A 100 TB ingest pipeline runs expectation checks as a *single extra
aggregate over the scan it already pays for* — never one pass per check.
`expect` compiles a dict of violation predicates into one conditional-sum
aggregation and unpivots the single result row into a (check_name,
n_violations) report. `winsorize` clamps a column to per-group exact
percentile bounds (the standard outlier treatment before feature
normalization), one group aggregate + a broadcast join back over the scan.

Reference anchor: none (quality gating is a BASELINE.json-mandate
extension); the single-pass conditional-sum shape is the same partial
aggregation discipline as the TPC-H queries.
"""

from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect(checks: Mapping[str, Column]) -> Callable[[DataFrame], DataFrame]:
    """Evaluate each violation predicate in ``checks`` over the frame in ONE
    aggregation pass; returns (check_name, n_violations) rows in dict order.
    A predicate that evaluates NULL on a row (e.g. comparisons on null
    input) counts as no violation on that row — write explicit
    ``isNull``/``isNotNull`` checks for null contracts.
    """
    if not checks:
        raise ValueError("expect needs at least one check")

    def _apply(df: DataFrame) -> DataFrame:
        agg = df.agg(*[
            F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias(name)
            for name, pred in checks.items()
        ])
        pairs = F.array(*[
            F.struct(F.lit(name).alias("check_name"),
                     F.coalesce(F.col(name), F.lit(0)).alias("n_violations"))
            for name in checks
        ])
        return (agg.select(F.explode(pairs).alias("kv"))
                .select("kv.check_name", "kv.n_violations"))

    return _apply


def winsorize(keys: str | list[str], value: str = "value",
              p_lo: float = 0.05, p_hi: float = 0.95,
              out_col: str | None = None) -> Callable[[DataFrame], DataFrame]:
    """Clamp ``value`` to the exact interpolated [p_lo, p_hi] percentiles of
    its group. Bounds are rounded to 6 dp so the thresholds (and therefore
    every clamped value) are engine-portable; the clamp itself is
    least/greatest — no further FP arithmetic.

    Scale shape: one hash aggregate on the (low-cardinality) group keys,
    the tiny bounds table broadcast back over the scan. Exact percentiles
    need the group's values sorted per partition — for extreme-cardinality
    groups swap in ``approx_percentile`` at the same call site.
    """
    keylist = [keys] if isinstance(keys, str) else list(keys)
    out = out_col or f"{value}_wins"

    def _apply(df: DataFrame) -> DataFrame:
        bounds = df.groupBy(*keylist).agg(
            F.round(F.expr(f"percentile({value}, {p_lo})"), 6).alias("_lo"),
            F.round(F.expr(f"percentile({value}, {p_hi})"), 6).alias("_hi"),
        )
        return (df.join(F.broadcast(bounds), keylist)
                .withColumn(out, F.least(F.greatest(F.col(value),
                                                    F.col("_lo")),
                                         F.col("_hi")))
                .drop("_lo", "_hi"))

    return _apply
