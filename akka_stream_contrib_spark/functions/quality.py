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


DEFAULT_QUALITY_WEIGHTS = {
    # hand-set linear weights over portable text features — stands in for a
    # trained fastText/logistic quality model (no ML libs in this container);
    # swap the dict for learned weights without touching the plan shape
    "bias": -1.0,
    "log_n_tokens": 0.6,        # longer docs score higher (log-damped)
    "mean_token_len": 0.25,     # very short tokens = fragmentary text
    "digit_ratio": -3.0,        # numeric soup scores down
    "upper_ratio": -2.0,        # SHOUTING scores down
    "distinct_ratio": 1.5,      # lexical diversity scores up
}


def quality_score(weights: Mapping[str, float] | None = None,
                  id_col: str = "doc_id", text_col: str = "text",
                  ) -> Callable[[DataFrame], DataFrame]:
    """Model-based quality scoring as a PURE column expression: a logistic
    over five portable text features with injected literal weights —
    ``sigmoid(bias + w·features)``. This is the plan shape of running a
    linear/fastText-style quality classifier over a 100 TB corpus: one
    map-side pass, no UDF, no shuffle; the features and the dot product run
    inside whole-stage codegen, and the identical closed form replays on
    any engine (scores rounded to 6 dp absorb last-ulp exp() differences).

    Emits (id, n_tokens, quality_score, keep) where ``keep`` = score >= 0.5.
    """
    w = dict(DEFAULT_QUALITY_WEIGHTS)
    if weights:
        w.update(weights)

    def _apply(df: DataFrame) -> DataFrame:
        txt = F.col(text_col)
        toks = F.split(txt, " ")
        n_tok = F.size(toks).cast("double")
        n_chars = F.length(txt).cast("double")
        mean_len = (n_chars - (n_tok - 1)) / n_tok          # spaces removed
        digit_ratio = (n_chars - F.length(F.regexp_replace(txt, "[0-9]", ""))) / n_chars
        upper_ratio = (n_chars - F.length(F.regexp_replace(txt, "[A-Z]", ""))) / n_chars
        distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tok
        z = (F.lit(float(w["bias"]))
             + F.lit(float(w["log_n_tokens"])) * F.log(n_tok + 1.0)
             + F.lit(float(w["mean_token_len"])) * mean_len
             + F.lit(float(w["digit_ratio"])) * digit_ratio
             + F.lit(float(w["upper_ratio"])) * upper_ratio
             + F.lit(float(w["distinct_ratio"])) * distinct_ratio)
        score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6) + F.lit(0.0)
        return df.select(
            F.col(id_col), n_tok.cast("bigint").alias("n_tokens"),
            score.alias("quality_score"),
            (score >= 0.5).alias("keep"))

    return _apply
