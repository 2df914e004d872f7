"""In-engine linear-model training: the quality-classifier workflow closed
end-to-end. `quality_score` (functions/quality.py) SCORES a corpus with a
fastText-style linear model as a pure codegen expression; this module TRAINS
that model on the cluster, so the full loop — label a sample, fit, score
100 TB map-side — never leaves the engine.

Training shape (fourth member of the bounded-driver-loop family with
k-means / PageRank / BPE-learn): full-batch gradient descent where each
iteration is ONE Arrow pass emitting per-batch gradient partials
(Σ (σ(wx+b) − y)·x, Σ (σ−y), n — a (dim+2)-vector per batch) that combine
on the driver. Nothing but the weight vector crosses the loop boundary;
per-iteration cost at 100 TB is one scan, no shuffle at all.

Reference anchor: the cyclic wiring is `FeedbackLoop.scala:18-38`
re-expressed; the scoring path matches `quality_score`'s plan shape.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def logreg_train(df: DataFrame, feature_col: str = "features",
                 label_col: str = "label", iters: int = 20,
                 lr: float = 1.0, l2: float = 0.0) -> tuple[np.ndarray, float]:
    """Fit logistic regression (full-batch GD, deterministic zero init,
    fixed step) over an ``array<double>`` feature column and a 0/1 label.
    Returns (weights, bias).

    Full-batch rather than SGD: partials are associative, every pass sees
    all data, and the result is independent of partitioning — the property
    that makes distributed training reproducible. For ill-conditioned
    features standardize first (`quantile_normalize` or winsorize)."""
    first = df.select(feature_col).head()
    if first is None:
        return np.zeros(0), 0.0
    dim = len(first[0])
    w = np.zeros(dim)
    b = 0.0
    spark = df.sparkSession
    base = df.select(F.col(feature_col).cast("array<double>").alias("x"),
                     F.col(label_col).cast("double").alias("y"))
    # NOTE on caching: at real scale, localCheckpoint/persist the (x, y)
    # frame so iterations do not replay the source scan + featurization;
    # measured at the bench SFs (5k rows) the extra materialization job
    # costs MORE than the re-scan, so the loop deliberately stays lazy and
    # leaves caching to the caller (pass an already-checkpointed frame).
    for _ in range(iters):
        b_wb = spark.sparkContext.broadcast((w, b))

        def _grad(batches: Iterator[pd.DataFrame], _b=b_wb) -> Iterator[pd.DataFrame]:
            ww, bb = _b.value
            for pdfb in batches:
                if len(pdfb) == 0:
                    continue
                X = np.stack(pdfb["x"].to_numpy())
                y = pdfb["y"].to_numpy(dtype=np.float64)
                p = 1.0 / (1.0 + np.exp(-(X @ ww + bb)))
                err = p - y
                yield pd.DataFrame({
                    "gw": [err @ X], "gb": [float(err.sum())],
                    "n": [len(y)]})

        parts = base.mapInPandas(
            _grad, schema="gw array<double>, gb double, n long").collect()
        n_tot = sum(r["n"] for r in parts) or 1
        gw = np.zeros(dim)
        gb = 0.0
        for r in parts:
            gw += np.asarray(r["gw"])
            gb += r["gb"]
        w -= lr * (gw / n_tot + l2 * w)
        b -= lr * gb / n_tot
    return w, b


def logreg_predict(weights: Sequence[float], bias: float,
                   feature_col: str = "features") -> Column:
    """The trained model as a scoring COLUMN — inject the weights as
    literals and score inside whole-stage codegen, exactly like
    `quality_score`: zero shuffles over any corpus size."""
    warr = F.array(*[F.lit(float(v)) for v in weights])
    z = F.aggregate(
        F.zip_with(F.col(feature_col).cast("array<double>"), warr,
                   lambda x, wv: x * wv),
        F.lit(0.0), lambda acc, x: acc + x) + F.lit(float(bias))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def text_feature_vector(text_col: str = "text") -> Column:
    """The five portable `quality_score` features packed as an
    ``array<double>`` — the standard featurization for training the filter
    model on a labeled sample."""
    txt = F.col(text_col)
    toks = F.split(txt, " ")
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(txt).cast("double")
    return F.array(
        F.log(n_tok + F.lit(1.0)),
        (n_chars - (n_tok - F.lit(1.0))) / n_tok,
        (n_chars - F.length(F.regexp_replace(txt, "[0-9]", ""))) / n_chars,
        (n_chars - F.length(F.regexp_replace(txt, "[A-Z]", ""))) / n_chars,
        F.size(F.array_distinct(toks)).cast("double") / n_tok,
    )
