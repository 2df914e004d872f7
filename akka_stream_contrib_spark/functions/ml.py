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
                 lr: float = 1.0, l2: float = 0.0,
                 dim: int | None = None) -> tuple[np.ndarray, float]:
    """Fit logistic regression (full-batch GD, deterministic zero init,
    fixed step) over an ``array<double>`` feature column and a 0/1 label.
    Returns (weights, bias).

    Full-batch rather than SGD: partials are associative, every pass sees
    all data, and the result is independent of partitioning — the property
    that makes distributed training reproducible. For ill-conditioned
    features standardize first (`quantile_normalize` or winsorize)."""
    # dim passed by a caller that KNOWS its featurization width skips the
    # probing head() — one driver job less (r11, guide §1.2); the training
    # math is unchanged (an empty frame sums zero gradients either way)
    if dim is None:
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
    #
    # Low-dim fast path: the gradient Σ err·x_j is expressible as plain
    # codegen sums over the shared err subexpression — one JVM-only agg job
    # per iteration, no Arrow transfer, no Python workers (measured ~2×
    # faster per iteration than the mapInPandas partials at sf0.1). The
    # whole iteration is ONE selectExpr of parsed SQL text: the literal
    # weights round-trip through repr()+'D' exactly, and one py4j call per
    # aggregate replaces the ~60-call Column-expression build that cost
    # ~0.1 s/iteration (15 iterations: 3.6 s → 1.4 s warm at sf0.1,
    # bit-identical weights; same lever as pq_topk_adc's LUT). Partials
    # associate differently than numpy's per-partition fold either way
    # (driver-side add vs partial agg), so the ~1e-14 weight agreement the
    # oracle's 6-dp rounding absorbs is unchanged. High-dim models keep
    # the Arrow path (dim codegen sum columns stop being a win).
    if dim <= 64:
        import math
        for _ in range(iters):
            if not (all(map(math.isfinite, w)) and math.isfinite(b)):
                # the old Column-literal path tolerated inf/nan silently and
                # trained garbage; the SQL-text literal would not even parse
                raise ValueError(
                    "logreg_train: non-finite weights (diverged) — lower lr "
                    "or standardize features")
            # dim == 0 (empty feature arrays) folds z to the bias alone,
            # like the old zip_with form — an empty join would emit
            # unparseable SQL '(0.0D + )'
            terms = "".join(f" + x[{j}] * {float(w[j])!r}D"
                            for j in range(dim))
            zs = f"((0.0D{terms}) + {float(b)!r}D)"
            es = f"(1.0D / (1.0D + exp(-{zs})) - y)"
            row = base.selectExpr(
                *[f"sum({es} * x[{j}]) AS g{j}" for j in range(dim)],
                f"sum({es}) AS gb", "count(1) AS n").collect()[0]
            n_tot = row["n"] or 1
            # sum over an EMPTY frame is NULL — reachable when a caller
            # passes dim explicitly (skipping the emptiness-detecting
            # head()); a zero gradient leaves the weights at init, the
            # same model the old early-return produced
            gw = np.array([row[f"g{j}"] if row[f"g{j}"] is not None else 0.0
                           for j in range(dim)], dtype=np.float64)
            w -= lr * (gw / n_tot + l2 * w)
            b -= lr * float(row["gb"] if row["gb"] is not None else 0.0) \
                / n_tot
        return w, b
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


def classification_report(label_col: str = "label",
                          predicted_col: str = "predicted",
                          group_by: Sequence[str] | None = None):
    """Evaluation counterpart to `logreg_train`: confusion counts and
    precision/recall/F1 from any (label, predicted) frame in ONE
    conditional-sum aggregation pass (same single-aggregate discipline as
    `quality.expect`) — no per-class shuffle, engine-exact arithmetic.
    Returns a 1-row frame (tp, fp, fn, tn, precision, recall, f1,
    accuracy), ratios rounded to 6 dp.

    ``group_by`` turns it into a SLICED evaluation — one report row per
    slice (per language, per source, per cohort), the fairness/regression
    view an eval pipeline actually publishes. Same single pass; the only
    cost is the map-combined slice-key shuffle."""
    def _apply(df):
        y = F.col(label_col).cast("int")
        p = F.col(predicted_col).cast("int")
        base = df.groupBy(*group_by) if group_by else df
        agg = base.agg(
            F.sum(((y == 1) & (p == 1)).cast("long")).alias("tp"),
            F.sum(((y == 0) & (p == 1)).cast("long")).alias("fp"),
            F.sum(((y == 1) & (p == 0)).cast("long")).alias("fn"),
            F.sum(((y == 0) & (p == 0)).cast("long")).alias("tn"))
        prec = F.try_divide(F.col("tp"), F.col("tp") + F.col("fp"))
        rec = F.try_divide(F.col("tp"), F.col("tp") + F.col("fn"))
        return agg.select(
            *(list(group_by) if group_by else []),
            "tp", "fp", "fn", "tn",
            (F.round(prec, 6) + F.lit(0.0)).alias("precision"),
            (F.round(rec, 6) + F.lit(0.0)).alias("recall"),
            (F.round(F.try_divide(F.lit(2.0) * prec * rec, prec + rec), 6)
             + F.lit(0.0)).alias("f1"),
            (F.round((F.col("tp") + F.col("tn"))
                     / (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")),
                     6) + F.lit(0.0)).alias("accuracy"))
    return _apply


def ks_statistic(label_col: str = "label", score_col: str = "score"):
    """Kolmogorov–Smirnov separation of a scored binary frame:
    ``KS = max_s |F_pos(s) − F_neg(s)|`` over the distinct scores — the
    credit-scoring / model-monitoring companion to `auc_roc` (AUC ranks
    the whole curve; KS reports the single best separating threshold,
    returned as ``at_score``).

    Same distributed shape as `auc_roc`: distinct-score collapse first
    (one map-combined shuffle, result bounded by score cardinality), BOTH
    class CDFs as two-phase range prefix sums — never a single-partition
    window — and exact integers to the end:
    ``|cum_pos·N − cum_neg·P|`` is maximized as a bigint and divided by
    ``P·N`` exactly once. Ties on the max break toward the SMALLEST
    score. NULL labels/scores are excluded (no CDF evidence).

    Returns one row: (ks, at_score, n_pos, n_neg).

    Reference anchor: none (ML-evaluation extension; family of auc_roc /
    welch_ttest / psi_drift).
    """
    from akka_stream_contrib_spark.operators.global_order import (
        global_running_agg_total,
    )

    def _apply(df: DataFrame) -> DataFrame:
        df = df.filter(F.col(label_col).isNotNull()
                       & F.col(score_col).isNotNull())
        y = F.col(label_col).cast("long")
        per = (df.groupBy(F.col(score_col).alias("_score"))
               .agg(F.sum(y).alias("pos"),
                    (F.count(F.lit(1)) - F.sum(y)).alias("neg")))
        # BOTH class CDFs from one ranged pass (one range shuffle, one
        # checkpoint, one driver summary round-trip); the class TOTALS are
        # the same pass's complete folds, read from its K-row driver
        # summary — no second aggregate over the CDF frame, no broadcast
        # crossJoin of its 1-row result (NULL literals reproduce the empty
        # -input sums exactly)
        c, (t_pos, t_neg) = global_running_agg_total(
            per, ["_score"], ["pos", "neg"], ["_cp", "_cn"], fn="sum")
        n_pos = (F.lit(None).cast("long") if t_pos is None
                 else F.lit(int(t_pos)).cast("long"))
        n_neg = (F.lit(None).cast("long") if t_neg is None
                 else F.lit(int(t_neg)).cast("long"))
        # cum·total products as exact decimal: two ~1e11-row classes at
        # 100 TB would overflow an int64 product
        d = c.select(
            "_score", n_pos.alias("n_pos"), n_neg.alias("n_neg"),
            F.abs(F.col("_cp").cast("decimal(19,0)") * n_neg
                  - F.col("_cn").cast("decimal(19,0)") * n_pos)
            .alias("_num"))
        agg = d.agg(
            F.max("_num").alias("_m"),
            # ties on the max diff -> smallest score (negate inside the
            # max_by struct so the larger key means the smaller score)
            F.min_by("_score", F.struct(F.negate(F.col("_num")),
                                        F.col("_score"))).alias("at_score"),
            F.first("n_pos").alias("n_pos"), F.first("n_neg").alias("n_neg"))
        return agg.select(
            (F.round(F.try_divide(
                F.col("_m").cast("double"),
                F.col("n_pos").cast("double")
                * F.col("n_neg").cast("double")), 6) + F.lit(0.0))
            .alias("ks"),
            "at_score", "n_pos", "n_neg")

    return _apply


def chi2_tokens(label: Column, text_col: str = "text", top_k: int = 30,
                min_docs: int = 5):
    """χ² feature selection over document-level token PRESENCE against a
    binary label — the classical "which tokens identify this class"
    selector feeding `nb_train`/`logreg_train`/`hashed_features`:
    ``χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))`` from the per-token
    presence contingency table (a = class-1 docs containing the token,
    b = class-0 docs containing it, c/d = the complements).

    Exactness: every cell is an exact count (array_distinct collapses
    within-doc repeats before the one (token, label) shuffle), the
    numerator/denominator products are exact decimals, and the single χ²
    division runs on identical operands in any engine; the emitted top-k
    orders by (rounded χ² desc, token asc) — fully deterministic. Tokens
    present in fewer than ``min_docs`` documents are dropped (χ² is
    unstable on singletons).

    Scale shape: explode → ONE map-combined (token) aggregation carrying
    the label-conditional counts as conditional sums; the two label
    totals broadcast from the label-cardinality aggregate; TakeOrdered
    top-k — never a global vocabulary sort.

    Reference anchor: none (ML extension; the selection sibling of
    nb_train).
    """
    def _apply(df: DataFrame) -> DataFrame:
        lab = label.cast("int")
        # drop NULL-label documents BEFORE the tokenize+dedup+explode
        # fan-out (the most expensive stage) — a post-explode label filter
        # would pay it for every discarded row
        labeled = df.filter(lab.isNotNull())
        toks = (labeled.select(lab.alias("_y"),
                               F.explode(F.array_distinct(
                                   F.split(F.lower(F.col(text_col)), " ")))
                               .alias("token"))
                .filter(F.col("token").rlike("^[a-z]+$")))
        per = (toks.groupBy("token")
               .agg(F.sum("_y").cast("long").alias("a"),
                    F.sum(F.lit(1) - F.col("_y")).cast("long").alias("b")))
        tot = labeled.agg(
            F.sum(lab).cast("long").alias("n1"),
            F.sum(F.lit(1) - lab).cast("long").alias("n0"))
        j = (per.filter(F.col("a") + F.col("b") >= min_docs)
             .crossJoin(F.broadcast(tot))
             .select("token", "a", "b",
                     (F.col("n1") - F.col("a")).alias("c"),
                     (F.col("n0") - F.col("b")).alias("d"),
                     (F.col("n1") + F.col("n0")).alias("n")))
        dec = "decimal(19,0)"
        adbc = (F.col("a").cast(dec) * F.col("d")
                - F.col("b").cast(dec) * F.col("c"))
        # square in DOUBLE: an exact-decimal square would need precision 76
        # and Spark nulls it out past 38; the decimal→double conversion is
        # deterministic (nearest double of an exact integer) on any engine
        ad = adbc.cast("double")
        num = F.col("n").cast("double") * (ad * ad)
        den = ((F.col("a") + F.col("b")).cast(dec)
               * (F.col("c") + F.col("d"))).cast("double") \
            * ((F.col("a") + F.col("c")).cast(dec)
               * (F.col("b") + F.col("d"))).cast("double")
        out = (j
               # a zero marginal (token in EVERY class-1 or class-0 doc,
               # or an absent class: a+c = n1 = 0) makes χ² 0/0 — both
               # engines must skip it (Spark NULL-division vs DuckDB
               # semantics would otherwise diverge)
               .filter((F.col("c") + F.col("d") > 0)
                       & (F.col("b") + F.col("d") > 0)
                       & (F.col("a") + F.col("c") > 0))
               .select(
                   "token", "a", "b", "c", "d",
                   (F.round(F.try_divide(num, den), 6) + F.lit(0.0))
                   .alias("chi2")))
        return out.orderBy(F.desc("chi2"), "token").limit(top_k)

    return _apply


def kaplan_meier(duration_col: str = "duration", event_col: str = "event"):
    """Kaplan–Meier survival curve over (duration, event) subjects —
    right-censoring-aware retention/churn estimation (event = 1 means the
    terminal event was observed at ``duration``; 0 means the subject was
    censored there and is only known to have survived AT LEAST that long).
    Emits one row per distinct EVENT time: (duration, n_risk, n_events,
    survival) with ``S(t) = Π_{t'≤t} (1 − d/n)``.

    Distributed shape: subjects collapse to per-distinct-duration
    (events, censored) counts first (one map-combined shuffle; everything
    after is bounded by duration cardinality), the at-risk set comes from
    the total minus the EXCLUSIVE prefix of (d+c) under duration order,
    and the product runs in log space — both prefixes are the two-phase
    range form (`operators/global_order.py`), never a single-partition
    window. Per-term logs are rounded to 9 dp and summed as exact
    decimals, so the curve is engine-portable; ``d == n`` (everyone
    remaining dies) can only happen at the last emitted time and yields
    survival exactly 0 rather than ln(0).

    Reference anchor: none (analytics extension; family of
    cohort_retention / auc_roc).
    """
    from akka_stream_contrib_spark.operators.global_order import (
        global_running_agg_total, global_running_sum,
    )

    def _apply(df: DataFrame) -> DataFrame:
        ev = F.col(event_col).cast("long")
        per = (df.filter(F.col(duration_col).isNotNull() & ev.isNotNull())
               .groupBy(F.col(duration_col).alias("t"))
               .agg(F.sum(ev).alias("d"),
                    (F.count(F.lit(1)) - F.sum(ev)).alias("c")))
        per = per.withColumn("_leave", F.col("d") + F.col("c"))
        # the cohort total is the running sum's own complete fold (K-row
        # driver summary) — no second aggregate + broadcast crossJoin
        c1, (n_total,) = global_running_agg_total(
            per, ["t"], "_leave", "_cum_leave", fn="sum")
        lit_total = (F.lit(None).cast("long") if n_total is None
                     else F.lit(int(n_total)).cast("long"))
        c1 = c1.withColumn("n_risk",
                           lit_total
                           - (F.col("_cum_leave") - F.col("_leave")))
        ratio = F.col("d").cast("double") / F.col("n_risk").cast("double")
        term = F.when(
            F.col("d") < F.col("n_risk"),
            F.round(F.log(F.lit(1.0) - ratio), 9).cast("decimal(18,9)"))
        c2 = global_running_sum(c1.withColumn("_term", term),
                                ["t"], "_term", "_cs")
        return (c2.filter(F.col("d") > 0)
                .select(F.col("t").alias(duration_col),
                        "n_risk",
                        F.col("d").alias("n_events"),
                        F.when(F.col("d") == F.col("n_risk"), F.lit(0.0))
                        .otherwise(F.round(
                            F.exp(F.col("_cs").cast("double")), 6)
                            + F.lit(0.0))
                        .alias("survival")))

    return _apply


def welch_ttest(group_col: str, value_col: str, g1, g2):
    """Welch's unequal-variance two-sample t-test between two groups of a
    numeric column — the A/B-test / cohort-comparison primitive
    (`psi_drift` asks "did the distribution move"; this asks "do the two
    cohorts' MEANS differ, and by how many standard errors").

    Returns one row: n/mean/variance per group, ``t_stat``, and the
    Welch–Satterthwaite degrees of freedom ``df_welch`` (round 6 dp).

    Determinism: both groups' moment sums accumulate as exact
    cents-integers (sum as bigint, sum-of-squares as decimal so 1e10+ row
    partials cannot overflow) inside ONE conditional-sum pass over the
    scan — a single map-combined aggregate, no per-group shuffle, no
    second scan. The t/df combination runs once on exact operands cast to
    double with a fixed expression tree — engine-identical. Domain bound:
    |value| < ~9e6 (the `rolling_zscore` cents contract).

    Reference anchor: none (evaluation extension; family of
    classification_report / psi_drift / auc_roc).
    """
    def _apply(df: DataFrame) -> DataFrame:
        cents = (F.col(value_col).cast("decimal(12,2)") * 100).cast("bigint")
        # sums as exact decimal throughout: raw cents reach 9e8, so a
        # ~1e10-row cohort overflows a bigint SUM (and under Spark 4's
        # ANSI default that is a query-killing ARITHMETIC_OVERFLOW)
        dec19 = "decimal(19,0)"
        dec = "decimal(38,0)"

        def side(tag, g):
            m = (F.col(group_col) == F.lit(g)) & cents.isNotNull()
            return [
                F.sum(F.when(m, 1).otherwise(0)).cast("long")
                .alias(f"n{tag}"),
                F.sum(F.when(m, cents.cast(dec19))).alias(f"s{tag}"),
                F.sum(F.when(m, (cents * cents).cast(dec))).alias(f"q{tag}"),
            ]

        agg = df.agg(*side(1, g1), *side(2, g2))

        # every division sits behind an explicit CASE guard (conditionals
        # short-circuit, so ANSI mode cannot raise DIVIDE_BY_ZERO on a
        # missing group, a 1-row cohort, or two constant cohorts —
        # degenerate inputs yield NULL metrics like the sibling
        # auc_roc/ks_statistic, matching DuckDB's NULL division)
        def stats(tag):
            n = F.col(f"n{tag}").cast("double")
            s = F.col(f"s{tag}").cast("double")
            q = F.col(f"q{tag}").cast("double")
            mean = F.when(F.col(f"n{tag}") > 0, s / (F.lit(100.0) * n))
            # cents² → value units²: ÷ 10000 inside the exact bracket
            var = F.when(
                F.col(f"n{tag}") > 1,
                ((q - (s * s) / n) / (n - F.lit(1.0))) / F.lit(10000.0))
            return n, mean, var

        n1, m1, v1 = stats(1)
        n2, m2, v2 = stats(2)
        se2 = v1 / n1 + v2 / n2
        t = F.when(se2 > 0, (m1 - m2) / F.sqrt(se2))
        dfw_den = ((v1 / n1) * (v1 / n1) / (n1 - F.lit(1.0))
                   + (v2 / n2) * (v2 / n2) / (n2 - F.lit(1.0)))
        dfw = F.when(dfw_den > 0, (se2 * se2) / dfw_den)
        return agg.select(
            F.col("n1"), F.col("n2"),
            (F.round(m1, 6) + F.lit(0.0)).alias("mean1"),
            (F.round(m2, 6) + F.lit(0.0)).alias("mean2"),
            (F.round(v1, 6) + F.lit(0.0)).alias("var1"),
            (F.round(v2, 6) + F.lit(0.0)).alias("var2"),
            (F.round(t, 6) + F.lit(0.0)).alias("t_stat"),
            (F.round(dfw, 6) + F.lit(0.0)).alias("df_welch"))

    return _apply


def psi_drift(old, new, value_col: str = "value", n_buckets: int = 10,
              lo: float = 0.0, hi: float = 1000.0):
    """Population Stability Index between two samples of a numeric column —
    THE production drift monitor for features/scores: fixed equal-width
    buckets over [lo, hi) (fixed, not quantile, so the two sides and the
    oracle bucket identically), per-bucket shares, and
    ``PSI = Σ (p−q)·ln(p/q)`` with the conventional 1e-6 floor on empty
    buckets. PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.

    Scale shape: each side is one partial-aggregated bucket count (bucket
    cardinality rows), joined on the tiny bucket id — the monitor costs
    two scans regardless of corpus size. Returns per-bucket rows plus the
    PSI repeated (the driver-friendly long form).
    """
    def bucketize(df, share_name):
        # NULL measurements carry no distributional information and would
        # otherwise form a NULL bucket that the full-outer join can never
        # match across sides (SQL equality) — two disjoint PSI-floored rows
        # inflating the index. Exclude them from both sides' totals.
        df = df.filter(F.col(value_col).isNotNull())
        b = F.when(F.col(value_col) < lo, F.lit(-1)).otherwise(
            F.least(F.floor((F.col(value_col) - F.lit(lo))
                            / F.lit((hi - lo) / n_buckets)).cast("int"),
                    F.lit(n_buckets - 1)))
        from akka_stream_contrib_spark.util import pipeline_cache
        per = pipeline_cache(
            df.select(b.alias("bucket")).groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_c")))
        # two consumers (share + normalizer) — cache the ≤ n_buckets+1 rows
        # once (registered for release by the next pipeline's
        # drop_stale_caches; a bare .persist() leaked it for the session)
        tot = per.agg(F.sum("_c").alias("_t"))
        return (per.crossJoin(F.broadcast(tot))
                .select("bucket", (F.col("_c") / F.col("_t"))
                        .alias(share_name)))
    p = bucketize(old, "p")
    q = bucketize(new, "q")
    joined = (p.join(q, "bucket", "full_outer")
              .select("bucket",
                      F.coalesce("p", F.lit(0.0)).alias("p"),
                      F.coalesce("q", F.lit(0.0)).alias("q")))
    eps = 1e-6
    pe = F.greatest(F.col("p"), F.lit(eps))
    qe = F.greatest(F.col("q"), F.lit(eps))
    term = (pe - qe) * F.log(pe / qe)
    per_bucket = joined.withColumn(
        "psi_term", F.round(term, 9).cast("decimal(15,9)"))
    tot = per_bucket.agg(
        F.round(F.sum("psi_term").cast("double"), 6).alias("psi"))
    return (per_bucket.crossJoin(F.broadcast(tot))
            .select("bucket",
                    (F.round("p", 6) + F.lit(0.0)).alias("p"),
                    (F.round("q", 6) + F.lit(0.0)).alias("q"),
                    (F.col("psi_term").cast("double") + F.lit(0.0))
                    .alias("psi_term"),
                    (F.col("psi") + F.lit(0.0)).alias("psi")))


def psi_drift_split(df, is_old, value_col: str = "value",
                    n_buckets: int = 10, lo: float = 0.0,
                    hi: float = 1000.0):
    """:func:`psi_drift` for the common case where BOTH slices come from
    ONE source frame (r11, guide §2.3 — the ``js_divergence_split``
    device): instead of two filtered scans, two bucket-count aggregations
    and a full-outer bucket join, ONE conditional-count groupBy over the
    shared scan yields both sides' bucket counts, and the two normalizers
    come from one aggregate over the cached ≤ n_buckets+1-row count table.
    ``is_old`` is a boolean Column — rows where it is TRUE are the
    reference slice, FALSE the live slice, NULL neither (exactly the rows
    the two-frame form would place in old / new / neither).

    Value-identical to :func:`psi_drift` on the same slices: per-bucket
    shares divide the identical integer counts, so every double, every
    9-dp decimal term and the PSI agree bit-for-bit (a side with no
    usable rows yields the same all-0.0 shares the full-outer join's
    coalesce produced). Same output schema.
    """
    from akka_stream_contrib_spark.util import pipeline_cache

    df = df.filter(F.col(value_col).isNotNull())
    b = F.when(F.col(value_col) < lo, F.lit(-1)).otherwise(
        F.least(F.floor((F.col(value_col) - F.lit(lo))
                        / F.lit((hi - lo) / n_buckets)).cast("int"),
                F.lit(n_buckets - 1)))
    cond = is_old if isinstance(is_old, Column) else F.col(is_old)
    # a NULL side marker places the row in NEITHER slice; dropping it here
    # keeps the bucket row set identical to the two-frame form (such a row
    # would otherwise mint an empty (0, 0) bucket)
    df = df.filter(cond.isNotNull())
    per = pipeline_cache(
        df.select(b.alias("bucket"),
                  F.when(cond, F.lit(1)).alias("_o"),
                  F.when(~cond, F.lit(1)).alias("_n"))
        .groupBy("bucket")
        .agg(F.count("_o").alias("_cp"), F.count("_n").alias("_cq")))
    tot = per.agg(F.sum("_cp").alias("_tp"), F.sum("_cq").alias("_tq"))
    joined = (per.crossJoin(F.broadcast(tot))
              .select("bucket",
                      # an empty side in the two-frame form contributed NO
                      # rows to the full-outer join, so every share
                      # coalesced to 0.0 — mirror that instead of 0/0
                      F.when(F.col("_tp") == 0, F.lit(0.0))
                      .otherwise(F.col("_cp") / F.col("_tp")).alias("p"),
                      F.when(F.col("_tq") == 0, F.lit(0.0))
                      .otherwise(F.col("_cq") / F.col("_tq")).alias("q")))
    eps = 1e-6
    pe = F.greatest(F.col("p"), F.lit(eps))
    qe = F.greatest(F.col("q"), F.lit(eps))
    term = (pe - qe) * F.log(pe / qe)
    per_bucket = joined.withColumn(
        "psi_term", F.round(term, 9).cast("decimal(15,9)"))
    tot2 = per_bucket.agg(
        F.round(F.sum("psi_term").cast("double"), 6).alias("psi"))
    return (per_bucket.crossJoin(F.broadcast(tot2))
            .select("bucket",
                    (F.round("p", 6) + F.lit(0.0)).alias("p"),
                    (F.round("q", 6) + F.lit(0.0)).alias("q"),
                    (F.col("psi_term").cast("double") + F.lit(0.0))
                    .alias("psi_term"),
                    (F.col("psi") + F.lit(0.0)).alias("psi")))


def auc_roc(label_col: str = "label", score_col: str = "score"):
    """Exact ROC AUC (Mann–Whitney U form, average-rank tie handling) of a
    scored binary frame — the threshold-free companion to
    `classification_report` for evaluating the quality filter.

    Distributed shape: the raw rows collapse FIRST to per-distinct-score
    (pos, neg) counts (one map-combined shuffle — the result frame is
    bounded by score cardinality, not corpus size), then the cumulative
    negatives below each score come from the two-phase range prefix sum
    (`operators/global_order.py` — never a single-partition window), and
    the final reduction is one single-row aggregate. All arithmetic stays
    in exact integers until the last division:
    ``AUC = Σ_s pos_s·(2·cumneg_<s + neg_s) / (2·P·N)``
    (the ``neg_s/2`` tie credit kept integral by doubling both sides), so
    the result is bit-identical on any engine or partitioning.

    Returns a 1-row frame (auc, n_pos, n_neg); auc is NULL when either
    class is absent (try_divide).

    Reference anchor: none (ML-evaluation extension; same family as
    classification_report / calibration_report).
    """
    from akka_stream_contrib_spark.operators.global_order import (
        global_running_sum,
    )

    def _apply(df: DataFrame) -> DataFrame:
        # a NULL score cannot be ranked (and engines order NULLs
        # differently); a NULL label is not a class — both carry no AUC
        # evidence and are excluded up front
        df = df.filter(F.col(label_col).isNotNull()
                       & F.col(score_col).isNotNull())
        y = F.col(label_col).cast("long")
        per = (df.groupBy(F.col(score_col).alias("_score"))
               .agg(F.sum(y).alias("pos"),
                    (F.count(F.lit(1)) - F.sum(y)).alias("neg")))
        c = global_running_sum(per, ["_score"], "neg", "_cn")
        cumneg = F.col("_cn") - F.col("neg")
        # pos·(2·cumneg+neg) approaches 2·P·N — decimal keeps two ~3e9-row
        # classes from overflowing the int64 sum (the ks_statistic guard)
        agg = c.agg(
            F.sum(F.col("pos").cast("decimal(19,0)")
                  * (F.lit(2) * cumneg + F.col("neg")))
            .alias("_num2"),
            F.sum("pos").alias("n_pos"), F.sum("neg").alias("n_neg"))
        return agg.select(
            (F.round(F.try_divide(
                F.col("_num2").cast("double"),
                F.lit(2.0) * F.col("n_pos").cast("double")
                * F.col("n_neg").cast("double")), 6) + F.lit(0.0))
            .alias("auc"),
            "n_pos", "n_neg")

    return _apply


def nb_train(docs: DataFrame, text_col: str = "text",
             label_col: str = "lang", vocab_size: int = 200,
             ) -> tuple[DataFrame, DataFrame]:
    """Multinomial Naive Bayes over whitespace tokens — the classical
    closed-form text classifier (language ID, source routing, spam
    filtering) trained entirely in aggregations: no iterations, no driver
    loop, no UDF. Returns ``(matrix, priors)``:

    - ``matrix``: one row per (token, label) over the top-``vocab_size``
      corpus tokens (freq desc, token asc — deterministic) × every label,
      COMPLETE (unseen pairs get the Laplace floor), with
      ``logp = ln((count + 1) / (label_total + V))`` rounded to 9 dp and
      stored as exact decimal so downstream sums are order-independent;
    - ``priors``: one row per label with the 9-dp decimal log prior.

    Scale shape: one (token, label) count shuffle over the exploded corpus
    (map-combined — output bounded by vocab × labels after the broadcast
    vocab semi-join), TakeOrdered for the vocabulary (never a global
    vocabulary sort), and label-cardinality aggregates; the emitted model
    is V·L rows — always broadcastable to the scorer.

    Reference anchor: none (ML extension; the aggregation-only sibling of
    `logreg_train`).
    """
    from akka_stream_contrib_spark.util import pipeline_cache

    toks = (docs.select(F.col(label_col).alias("label"),
                        F.explode(F.split(F.lower(F.col(text_col)), " "))
                        .alias("token"))
            .filter(F.col("token").rlike("^[a-z]+$")))
    # counts is the vocabulary × labels reduction of the corpus — the ONE
    # expensive pass. Three consumers (vocab ranking, cv, and through cv
    # the matrix) would each replay the explode+count without the cache.
    counts = pipeline_cache(toks.groupBy("token", "label")
                            .agg(F.count(F.lit(1)).alias("cnt")))
    vocab = pipeline_cache(
        counts.groupBy("token").agg(F.sum("cnt").alias("tot"))
        .orderBy(F.desc("tot"), "token").limit(vocab_size)
        .select("token"))
    cv = pipeline_cache(counts.join(F.broadcast(vocab), "token"))
    tot_l = cv.groupBy("label").agg(F.sum("cnt").alias("label_total"))
    labels = pipeline_cache(
        docs.groupBy(F.col(label_col).alias("label")).agg(
            F.count(F.lit(1)).alias("n_docs")))
    # the corpus size is the sum of the (cached, label-cardinality) label
    # counts — never a second full corpus scan
    n_all = labels.agg(F.sum("n_docs").alias("n_all"))
    v_size = vocab.agg(F.count(F.lit(1)).alias("v"))
    # the finished matrix is V·L rows — cache it so the scorer's broadcast
    # and any reuse do not replay the model-building joins
    matrix = pipeline_cache(
        vocab.crossJoin(F.broadcast(labels.select("label")))
        .join(F.broadcast(cv), ["token", "label"], "left")
        .join(F.broadcast(tot_l), "label", "left")
        .crossJoin(F.broadcast(v_size))
        .select(
            "token", "label",
            F.round(F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1))
                .cast("double")
                / (F.coalesce(F.col("label_total"), F.lit(0))
                   + F.col("v")).cast("double")), 9)
            .cast("decimal(18,9)").alias("logp")))
    priors = (labels.crossJoin(F.broadcast(n_all))
              .select("label",
                      F.round(F.log(F.col("n_docs").cast("double")
                                    / F.col("n_all").cast("double")), 9)
                      .cast("decimal(18,9)").alias("logprior")))
    return matrix, priors


def nb_predict(docs: DataFrame, matrix: DataFrame, priors: DataFrame,
               id_col: str = "doc_id", text_col: str = "text",
               out: str = "predicted") -> DataFrame:
    """Score documents with an `nb_train` model: per-document label
    posteriors ``Σ logp(token|label) + logprior`` summed as exact decimals
    (order-independent, engine-portable) over the document's in-vocabulary
    tokens, argmax broken by label ascending — fully deterministic.
    Documents with NO in-vocabulary token are absent from the result (no
    evidence to score). Returns (id, predicted, logpost, n_tok).

    Scale shape: the V·L model broadcasts; the corpus pays one
    (id, label) aggregation shuffle, and the per-id argmax is a plain
    MIN aggregate over a (−posterior, label) struct — lexicographic
    struct order IS the (posterior desc, label asc) argmax order, the
    posterior is exact decimal so its negation is exact, and within one
    id every label row is unique so the trailing n_tok field never
    participates in a comparison. A hash aggregate partially combines
    map-side (≤1 row per id per map partition crosses the wire) where
    the former row_number window shipped every (id, label) row and paid
    a per-partition sort.
    """
    toks = (docs.select(F.col(id_col),
                        F.explode(F.split(F.lower(F.col(text_col)), " "))
                        .alias("token"))
            .filter(F.col("token").rlike("^[a-z]+$")))
    scored = (toks.join(F.broadcast(matrix), "token")
              .groupBy(id_col, "label")
              .agg(F.sum("logp").alias("_s"),
                   F.count(F.lit(1)).alias("n_tok")))
    tot = (scored.join(F.broadcast(priors), "label")
           .withColumn("_post", F.col("_s") + F.col("logprior")))
    best = tot.groupBy(id_col).agg(
        F.min(F.struct((-F.col("_post")).alias("np"),
                       F.col("label").alias("lb"),
                       F.col("n_tok").alias("nt"))).alias("_b"))
    return best.select(
        F.col(id_col), F.col("_b.lb").alias(out),
        ((-F.col("_b.np")).cast("double") + F.lit(0.0)).alias("logpost"),
        F.col("_b.nt").alias("n_tok"))


def target_encoding(cat_col: str, label_col: str, id_col: str,
                    n_folds: int = 5, smoothing: int = 20,
                    out: str = "te") -> "Callable[[DataFrame], DataFrame]":
    """Leakage-safe (out-of-fold) target encoding — the standard high-
    cardinality categorical featurizer for tabular models: each row's
    category is replaced by the smoothed mean label of the OTHER folds,
    ``te = (sum_cat − sum_cat_fold + m·prior) / (cnt_cat − cnt_cat_fold
    + m)`` with the global mean as the prior. In-fold rows are excluded so
    the feature never sees its own label (target leakage), and the fold is
    the deterministic md5 id hash (same device as ``kfold_split``), so the
    encoding is reproducible on any engine/partitioning.

    Scale shape: two partial-aggregated groupBys — (category) and
    (category, fold), both collapsing map-side — plus one broadcast of the
    (cat, fold) table back onto the rows and a 1-row global-prior
    broadcast. Label sums accumulate as EXACT decimal, so the division is
    the only float step (then rounded to 6 dp): engine-stable.

    Reference anchor: none (LLM/tabular-pipeline extension; same family
    as hashed_features / kfold_split).
    """
    from typing import Callable  # noqa: F401  (signature forward ref)

    from akka_stream_contrib_spark.functions.text import token_id

    def _apply(df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        from akka_stream_contrib_spark.util import pipeline_cache

        y = F.col(label_col).cast("decimal(18,4)")
        fold = F.pmod(token_id(F.col(id_col).cast("string")),
                      F.lit(n_folds)).cast("int")
        base = df.withColumn("_fold", fold)
        # ONE corpus aggregation: the (cat, fold) cells partition the rows,
        # so the per-category totals are their fold-sums (decimal sums are
        # exact — associativity holds bit-for-bit) and the global prior is
        # the grand total; the old separate per_cat groupBy and prior
        # aggregate each re-scanned the corpus (r11 scan census: 4 scans
        # of events, now 2 — this cells pass + the final row join).
        # Cached: bounded by |categories| x n_folds, never corpus size.
        per_cat_fold = pipeline_cache(
            base.groupBy(F.col(cat_col).alias("_c"),
                         F.col("_fold").alias("_f"))
            .agg(F.sum(y).alias("_sf"),
                 F.count(F.lit(1)).alias("_nf")))
        prior = per_cat_fold.agg(
            (F.sum("_sf").cast("double") / F.sum("_nf")).alias("_prior"))
        # per-category totals as a window over the tiny cell frame — the
        # NULL partition groups exactly like the old eqNullSafe join key
        # (NULL is a legitimate category; a NULL id yields a NULL fold)
        wc = Window.partitionBy("_c")
        enc = (per_cat_fold
               .select("_c", "_f",
                       F.sum("_sf").over(wc).alias("_s"),
                       F.sum("_nf").over(wc).alias("_n"),
                       "_sf", "_nf")
               .crossJoin(F.broadcast(prior)))
        m = F.lit(float(smoothing))
        te = ((F.col("_s") - F.col("_sf")).cast("double")
              + m * F.col("_prior")) / (F.col("_n") - F.col("_nf") + m)
        enc = enc.select("_c", "_f",
                         (F.round(te, 6) + F.lit(0.0)).alias(out))
        return (base.join(F.broadcast(enc),
                          base[cat_col].eqNullSafe(enc["_c"])
                          & base["_fold"].eqNullSafe(enc["_f"]))
                .drop("_c", "_f")
                .withColumnRenamed("_fold", "fold"))

    return _apply


def js_divergence(p_df: DataFrame, q_df: DataFrame, item_col: str,
                  ) -> DataFrame:
    """Jensen–Shannon divergence between the ``item_col`` distributions of
    two frames (one row per item occurrence) — the SYMMETRIC, always-finite
    companion to `psi_drift` for categorical drift: token distributions of
    two corpus snapshots, domain mixes of two crawls. ``JSD = ½Σ p·ln(p/m)
    + ½Σ q·ln(q/m)`` with ``m = (p+q)/2``; zero-count items contribute 0 on
    their absent side (lim x→0 x·ln x = 0), so no epsilon floor is needed —
    JSD ≤ ln 2 always.

    Determinism: counts are exact integers; each item's term is computed
    from its two counts and the two scan totals (one double expression),
    rounded to 9 dp and summed as decimal — order-independent, the
    psi_drift device. Returns one row
    (jsd, n_p, n_q, vocab_p, vocab_q, vocab_union).

    Scale shape: ONE map-combined groupBy of each side on the item key,
    full-outer joined on that key (both sides aggregate to vocabulary
    cardinality, not corpus size), 1-row totals broadcast. No windows, no
    driver loops.

    Reference anchor: none (drift-monitoring extension; family of
    psi_drift / embedding_drift).
    """
    p_cnt = (p_df.groupBy(F.col(item_col).alias("_item"))
             .agg(F.count(F.lit(1)).alias("_cp")))
    q_cnt = (q_df.groupBy(F.col(item_col).alias("_item"))
             .agg(F.count(F.lit(1)).alias("_cq")))
    j = (p_cnt.join(q_cnt, "_item", "full_outer")
         .select(F.coalesce("_cp", F.lit(0)).alias("_cp"),
                 F.coalesce("_cq", F.lit(0)).alias("_cq")))
    return _jsd_from_counts(j)


def js_divergence_split(df: DataFrame, side, item_col: str) -> DataFrame:
    """`js_divergence` when the two distributions are SLICES of one frame:
    ``side`` marks an occurrence as belonging to p (true) or q (false);
    NULL-side rows carry no distribution evidence and are excluded. ONE
    conditional-count groupBy replaces the two filtered scans + full-outer
    vocabulary join of the two-frame form — at corpus scale that halves
    the exploded-token shuffle, which dominates the query (the shape the
    DuckDB oracle always used). Identical output columns and values.
    """
    side = side if isinstance(side, Column) else F.col(side)
    j = (df.select(F.col(item_col).alias("_item"), side.alias("_s"))
         .groupBy("_item")
         .agg(F.sum(F.when(F.col("_s"), 1).otherwise(0)).alias("_cp"),
              F.sum(F.when(~F.col("_s"), 1).otherwise(0)).alias("_cq"))
         # an item seen only on NULL-side rows matches no side: it is not
         # part of either vocabulary (the two-frame form never sees it)
         .filter((F.col("_cp") > 0) | (F.col("_cq") > 0))
         .select("_cp", "_cq"))
    return _jsd_from_counts(j)


def _jsd_from_counts(j: DataFrame) -> DataFrame:
    """Shared JSD tail: per-item (count_p, count_q) -> one summary row
    (see js_divergence for the determinism argument). ``j`` feeds both
    the totals aggregate and the term stream — cached so the upstream
    corpus explode/collapse runs ONCE, not once per consumer (the frame
    itself is vocabulary-cardinality)."""
    from akka_stream_contrib_spark.util import pipeline_cache

    j = pipeline_cache(j)
    tot = j.agg(F.sum("_cp").alias("_tp"), F.sum("_cq").alias("_tq"),
                F.sum((F.col("_cp") > 0).cast("long")).alias("_vp"),
                F.sum((F.col("_cq") > 0).cast("long")).alias("_vq"),
                F.count(F.lit(1)).alias("_vu"))
    both = j.crossJoin(F.broadcast(tot))
    p = F.col("_cp").cast("double") / F.col("_tp").cast("double")
    q = F.col("_cq").cast("double") / F.col("_tq").cast("double")
    m = (p + q) / F.lit(2.0)
    term = (F.when(F.col("_cp") > 0, p * F.log(p / m))
            .otherwise(F.lit(0.0))
            + F.when(F.col("_cq") > 0, q * F.log(q / m))
            .otherwise(F.lit(0.0))) / F.lit(2.0)
    terms = both.select(
        F.round(term, 9).cast("decimal(15,9)").alias("_t"),
        "_tp", "_tq", "_vp", "_vq", "_vu")
    return terms.groupBy("_tp", "_tq", "_vp", "_vq", "_vu").agg(
        (F.round(F.sum("_t").cast("double"), 6) + F.lit(0.0)).alias("jsd")
    ).select(
        "jsd", F.col("_tp").alias("n_p"), F.col("_tq").alias("n_q"),
        F.col("_vp").alias("vocab_p"), F.col("_vq").alias("vocab_q"),
        F.col("_vu").alias("vocab_union"))


def conditional_entropy(df: DataFrame, cur_col: str, next_col: str,
                        ) -> DataFrame:
    """Information content of a transition table: entropy of the next state
    ``H(X)``, conditional entropy given the current state ``H(X|C)``, and
    their difference — the mutual information ``I(C;X)`` — in nats. The
    Markov-chain summary of `event_transitions`: how predictable is the
    next event, and how much does knowing the current one help?

    Determinism: all probabilities derive from exact integer counts of the
    (cur, next) pair table; each entropy term is one double expression
    rounded to 9 dp and summed as decimal (order-independent). NULL states
    on either side are excluded (no transition evidence). Returns one row
    (h_next, h_next_given_cur, mutual_info, n_transitions).

    Scale shape: ONE map-combined groupBy on the pair key; the pair table
    is bounded by |states|² — the marginals are windows over THAT tiny
    frame, never the raw data.

    Reference anchor: none (info-theoretic evaluation extension; family of
    token_entropy / pmi_collocations).
    """
    from pyspark.sql import Window

    pairs = (df.filter(F.col(cur_col).isNotNull()
                       & F.col(next_col).isNotNull())
             .groupBy(F.col(cur_col).alias("_c"),
                      F.col(next_col).alias("_x"))
             .agg(F.count(F.lit(1)).alias("_n")))
    wc = Window.partitionBy("_c")
    wx = Window.partitionBy("_x")
    wall = Window.partitionBy()
    en = pairs.select(
        "_c", "_n",
        F.sum("_n").over(wc).alias("_nc"),
        F.sum("_n").over(wx).alias("_nx"),
        F.sum("_n").over(wall).alias("_nt"),
        # first-pair-row marker per next-state: the H(X) marginal term
        # contributes exactly once per distinct _x (an exact-decimal
        # device — dividing the rounded term by its multiplicity would
        # reintroduce FP the oracle would have to replicate op-for-op)
        (F.row_number().over(wx.orderBy("_c")) == 1).alias("_first_x"))
    nt = F.col("_nt").cast("double")
    # H(X|C) term: −(n/N)·ln(n/n_c); H(X) term: −(n_x/N)·ln(n_x/N)
    hc_term = -(F.col("_n").cast("double") / nt) \
        * F.log(F.col("_n").cast("double") / F.col("_nc").cast("double"))
    hx_row = -(F.col("_nx").cast("double") / nt) \
        * F.log(F.col("_nx").cast("double") / nt)
    terms = en.select(
        F.round(hc_term, 9).cast("decimal(15,9)").alias("_hc"),
        F.when(F.col("_first_x"), F.round(hx_row, 9))
        .otherwise(F.lit(0.0)).cast("decimal(15,9)").alias("_hx"),
        "_nt")
    agg = terms.groupBy("_nt").agg(
        F.sum("_hc").alias("_shc"), F.sum("_hx").alias("_shx"))
    h_cond = F.round(F.col("_shc").cast("double"), 6)
    h_next = F.round(F.col("_shx").cast("double"), 6)
    return agg.select(
        (h_next + F.lit(0.0)).alias("h_next"),
        (h_cond + F.lit(0.0)).alias("h_next_given_cur"),
        (F.round(F.col("_shx").cast("double")
                 - F.col("_shc").cast("double"), 6) + F.lit(0.0))
        .alias("mutual_info"),
        F.col("_nt").alias("n_transitions"))


def bootstrap_ci(df: DataFrame, value_col: str, id_col: str,
                 n: int = 400, b: int = 200, trim: float = 0.025,
                 ) -> DataFrame:
    """Deterministic bootstrap confidence interval for the mean of an
    INTEGER metric over a fixed evaluation panel — the error bar an eval
    report should carry. The panel is the rows with ``id_col`` in
    ``[0, n)`` (dense ids required — validated loudly); resample ``r``
    draws item ``i`` as index ``((r·n + i + 1)·2654435761 mod 2^32) mod
    n`` — the Knuth multiplicative hash, portable integer arithmetic in
    both engines. The 2^32 wrap is what makes draws non-degenerate: a
    single-modulus LCG like ``(j·48271) mod n`` maps each consecutive
    n-index block to a PERMUTATION of the panel whenever the multiplier
    is coprime to n (measured: every resample mean identical), while the
    wrapping hash breaks the progression. CI bounds are the
    symmetric ``trim`` quantiles by rank: the ``⌊trim·b⌋``-th smallest and
    largest resample means (ties on mean break by resample id).

    Determinism: each resample mean is ONE double division of an exact
    integer sum; rank selection is over those exact doubles. Returns one
    row (n, b, mean_full, ci_lo, ci_hi).

    Scale shape: the panel (n rows) broadcasts into the ``b × n`` index
    grid (a `spark.range`, no data shuffle), one map-combined groupBy on
    the resample id (b groups), and the rank windows run over the b-row
    mean table. Costs are fixed by (n, b), independent of corpus size —
    the audit-panel discipline (pq_train's bounded-sample argument).

    Reference anchor: none (evaluation-statistics extension; family of
    welch_ttest / ks_statistic).
    """
    from pyspark.sql import Window

    if n <= 0 or b <= 0:
        raise ValueError(f"bootstrap_ci: need n > 0 and b > 0, got {n}, {b}")
    lo_pos = int(trim * b)
    if lo_pos < 1 or 2 * lo_pos >= b:
        raise ValueError(
            f"bootstrap_ci: trim={trim} with b={b} trims {lo_pos} from "
            "each side — need at least 1 and fewer than b/2")
    from akka_stream_contrib_spark.util import pipeline_cache

    spark = df.sparkSession
    # cache: the panel feeds three consumers (density validation, the
    # broadcast into the grid join, the full-mean aggregate) — without it
    # each one re-scans and re-filters the source
    panel = pipeline_cache(
        df.filter((F.col(id_col) >= 0) & (F.col(id_col) < n))
        .select(F.col(id_col).alias("_pid"),
                F.col(value_col).cast("long").alias("_v")))
    chk = panel.agg(F.count(F.lit(1)).alias("c"),
                    F.count_distinct("_pid").alias("d")).head()
    # count alone is not density: duplicates plus matching gaps would pass
    # and silently bias every resample mean — require n DISTINCT ids too
    if chk.c != n or chk.d != n:
        raise ValueError(
            f"bootstrap_ci: panel ids [0, {n}) must be dense — found "
            f"{chk.c} rows / {chk.d} distinct ids; pass a frame with "
            f"dense unique {id_col}")
    grid = spark.range(b * n).select(
        (F.col("id") / n).cast("long").alias("_r"),
        (((F.col("id") + 1) * 2654435761) % 4294967296 % n).alias("_draw"))
    drawn = grid.join(F.broadcast(panel), grid._draw == panel._pid)
    means = (drawn.groupBy("_r")
             .agg((F.sum("_v").cast("double") / F.lit(float(n)))
                  .alias("_mean")))
    asc = Window.orderBy(F.col("_mean").asc(), F.col("_r").asc())
    desc = Window.orderBy(F.col("_mean").desc(), F.col("_r").desc())
    ranked = means.select(
        "_mean",
        F.row_number().over(asc).alias("_ra"),
        F.row_number().over(desc).alias("_rd"))
    picks = ranked.agg(
        F.max(F.when(F.col("_ra") == lo_pos, F.col("_mean"))).alias("_lo"),
        F.max(F.when(F.col("_rd") == lo_pos, F.col("_mean"))).alias("_hi"))
    full = panel.agg(
        (F.sum("_v").cast("double") / F.lit(float(n))).alias("_mf"))
    return (picks.crossJoin(F.broadcast(full))
            .select(F.lit(n).alias("n"), F.lit(b).alias("b"),
                    (F.round("_mf", 6) + F.lit(0.0)).alias("mean_full"),
                    (F.round("_lo", 6) + F.lit(0.0)).alias("ci_lo"),
                    (F.round("_hi", 6) + F.lit(0.0)).alias("ci_hi")))


def rfm_features(df: DataFrame, user_col: str = "user_id",
                 ts_col: str = "ts", value_col: str = "value",
                 ) -> DataFrame:
    """Recency/Frequency/Monetary feature table from an event log — the
    classic behavioral featurization (churn models, LTV, segmentation),
    and the per-entity aggregation shape every feature store materializes.
    Recency is measured against the CORPUS max timestamp (not wall clock)
    so the result is a pure function of the data.

    One map-combined groupBy on the user key + a broadcast 1-row anchor;
    exact arithmetic throughout: recency = whole days between the user's
    last event and the anchor (integer), frequency = count, monetary =
    decimal cents sum rendered as double (the `_money` convention). NULL
    values contribute 0 to monetary and are not counted as purchases.
    Returns (user, recency_days, frequency, monetary, n_valued).

    Reference anchor: none (feature-engineering extension; family of
    target_encoding / sessionize).
    """
    anchor = df.agg(F.max(ts_col).alias("_maxts"))
    per = df.groupBy(F.col(user_col).alias("user")).agg(
        F.max(ts_col).alias("_last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("_mon"),
        F.count(value_col).alias("n_valued"))
    return (per.crossJoin(F.broadcast(anchor))
            .select(
                "user",
                F.datediff(F.to_date("_maxts"), F.to_date("_last"))
                .alias("recency_days"),
                "frequency",
                (F.coalesce(F.col("_mon"), F.lit(0).cast("decimal(18,2)"))
                 .cast("double") + F.lit(0.0)).alias("monetary"),
                "n_valued"))


def cohen_kappa(rater_a, rater_b):
    """Cohen's kappa — chance-corrected agreement between two categorical
    labelings of the same rows (two annotation passes, a model vs an
    editorial rubric, two heuristic quality raters). The standard
    inter-annotator-agreement statistic for auditing label quality before
    a training run.

    ``kappa = (p_o − p_e) / (1 − p_e)`` with ``p_o`` the observed
    agreement rate and ``p_e = Σ_c rowmarg_c · colmarg_c / N²`` the
    agreement expected from the marginals alone.

    Distributed shape: the corpus collapses FIRST to the (a, b) confusion
    cells (one map-combined shuffle, bounded by the class-pair
    cardinality, not corpus size); the marginals, their product sum, and
    the observed-agreement sum are all aggregates of that tiny cell frame.
    Counts stay exact integers — the marginal product is held as
    decimal(38,0) (two ~1e10-row marginals overflow an int64 product) —
    and p_o/p_e/kappa are three final double divisions with an explicit
    guard (single-class raters make p_e = 1; kappa is NULL then, like the
    degenerate-input convention of welch_ttest / auc_roc).

    Rows where either rater is NULL carry no agreement evidence and are
    excluded up front (engines disagree on NULL equality semantics).

    Returns one row: (n, n_agree, p_o, p_e, kappa).

    Reference anchor: none (evaluation extension; family of
    classification_report / welch_ttest).
    """
    def _apply(df: DataFrame) -> DataFrame:
        a = rater_a if isinstance(rater_a, Column) else F.col(rater_a)
        b = rater_b if isinstance(rater_b, Column) else F.col(rater_b)
        from akka_stream_contrib_spark.util import pipeline_cache

        # the cell frame feeds THREE corpus-collapsing consumers (row
        # marginals, column marginals, observed-agreement sums) whose
        # aliased re-aggregations defeat exchange reuse — uncached, each
        # re-ran the full corpus scan + cell aggregation (r11 scan
        # census: 3 scans). Cache it: bounded by the class-pair
        # cardinality, never corpus size.
        cells = pipeline_cache(
            df.select(a.alias("_a"), b.alias("_b"))
            .filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
            .groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("_n")))
        rowm = cells.groupBy(F.col("_a").alias("_c")).agg(
            F.sum("_n").alias("_ra"))
        colm = cells.groupBy(F.col("_b").alias("_c")).agg(
            F.sum("_n").alias("_rb"))
        # product-of-marginals sum: tiny frames (≤ class count) — the join
        # is broadcast; decimal keeps the product exact at any scale
        pe_num = (rowm.join(colm, "_c")
                  .agg(F.sum(F.col("_ra").cast("decimal(19,0)")
                             * F.col("_rb")).alias("_pe_num")))
        obs = cells.agg(
            F.sum("_n").alias("n"),
            F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_n"))
                  .otherwise(F.lit(0))).alias("n_agree"))
        j = obs.crossJoin(F.broadcast(pe_num))
        nd = F.col("n").cast("double")
        po = F.try_divide(F.col("n_agree").cast("double"), nd)
        pe = F.try_divide(F.col("_pe_num").cast("double"), nd * nd)
        kappa = F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe))
        return j.select(
            "n", "n_agree",
            (F.round(po, 6) + F.lit(0.0)).alias("p_o"),
            (F.round(pe, 6) + F.lit(0.0)).alias("p_e"),
            (F.round(kappa, 6) + F.lit(0.0)).alias("kappa"))

    return _apply


def wilson_rank(success, group_col: str, z: float = 1.96,
                min_trials: int = 1, top_k: int = 20):
    """Rank groups by the Wilson score lower bound of their success rate —
    the uncertainty-aware leaderboard (Agresti–Coull family; the classic
    "how not to sort by average rating"). A group with 2/2 successes ranks
    BELOW one with 80/100: the bound shrinks toward 0 for small samples.

    ``lb = (p̂ + z²/2n − z·√((p̂(1−p̂) + z²/4n)/n)) / (1 + z²/n)``

    Distributed shape: ONE map-combined conditional-count groupBy on the
    group key; the bound is a fixed double expression tree over the two
    exact integer counts, so every engine computes the identical double
    (z and z² are injected as the same python-literal doubles on both
    sides — see the oracle mirror). Ranking (lb desc, group asc) and the
    top-k cut are deterministic. sqrt is IEEE-correctly-rounded on both
    engines; the argument is a composition of exact counts and those
    shared literals.

    Returns top_k rows: (group, n_success, n_trials, rate, wilson_lb).

    Reference anchor: none (evaluation/curation extension; family of
    bootstrap_ci — that one bounds a MEAN by resampling, this bounds a
    RATE in closed form).
    """
    zf = float(z)
    z2 = zf * zf

    def _apply(df: DataFrame) -> DataFrame:
        s = success if isinstance(success, Column) else F.col(success)
        per = (df.groupBy(F.col(group_col).alias("group"))
               .agg(F.sum(s.cast("int")).alias("n_success"),
                    F.count(s.cast("int")).alias("n_trials"))
               .filter(F.col("n_trials") >= int(min_trials)))
        n = F.col("n_trials").cast("double")
        p = F.col("n_success").cast("double") / n
        zl, z2l = F.lit(zf), F.lit(z2)
        lb = ((p + z2l / (2.0 * n)
               - zl * F.sqrt((p * (1.0 - p) + z2l / (4.0 * n)) / n))
              / (1.0 + z2l / n))
        return (per.select(
            "group", "n_success", "n_trials",
            (F.round(p, 6) + F.lit(0.0)).alias("rate"),
            (F.round(lb, 6) + F.lit(0.0)).alias("wilson_lb"))
            .orderBy(F.desc("wilson_lb"), "group")
            .limit(int(top_k)))

    return _apply


def f1_threshold_sweep(label_col: str = "label", score_col: str = "score"):
    """Optimal decision threshold by exhaustive F1 sweep — the deployment
    companion to `auc_roc`: AUC says whether the score ranks well, this
    says WHERE to cut it. Evaluates "predict positive iff score ≥ t" at
    every distinct score value t and returns the best row.

    Distributed shape (the auc_roc skeleton): rows collapse FIRST to
    per-distinct-score (pos, neg) counts (one map-combined shuffle,
    bounded by score cardinality); the ≥-threshold cumulative tp/fp at
    each candidate come from the two-phase range prefix sum run ONCE over
    both columns (`global_running_agg_total` — never a single-partition
    window) subtracted from the class totals, which are the same pass's
    complete folds baked in as literals; the argmax is a TakeOrdered over
    the bounded candidate frame. tp/fp/fn stay exact
    integers; precision/recall/F1 are final double divisions — both
    engines order identical doubles, and the (f1 desc, threshold asc)
    tie-break is total.

    Returns one row: (threshold, tp, fp, fn, precision, recall, f1);
    NULL metrics when a class is absent (try_divide convention).

    Reference anchor: none (evaluation extension; family of
    auc_roc / ks_statistic / classification_report).
    """
    from akka_stream_contrib_spark.operators.global_order import (
        global_running_agg_total,
    )

    def _apply(df: DataFrame) -> DataFrame:
        df = df.filter(F.col(label_col).isNotNull()
                       & F.col(score_col).isNotNull())
        y = F.col(label_col).cast("long")
        per = (df.groupBy(F.col(score_col).alias("threshold"))
               .agg(F.sum(y).alias("pos"),
                    (F.count(F.lit(1)) - F.sum(y)).alias("neg")))
        # class totals = the same ranged pass's complete folds (K-row
        # driver summary) — no second aggregate + broadcast crossJoin
        c, (t_pos, t_neg) = global_running_agg_total(
            per, ["threshold"], ["pos", "neg"], ["_cp", "_cn"], fn="sum")
        tp_all = (F.lit(None).cast("long") if t_pos is None
                  else F.lit(int(t_pos)).cast("long"))
        tn_all = (F.lit(None).cast("long") if t_neg is None
                  else F.lit(int(t_neg)).cast("long"))
        j = c
        # ≥ t cumulative = total − inclusive-ascending prefix + own bucket
        tp = tp_all - F.col("_cp") + F.col("pos")
        fp = tn_all - F.col("_cn") + F.col("neg")
        fn = tp_all - tp
        prec = F.try_divide(tp.cast("double"), (tp + fp).cast("double"))
        rec = F.try_divide(tp.cast("double"), tp_all.cast("double"))
        f1 = F.try_divide((2 * tp).cast("double"),
                          (tp + fp + tp_all).cast("double"))
        return (j.select(
            "threshold", tp.alias("tp"), fp.alias("fp"), fn.alias("fn"),
            (F.round(prec, 6) + F.lit(0.0)).alias("precision"),
            (F.round(rec, 6) + F.lit(0.0)).alias("recall"),
            (F.round(f1, 6) + F.lit(0.0)).alias("f1"))
            .orderBy(F.desc_nulls_last("f1"), "threshold")
            .limit(1))

    return _apply


def rolling_active_users(df: DataFrame, user_col: str = "user_id",
                         ts_col: str = "ts", wau_days: int = 7,
                         mau_days: int = 28) -> DataFrame:
    """Rolling engagement: per activity day, the distinct users active that
    day (DAU), in the trailing ``wau_days`` window (WAU), in the trailing
    ``mau_days`` window (MAU), and the DAU/MAU stickiness ratio — the
    product-analytics engagement staple `cohort_retention` does not cover
    (cohorts follow a signup class; this follows the whole population).

    Distributed shape: the event log collapses FIRST to the distinct
    (user, day) frame — the only corpus-sized reduction; ONE explode by
    the bounded offset span (≤ max(wau, mau) rows per user-day, a
    constant) then collapses to the EARLIEST offset per (user, target
    day): min_off = 0 ⟺ active that day (DAU), ≤ wau_days−1 ⟺ active in
    the trailing WAU window, ≤ mau_days−1 ⟺ in the MAU window — all
    three distinct-user counts fall out of one aggregation (the r10
    rewrite; the old shape exploded per window and re-distincted each:
    6 exchanges → 3, and the explode stream is scanned once, not twice).
    Days beyond the corpus's last day are cut with a broadcast 1-row max.
    Counts are exact integers; stickiness is ONE rounded double division.

    Emits one row per day with ≥1 active user in its trailing MAU window,
    i.e. every day from the first activity day to the last when activity
    is continuous. Returns (day, dau, wau, mau, stickiness).

    Reference anchor: none (product-analytics extension; family of
    cohort_retention / funnel / rfm_features).
    """
    from akka_stream_contrib_spark.util import pipeline_cache

    ud = pipeline_cache(
        df.select(F.col(user_col).alias("_u"),
                  F.to_date(ts_col).alias("_d"))
        .filter(F.col("_u").isNotNull() & F.col("_d").isNotNull())
        .distinct())
    maxd = ud.agg(F.max("_d").alias("_maxd"))
    # one explode covering the widest window; min-offset collapse gives
    # every window's membership test as a cheap per-row predicate
    span_days = max(int(wau_days), int(mau_days))
    span = (ud.select(
        "_u", F.explode(F.sequence(
            F.lit(0), F.lit(span_days - 1))).alias("_off"), "_d")
        .select("_u", F.date_add("_d", F.col("_off")).alias("day"), "_off")
        .crossJoin(F.broadcast(maxd))
        .filter(F.col("day") <= F.col("_maxd"))
        .groupBy("_u", "day").agg(F.min("_off").alias("_mo")))
    # row set = days with >= 1 user in the trailing MAU window (the frame
    # the old mau-anchored left joins emitted); dau/wau are conditional
    # counts over the same rows
    out = (span.groupBy("day").agg(
        F.count(F.when(F.col("_mo") == 0, 1)).alias("dau"),
        F.count(F.when(F.col("_mo") <= int(wau_days) - 1, 1)).alias("wau"),
        F.count(F.when(F.col("_mo") <= int(mau_days) - 1, 1)).alias("mau"))
        .filter(F.col("mau") >= 1))
    return (out.withColumn(
        "stickiness",
        F.round(F.try_divide(F.col("dau").cast("double"),
                             F.col("mau").cast("double")), 6) + F.lit(0.0))
        .orderBy("day"))


def split_conformal(score, calib, keep_num: int = 9, keep_den: int = 10,
                    id_col: str = "doc_id"):
    """Split conformal prediction interval (Papadopoulos et al. 2002;
    Vovk's inductive conformal): the calibration slice's nonconformity
    scores yield the quantile ``q_hat`` = the ⌈(n+1)·keep_num/keep_den⌉-th
    smallest calibration score, and any prediction within ``q_hat`` of the
    truth is "covered" — a DISTRIBUTION-FREE interval with guaranteed
    ≥ keep_num/keep_den marginal coverage. The uncertainty-quantification
    companion to `calibration_report` (that audits probability calibration;
    this constructs finite-sample-valid intervals).

    Determinism: the target coverage is a RATIONAL (keep_num/keep_den), so
    the rank index k is exact integer arithmetic (⌈x/d⌉ = (x + d − 1) div
    d — no float ceil); the k-th smallest comes from the two-phase global
    rank (`operators/global_order.py`, never a single-partition sort) with
    the (score, id) total order; coverage counts are exact integers. If k
    exceeds the calibration size (tiny n, high coverage), k clamps to n —
    the honest q_hat would be +∞; callers with such n need more data.

    Returns one row: (n_calib, k, q_hat, n_test, n_covered, coverage).

    Reference anchor: none (evaluation extension; family of
    bootstrap_ci / wilson_rank — all finite-sample uncertainty).
    """
    from akka_stream_contrib_spark.operators.global_order import (
        global_rank_total)

    def _apply(df: DataFrame) -> DataFrame:
        from akka_stream_contrib_spark.util import pipeline_cache

        s = score if isinstance(score, Column) else F.col(score)
        c = calib if isinstance(calib, Column) else F.col(calib)
        # scored feeds the calibration rank AND the test aggregate — one
        # cached scan instead of two; n_calib comes from the rank pass's
        # own K-row driver summary (global_rank_total), so no count
        # aggregate over the ranked frame and no broadcast crossJoin
        scored = pipeline_cache(
            df.select(s.alias("_s"), c.alias("_c"),
                      F.col(id_col).alias("_id")))
        # NULL scores are excluded from the calibration rank: Spark's
        # global_rank sorts NULLS FIRST while DuckDB's ORDER BY sorts them
        # last, so a NULL entering the rank would shift the k-th element
        # differently per engine (and a NULL quantile is meaningless).
        cal = (scored.filter(F.col("_c") & F.col("_s").isNotNull())
               .select("_s", "_id"))
        ranked, n = global_rank_total(cal, ["_s", "_id"], out="_r")
        # exact integer arithmetic in Python — identical to the old SQL
        # least/greatest/div chain on non-negative ints; n == 0 gives
        # k == 0, which matches no rank and yields the same empty qrow
        n = int(n)
        k_val = min(max(((n + 1) * int(keep_num) + int(keep_den) - 1)
                        // int(keep_den), 1), n)
        qrow = (ranked
                .filter(F.col("_r") == F.lit(k_val).cast("long"))
                .select(F.lit(n).cast("long").alias("n_calib"),
                        F.lit(k_val).cast("long").alias("k"),
                        F.col("_s").alias("q_hat")))
        test = (scored.filter(~F.col("_c"))
                .crossJoin(F.broadcast(qrow))
                .agg(F.first("n_calib").alias("n_calib"),
                     F.first("k").alias("k"),
                     F.first("q_hat").alias("q_hat"),
                     F.count(F.lit(1)).alias("n_test"),
                     F.sum(F.when(F.col("_s") <= F.col("q_hat"), 1)
                           .otherwise(0)).alias("n_covered")))
        return test.select(
            "n_calib", "k",
            (F.round("q_hat", 6) + F.lit(0.0)).alias("q_hat"),
            "n_test", "n_covered",
            (F.round(F.try_divide(F.col("n_covered").cast("double"),
                                  F.col("n_test").cast("double")), 6)
             + F.lit(0.0)).alias("coverage"))

    return _apply


def embedding_dim_drift(ref: DataFrame, cur: DataFrame, top_k: int = 10,
                        vec_col: str = "embedding") -> DataFrame:
    """Per-DIMENSION embedding drift between a reference slice and a
    current slice — the monitor that catches a silently retrained or
    mis-versioned encoder upstream of a 100 TB pipeline: a changed model
    shifts individual dimensions long before corpus-level metrics move.
    For each dimension d: standardized mean difference
    ``smd = (mean_cur − mean_ref) / sqrt((var_ref + var_cur) / 2)``
    (Cohen's d with pooled variance); |smd| ≳ 0.1 on many dims = drifted
    encoder. Returns the ``top_k`` dims by |smd| (tie-break dim asc) with
    both means and the smd, all rounded to 6 dp.

    Scale shape: posexplode is map-side; each side reduces to ONE
    partial-aggregated groupBy over the dim key (cardinality = embedding
    width, e.g. 64 rows) — the monitor costs two scans and two
    width-sized shuffles regardless of corpus size; the dim-key join is
    broadcast-sized by construction. Engine-stable: per-element values
    round to 9 dp and accumulate as exact decimals (order-independent
    sums), doubles only in the final closed-form moments.
    """
    def moments(df: DataFrame, tag: str) -> DataFrame:
        ex = df.select(F.posexplode(F.col(vec_col).cast("array<double>"))
                       .alias("dim", "_v"))
        v9 = F.round(F.col("_v"), 9).cast("decimal(28,9)")
        v2 = F.round(F.col("_v") * F.col("_v"), 9).cast("decimal(28,9)")
        return (ex.groupBy("dim")
                .agg(F.count(F.lit(1)).alias(f"n_{tag}"),
                     F.sum(v9).alias(f"sx_{tag}"),
                     F.sum(v2).alias(f"sx2_{tag}")))

    r, c = moments(ref, "ref"), moments(cur, "cur")
    j = r.join(c, "dim")
    def mean(tag):
        return F.col(f"sx_{tag}").cast("double") / F.col(f"n_{tag}")
    def var(tag):
        m = mean(tag)
        return F.col(f"sx2_{tag}").cast("double") / F.col(f"n_{tag}") - m * m
    vsum = var("ref") + var("cur")
    pooled = F.sqrt(vsum / F.lit(2.0))
    # a dimension constant in both slices (padding dims) has pooled = 0:
    # 0/0 would be NaN, and Spark orders NaN ABOVE every real value, so a
    # dead dim would permanently occupy rank 1 — emit NULL instead (the
    # streaming twin's pooled > 0 guard; NULLs sort last)
    smd = F.when(vsum > 0,
                 F.round((mean("cur") - mean("ref")) / pooled, 6)
                 + F.lit(0.0))
    return (j.select(
        F.col("dim").cast("int").alias("dim"),
        (F.round(mean("ref"), 6) + F.lit(0.0)).alias("mean_ref"),
        (F.round(mean("cur"), 6) + F.lit(0.0)).alias("mean_cur"),
        smd.alias("smd"))
        .orderBy(F.abs(F.col("smd")).desc_nulls_last(), "dim")
        .limit(top_k))

#: row budget for collecting the per-pair sufficient statistic of a
#: Bradley-Terry fit. |pairs| <= |models|^2 / 2 — bounded by the experiment
#: design (an arena of 2000 models is < 2M pairs), never by data volume.
BT_PAIR_BUDGET_ROWS = 2_000_000


def bradley_terry_ratings(games: DataFrame, iterations: int = 3,
                          smoothing: float = 0.5,
                          a_col: str = "model_a", b_col: str = "model_b",
                          wins_a_col: str = "wins_a",
                          wins_b_col: str = "wins_b",
                          max_pairs: int = BT_PAIR_BUDGET_ROWS) -> DataFrame:
    """Bradley-Terry skill ratings from pairwise win counts — the model
    behind LLM arena leaderboards (Chatbot-Arena-style elo is an online
    approximation of exactly this likelihood): P(i beats j) =
    p_i / (p_i + p_j), fit by the Zermelo/Hunter-2004 MM iteration
    p_i' = W_i / sum_j n_ij / (p_i + p_j), each step renormalized to mean
    rating 1. Sequential Elo is order-dependent (a fold over the game
    stream — undistributable and irreproducible under reordering); the MM
    fixed point is batch, deterministic, and the estimator the arena
    reports actually use.

    ``smoothing`` pseudo-wins are added to EACH side of every observed
    pairing (the ratings analogue of add-half Laplace): a model with zero
    recorded wins otherwise collapses to rating 0 and stays there. Only
    observed pairs are smoothed — the pair table stays sparse.

    Scale shape — fifth member of the bounded-driver-loop family (k-means /
    PageRank / BPE-learn / logreg_train): the corpus-sized game log
    collapses to the canonical per-pair table in ONE partial-aggregated
    groupBy on the unordered (lo, hi) key — the only shuffle that ever sees
    data-volume-sized input. That table IS the model's sufficient
    statistic, and its cardinality is <= |models|^2 / 2 — bounded by the
    experiment design, not the corpus — so the MM solve runs on the driver
    over the collected summary (an explicit ``max_pairs`` budget guards the
    collect, the `_bounded_index_pdf` discipline; a lazily-unrolled
    formulation instead references the ratings relation twice per step and
    the analyzer cost grows ~4^iterations — measured as a planning hang at
    iterations=3 before this shape). The fitted ratings return as a literal
    DataFrame; the 6-dp round happens ENGINE-side so the DuckDB oracle's
    rounding semantics match.

    Emits (model, rating, wins, games) — rating rounded to 6 (the
    pagerank/hits oracle convention), wins/games the RAW (unsmoothed)
    per-model totals.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")

    from akka_stream_contrib_spark.util import (pipeline_cache,
                                                release_pipeline_cache)

    a, b, wa, wb = a_col, b_col, wins_a_col, wins_b_col
    lo, hi = F.least(F.col(a), F.col(b)), F.greatest(F.col(a), F.col(b))
    a_is_lo = F.col(a) <= F.col(b)
    # pipeline_cache, not a bare .cache() (r11 cache hygiene): the budget
    # probe and the collect are its two consumers; registration means a
    # session that aborts between them still releases the cache on the
    # next pipeline's drop_stale_caches
    pairs = pipeline_cache(
        games.filter(F.col(a) != F.col(b))
        .groupBy(lo.alias("lo"), hi.alias("hi"))
        .agg(F.sum(F.when(a_is_lo, F.col(wa)).otherwise(F.col(wb))
                   .cast("double")).alias("rw_lo"),
             F.sum(F.when(a_is_lo, F.col(wb)).otherwise(F.col(wa))
                   .cast("double")).alias("rw_hi")))
    try:
        if pairs.limit(max_pairs + 1).count() > max_pairs:
            raise ValueError(
                f"pair table exceeds max_pairs={max_pairs}: a Bradley-Terry "
                f"fit over this many distinct model pairings is not a "
                f"bounded-summary problem; raise max_pairs deliberately or "
                f"shrink the model set")
        rows = [(r.lo, r.hi, float(r.rw_lo), float(r.rw_hi))
                for r in pairs.collect()]
    finally:
        # registry-backed release (r11 cache hygiene): the eager unpersist
        # stays, and drop_stale_caches covers any path that skips it
        release_pipeline_cache(pairs)

    spark = games.sparkSession
    out_schema = "model string, rating double, wins double, games double"
    if not rows:
        return spark.createDataFrame([], out_schema)

    # driver-side MM solve over the bounded summary; all folds iterate in
    # sorted order so float association is deterministic run-to-run
    rows.sort()
    s = float(smoothing)
    wins: dict[str, float] = {}
    gms: dict[str, float] = {}
    w_sm: dict[str, float] = {}
    for plo, phi, rlo, rhi in rows:
        g = rlo + rhi
        for m, w in ((plo, rlo), (phi, rhi)):
            wins[m] = wins.get(m, 0.0) + w
            gms[m] = gms.get(m, 0.0) + g
            w_sm[m] = w_sm.get(m, 0.0) + w + s
    models = sorted(wins)
    p = {m: 1.0 for m in models}
    for _ in range(iterations):
        den = {m: 0.0 for m in models}
        for plo, phi, rlo, rhi in rows:
            c = (rlo + rhi + 2.0 * s) / (p[plo] + p[phi])
            den[plo] += c
            den[phi] += c
        # den[m] can only be 0 at smoothing=0 when every pairing of m has
        # zero recorded wins on both sides (no information either way) —
        # the MM update is 0/0 there; keep the current estimate instead of
        # crashing (with smoothing > 0 every observed pair contributes)
        p = {m: (w_sm[m] / den[m] if den[m] > 0 else p[m])
             for m in models}
        mean = sum(p[m] for m in models) / len(models)
        p = {m: p[m] / mean for m in models}

    out = spark.createDataFrame(
        [(m, p[m], wins[m], gms[m]) for m in models], out_schema)
    return out.select("model",
                      (F.round("rating", 6) + F.lit(0.0)).alias("rating"),
                      "wins", "games")


def fleiss_kappa(ratings: DataFrame, item_col: str = "item_id",
                 category_col: str = "category") -> DataFrame:
    """Fleiss' kappa (Fleiss 1971) — chance-corrected agreement among MANY
    raters, the labeling-QA statistic for LLM-as-judge and crowd
    annotation fleets (Cohen's kappa — `cohen_kappa` — only handles two
    fixed raters; Fleiss treats each item's raters as exchangeable, which
    is exactly the shape of an N-judge ensemble). Uses the standard
    varying-raters generalization: items with n_i >= 2 ratings contribute
    P_i = (sum_c n_ic^2 - n_i) / (n_i (n_i - 1)); chance agreement P_e =
    sum_c p_c^2 from the pooled category marginals; kappa =
    (P_bar - P_e) / (1 - P_e). Items with a single rating carry no
    agreement evidence and are counted but excluded.

    Scale shape: the ONE corpus-sized shuffle is the (item, category)
    count, CACHED because both the per-item collapse and the category
    marginals reduce from it; every later exchange is over item- or
    category-cardinality rows shrinking to single-row stats. No windows,
    no joins except the final 1-row x 1-row broadcast combine.

    Returns a single-row DataFrame (n_items, n_rated_items, n_ratings,
    p_bar, p_e, kappa), ratios rounded to 6. kappa is NULL when P_e = 1
    (all ratings one category — agreement is undefined, not perfect).
    """
    from akka_stream_contrib_spark.util import pipeline_cache

    # ic feeds BOTH the per-item and the marginal reductions: cache the
    # (item, category) aggregate (items x categories rows — far below the
    # input) so the one corpus-sized shuffle runs once, not twice.
    # pipeline_cache, not a bare .cache() (r11 cache hygiene): a bare
    # cache was never dropped — a slow storage leak over a long session
    ic = pipeline_cache(
        ratings.groupBy(F.col(item_col).alias("_i"),
                        F.col(category_col).alias("_c"))
        .agg(F.count(F.lit(1)).alias("_n")))
    per_item = (ic.groupBy("_i")
                .agg(F.sum("_n").alias("_ni"),
                     F.sum(F.col("_n") * F.col("_n")).alias("_sq")))
    item_stats = per_item.select(
        F.count(F.lit(1)).alias("n_items"),
        F.sum((F.col("_ni") >= 2).cast("bigint")).alias("n_rated_items"),
        F.sum("_ni").alias("n_ratings"),
        F.sum(F.when(F.col("_ni") >= 2,
                     (F.col("_sq") - F.col("_ni")).cast("double")
                     / (F.col("_ni") * (F.col("_ni") - 1))))
        .alias("_p_sum"))
    marg = (ic.groupBy("_c").agg(F.sum("_n").alias("_nc"))
            .select(F.sum(F.col("_nc") * F.col("_nc")).alias("_sq_c"),
                    F.sum("_nc").alias("_tot")))
    j = item_stats.crossJoin(F.broadcast(marg))
    p_bar = F.col("_p_sum") / F.col("n_rated_items")
    p_e = F.col("_sq_c").cast("double") / (F.col("_tot") * F.col("_tot"))
    kappa = F.when(p_e < 1.0, (p_bar - p_e) / (F.lit(1.0) - p_e))
    return j.select(
        "n_items", "n_rated_items", "n_ratings",
        (F.round(p_bar, 6) + F.lit(0.0)).alias("p_bar"),
        (F.round(p_e, 6) + F.lit(0.0)).alias("p_e"),
        (F.round(kappa, 6) + F.lit(0.0)).alias("kappa"))


def pass_at_k(samples: DataFrame, ks=(1, 2, 4),
              task_col: str = "task_id",
              correct_col: str = "correct") -> DataFrame:
    """pass@k — the unbiased estimator from the HumanEval paper (Chen et
    al. 2021, "Evaluating Large Language Models Trained on Code"): per
    task with n generated samples of which c pass, pass@k =
    1 - C(n-c, k) / C(n, k), the probability that at least one of k
    randomly drawn samples passes; the benchmark metric is its mean over
    tasks. The naive "fraction of tasks with a pass in the first k" is
    biased; this closed form is not.

    The binomial ratio C(n-c, k) / C(n, k) is evaluated as the exact
    telescoping product prod_{i=0..k-1} (n-c-i) / (n-i) inside an array
    fold over sequence(0, k-1) — no gamma functions, identical
    left-to-right float association in Spark and DuckDB (oracle parity by
    construction). pass@k = 1 when c > n - k (every k-subset hits a
    pass), 0 when c = 0. Tasks with fewer than k samples are excluded at
    that k (the estimator needs n >= k).

    Scale shape: ONE corpus-sized groupBy (per-task n and c), then a
    constant |ks|x explode over task-cardinality rows into the per-k
    mean. No windows, no joins.

    Emits (k, n_tasks, mean_pass_at_k) — one row per k, rounded to 6.
    """
    kss = sorted(set(int(k) for k in ks))
    if not kss or kss[0] < 1:
        raise ValueError(f"ks must be positive ints, got {ks!r}")

    per_task = (samples.groupBy(F.col(task_col).alias("_t"))
                .agg(F.count(F.lit(1)).alias("_n"),
                     F.sum(F.col(correct_col).cast("bigint")).alias("_c")))
    ex = (per_task.select(
        "_n", "_c",
        F.explode(F.array(*[F.lit(k) for k in kss])).alias("k"))
        .filter(F.col("_n") >= F.col("k")))
    n, c, k = F.col("_n"), F.col("_c"), F.col("k")
    # the per-step ratio is computed FIRST and then multiplied into the
    # accumulator — the same association the DuckDB oracle's list_reduce
    # over precomputed ratios uses, so parity is bitwise, not rounded
    ratio = F.aggregate(
        F.sequence(F.lit(0), k - 1), F.lit(1.0),
        lambda acc, i: acc * ((n - c - i).cast("double")
                              / (n - i).cast("double")))
    p = F.when(c == 0, F.lit(0.0)) \
         .when(c > n - k, F.lit(1.0)) \
         .otherwise(F.lit(1.0) - ratio)
    return (ex.select("k", p.alias("_p"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n_tasks"),
                 (F.round(F.avg("_p"), 6) + F.lit(0.0))
                 .alias("mean_pass_at_k"))
            .orderBy("k"))


def spearman_corr(x_col: str, y_col: str, group_col: str | None = None
                  ) -> "Callable[[DataFrame], DataFrame]":
    """Spearman rank correlation with the standard tie correction
    (average ranks), per slice — the leaderboard-stability / metric-
    agreement statistic: "do these two scorers ORDER the items the same
    way?" is a rank question Pearson (`user_correlation`'s shape) gets
    wrong under monotone-but-nonlinear score relationships, judge scale
    drift, or outliers. rho = Pearson correlation of the average-rank
    transforms: avg_rank = rank() + (n_ties - 1)/2, the fractional-rank
    convention every stats package uses for ties.

    Scale shape (r11, guide §2 skew): the slice key is LOW-cardinality
    (languages, model names), so the former per-slice rank windows sorted
    the whole CORPUS in ≤|slices| reducer tasks — the hot-key straggler
    shape at 100 TB. The fractional rank is a function of the DISTINCT
    (slice, value) only: avg_rank = cnt_before + (ties+1)/2 ==
    rank + (ties−1)/2 exactly (integers < 2^52 in double). So each score
    ranks via a map-combined (slice, value) COUNT aggregate — a uniform
    composite key, so the corpus collapses in parallel — and the rank
    window rides the DISTINCT-value table; the corpus-sized row stream
    equi-joins the two rank tables back (broadcast whenever the distinct
    tables are small — always at bounded score domains, like the modular
    residues the declared query ranks). The collapse factor is the tie
    multiplicity: an adversarial all-distinct double score degenerates
    back to a |slices|-task sort of the distinct table — the fully
    sort-free form (global_order range machinery per slice) was measured
    and rejected: +2 driver summary collects, jobs 4 → 21 and +0.8 s at
    sf0.1 for a hazard the declared workloads don't hit. Rows with a
    NULL in either score are dropped (a rank needs a value). NULL rho
    when a slice has < 2 rows or either score is constant (zero rank
    variance — undefined, not zero).

    Emits (group, n, rho) with rho rounded to 6.
    """
    if x_col == y_col:
        raise ValueError("x_col and y_col must differ")
    from pyspark.sql import Window

    def _apply(df: DataFrame) -> DataFrame:
        from akka_stream_contrib_spark.util import (drop_stale_caches,
                                                    pipeline_cache)
        drop_stale_caches()
        grp = (F.col(group_col) if group_col
               else F.lit("all")).alias("group")
        # three consumers (two distinct-value aggregates + the join-back
        # row stream) — cache the projection so the source scans once
        base = pipeline_cache(
            df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
            .select(grp, F.col(x_col).alias("_x"), F.col(y_col).alias("_y")))

        def rank_table(c, gout, vout, rout):
            # avg rank per DISTINCT (group, value): the corpus collapses
            # in a map-combined count aggregate (uniform composite key),
            # and the per-group rank window rides the DISTINCT-value
            # table — its sort input is |distinct scores|, never the
            # corpus rows the old per-slice window shipped to one reducer
            d = base.groupBy("group", c).agg(F.count(F.lit(1)).alias("_cnt"))
            wloc = (Window.partitionBy("group").orderBy(c)
                    .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            cnt_before = F.sum("_cnt").over(wloc) - F.col("_cnt")
            ar = (cnt_before.cast("double")
                  + (F.col("_cnt") + 1).cast("double") / 2.0)
            return d.select(F.col("group").alias(gout),
                            F.col(c).alias(vout), ar.alias(rout))

        rx = rank_table("_x", "_gx", "_vx", "_rx")
        ry = rank_table("_y", "_gy", "_vy", "_ry")
        # every base row matches exactly one rank-table row (its own
        # (group, value) pair exists by construction): inner joins
        # preserve the row set; group compares null-safe
        ranked = (base
                  .join(rx, F.col("group").eqNullSafe(F.col("_gx"))
                        & (F.col("_x") == F.col("_vx")))
                  .join(ry, F.col("group").eqNullSafe(F.col("_gy"))
                        & (F.col("_y") == F.col("_vy"))))
        # explicit covar/stddev decomposition instead of corr(): under
        # ANSI mode corr() raises ArithmeticException on zero rank
        # variance (constant score or 1-row slice) — here that case is a
        # guarded NULL, and the oracle mirrors the same formula
        agg = (ranked.groupBy("group")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.covar_samp("_rx", "_ry").alias("_cov"),
                    F.stddev_samp("_rx").alias("_sx"),
                    F.stddev_samp("_ry").alias("_sy")))
        rho = F.when((F.col("_sx") > 0) & (F.col("_sy") > 0),
                     F.round(F.col("_cov")
                             / (F.col("_sx") * F.col("_sy")), 6)
                     + F.lit(0.0))
        return agg.select("group", "n", rho.alias("rho"))

    return _apply


def position_bias_probe(first_col: str = "first_won",
                        group_col: str | None = None, z_crit: float = 1.96
                        ) -> "Callable[[DataFrame], DataFrame]":
    """Position-bias probe for pairwise LLM-as-judge data: present the
    same pair in both orders and a fair judge picks the FIRST-shown
    response half the time; a systematic deviation is the classic
    position-bias artifact (documented for every judge model since
    MT-Bench) and silently corrupts every preference dataset built on
    that judge. Per slice: first-position win rate and the one-sample
    binomial z statistic against 0.5 (normal approximation,
    z = (p - 1/2) * 2 * sqrt(n)); |z| > ``z_crit`` flags the slice.

    Rows with a NULL verdict (judge abstained / parse failure) are
    dropped — an abstention carries no position information.

    Scale shape: ONE partial-aggregated groupBy on the slice key; the z
    arithmetic is post-aggregate scalar math. Output cardinality =
    slices.

    Emits (group, n, first_wins, first_win_rate, z, biased).
    """
    if z_crit <= 0:
        raise ValueError(f"z_crit must be > 0, got {z_crit}")

    def _apply(df: DataFrame) -> DataFrame:
        grp = (F.col(group_col) if group_col
               else F.lit("all")).alias("group")
        agg = (df.filter(F.col(first_col).isNotNull())
               .select(grp, F.col(first_col).cast("boolean").alias("_f"))
               .groupBy("group")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("_f").cast("bigint")).alias("first_wins")))
        p = F.col("first_wins") / F.col("n")
        z = (p - 0.5) * 2.0 * F.sqrt(F.col("n").cast("double"))
        return agg.select(
            "group", "n", "first_wins",
            (F.round(p, 6) + F.lit(0.0)).alias("first_win_rate"),
            (F.round(z, 6) + F.lit(0.0)).alias("z"),
            (F.abs(z) > F.lit(float(z_crit))).alias("biased"))

    return _apply


def win_rate_matrix(games: DataFrame, z: float = 1.96,
                    a_col: str = "model_a", b_col: str = "model_b",
                    wins_a_col: str = "wins_a", wins_b_col: str = "wins_b"
                    ) -> DataFrame:
    """Pairwise win-rate matrix with Wilson lower bounds — the raw
    leaderboard table `bradley_terry_ratings` fits its latent skills
    from, kept because the per-pair evidence matters on its own: a model
    can hold a high BT rating on thin pairings, and the Wilson lower
    bound (the `wilson_rank` estimator applied per PAIR) says which
    matchups actually have statistical weight.

    Scale shape: the same ONE canonical-pair groupBy as
    bradley_terry_ratings (unordered (lo, hi) key, partial-aggregated);
    the Wilson arithmetic is post-aggregate scalar math. Output
    cardinality <= |models|^2 / 2.

    Emits one row per observed unordered pair (model_lo, model_hi,
    games, wins_lo, win_rate_lo, wilson_lb_lo) — the hi-perspective
    numbers are the complement.
    """
    a, b, wa, wb = a_col, b_col, wins_a_col, wins_b_col
    lo, hi = F.least(F.col(a), F.col(b)), F.greatest(F.col(a), F.col(b))
    a_is_lo = F.col(a) <= F.col(b)
    agg = (games.filter(F.col(a) != F.col(b))
           .groupBy(lo.alias("model_lo"), hi.alias("model_hi"))
           .agg(F.sum(F.when(a_is_lo, F.col(wa)).otherwise(F.col(wb))
                      .cast("double")).alias("wins_lo"),
                F.sum(F.when(a_is_lo, F.col(wb)).otherwise(F.col(wa))
                      .cast("double")).alias("_wins_hi")))
    n = F.col("wins_lo") + F.col("_wins_hi")
    p = F.col("wins_lo") / n
    z2 = float(z) * float(z)
    wilson = ((p + F.lit(z2) / (2 * n)
               - F.lit(float(z)) * F.sqrt(p * (1 - p) / n
                                          + F.lit(z2) / (4 * n * n)))
              / (1 + F.lit(z2) / n))
    return (agg.filter(n > 0)
            .select("model_lo", "model_hi", n.alias("games"), "wins_lo",
                    (F.round(p, 6) + F.lit(0.0)).alias("win_rate_lo"),
                    (F.round(wilson, 6) + F.lit(0.0)).alias("wilson_lb_lo")))
