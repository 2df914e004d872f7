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
        # null-safe key join: groupBy emits a bounds row for the NULL
        # group, but a plain USING join would never match it back and the
        # NULL-key rows would silently vanish from the output
        bounds = bounds.select(
            *[F.col(k).alias(f"_bk_{i}") for i, k in enumerate(keylist)],
            "_lo", "_hi")
        cond = None
        for i, k in enumerate(keylist):
            c = F.col(k).eqNullSafe(F.col(f"_bk_{i}"))
            cond = c if cond is None else (cond & c)
        return (df.join(F.broadcast(bounds), cond)
                # explicit NULL propagation: Spark greatest/least SKIP NULL
                # arguments (unlike SQL), so a NULL measurement would be
                # silently rewritten to the low bound — a value the row
                # never had
                .withColumn(out, F.when(
                    F.col(value).isNotNull(),
                    F.least(F.greatest(F.col(value), F.col("_lo")),
                            F.col("_hi"))))
                .drop("_lo", "_hi",
                      *[f"_bk_{i}" for i in range(len(keylist))]))

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
        # guard the n_chars=0 divisions: an empty-string doc must score as
        # a defined low-quality row (keep=false), not NULL-propagate
        # through every feature and silently vanish from filter(keep)
        safe_chars = F.when(n_chars > 0, n_chars)
        digit_ratio = F.coalesce(
            (n_chars - F.length(F.regexp_replace(txt, "[0-9]", ""))) / safe_chars,
            F.lit(0.0))
        upper_ratio = F.coalesce(
            (n_chars - F.length(F.regexp_replace(txt, "[A-Z]", ""))) / safe_chars,
            F.lit(0.0))
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


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(min_words: int = 5, max_words: int = 100_000,
                 min_mean_len: float = 3.0, max_mean_len: float = 10.0,
                 min_alpha_frac: float = 0.80, min_stopword_hits: int = 2,
                 max_symbol_ratio: float = 0.10,
                 max_top_bigram_share: float = 0.18,
                 id_col: str = "doc_id", text_col: str = "text",
                 ) -> Callable[[DataFrame], DataFrame]:
    """Rule-based document filter in the style of the published Gopher /
    MassiveText quality rules (Rae et al. 2021 §A1.1) — the heuristic
    counterpart to the learned `quality_score`. Emits one row per document
    with every rule input plus the combined ``keep`` verdict, so a pipeline
    can audit WHY a document was dropped (the reference workflow for tuning
    thresholds on a new corpus):

    - word-count bounds, mean word length bounds (both map-side arithmetic);
    - fraction of words containing an alphabetic character;
    - presence of common-stopword evidence (≥ N of the 8 canonical words);
    - symbol-to-word ratio (``#`` and ``...`` as in the paper);
    - top-bigram share: the fraction of all bigrams taken by the single
      most frequent bigram (the n=2 repetition rule; the n-gram shapes for
      n>2 are identical and share the same plan).

    Scale shape: everything except the bigram share is a pure projected
    expression (zero shuffle, whole-stage codegen). The bigram share is the
    distributed word-count shape — explode to (doc, bigram), one
    partial-aggregated shuffle, per-doc max/sum — then one doc_id join back
    to the map-side features; both sides are already hashed on doc_id so AQE
    plans a single exchange each. Lines-based rules (bullet / ellipsis
    fractions) are omitted: the fixtures carry no newlines, and their plan
    shape is the same split+fraction arithmetic as the alpha-word rule.
    """

    def _apply(df: DataFrame) -> DataFrame:
        txt = F.col(text_col)
        words = F.split(F.lower(txt), " ")
        n_words = F.size(words)
        n_chars = F.length(txt)
        mean_len = (n_chars - (n_words - F.lit(1))).cast("double") / n_words
        alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
        frac_alpha = alpha_words.cast("double") / n_words
        stop_hits = F.size(F.array_intersect(
            F.array_distinct(words),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])))
        hash_count = n_chars - F.length(F.regexp_replace(txt, "#", ""))
        ellipsis_count = ((n_chars - F.length(F.replace(txt, F.lit("..."), F.lit(""))))
                          / F.lit(3)).cast("bigint")
        symbol_ratio = (hash_count + ellipsis_count).cast("double") / n_words
        base = df.select(
            F.col(id_col).alias("doc_id"),
            n_words.cast("bigint").alias("n_words"),
            (F.round(mean_len, 6) + F.lit(0.0)).alias("mean_word_len"),
            (F.round(frac_alpha, 6) + F.lit(0.0)).alias("frac_alpha_words"),
            stop_hits.cast("bigint").alias("stopword_hits"),
            (F.round(symbol_ratio, 6) + F.lit(0.0)).alias("symbol_ratio"),
        )
        bigram_expr = ("zip_with(slice(_w, 1, size(_w) - 1),"
                       " slice(_w, 2, size(_w) - 1),"
                       " (a, b) -> concat(a, ' ', b))")
        bg = (df.select(F.col(id_col).alias("doc_id"),
                        F.split(F.lower(txt), " ").alias("_w"))
              .filter(F.size("_w") >= 2)
              .select("doc_id", F.explode(F.expr(bigram_expr)).alias("bigram")))
        share = (bg.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("_c"))
                 .groupBy("doc_id")
                 .agg((F.round(F.max("_c") / F.sum("_c"), 6) + F.lit(0.0))
                      .alias("top_bigram_share")))
        out = base.join(share, "doc_id", "left")
        keep = ((F.col("n_words") >= min_words)
                & (F.col("n_words") <= max_words)
                & (F.col("mean_word_len") >= min_mean_len)
                & (F.col("mean_word_len") <= max_mean_len)
                & (F.col("frac_alpha_words") >= min_alpha_frac)
                & (F.col("stopword_hits") >= min_stopword_hits)
                & (F.col("symbol_ratio") < max_symbol_ratio)
                & (F.coalesce(F.col("top_bigram_share"), F.lit(0.0))
                   < max_top_bigram_share))
        return out.withColumn("keep", keep)

    return _apply


def skew_report(key_col: str, top_n: int = 10) -> Callable[[DataFrame], DataFrame]:
    """Shuffle-key skew diagnosis — run this BEFORE keying a 100 TB join or
    aggregation on a column: per-key cardinality stats plus the ``top_n``
    heaviest keys, each row carrying (key, cnt, share, rank, n_keys,
    total_rows, mean_per_key, skew_factor). ``skew_factor`` = heaviest key /
    mean — >10 means the key needs salting or AQE skew-join handling;
    `operators/salt.py` is the companion fix.

    One partial-aggregated groupBy on the key + a 1-row stats aggregate
    broadcast back over the top-N (TakeOrdered, no global sort) — the
    diagnosis never costs more than the aggregation it is protecting.
    """

    def _apply(df: DataFrame) -> DataFrame:
        per = df.groupBy(F.col(key_col).alias("key")).agg(
            F.count(F.lit(1)).alias("cnt"))
        stats = per.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("total_rows"),
            F.max("cnt").alias("_max"))
        from pyspark.sql import Window
        top = (per.orderBy(F.desc("cnt"), "key").limit(top_n)
               .crossJoin(F.broadcast(stats)))
        w = Window.orderBy(F.desc("cnt"), "key")
        return (top.withColumn("rank", F.row_number().over(w).cast("int"))
                .select(
                    "key", "cnt",
                    (F.round(F.col("cnt") / F.col("total_rows"), 6)
                     + F.lit(0.0)).alias("share"),
                    "rank", "n_keys", "total_rows",
                    (F.round(F.col("total_rows") / F.col("n_keys"), 6)
                     + F.lit(0.0)).alias("mean_per_key"),
                    (F.round(F.col("_max") * F.col("n_keys")
                             / F.col("total_rows"), 6)
                     + F.lit(0.0)).alias("skew_factor")))

    return _apply


def benford_expected() -> list[float]:
    """Benford's-law first-digit shares ``log10(1 + 1/d)``, d = 1..9,
    rounded to 9 dp. Python literals (like ``ewma_weights``) so Spark and
    any oracle inject the IDENTICAL doubles — no cross-engine log10."""
    import math
    return [round(math.log10(1.0 + 1.0 / d), 9) for d in range(1, 10)]


def benford_check(value_col: str = "value"
                  ) -> Callable[[DataFrame], DataFrame]:
    """First-digit Benford's-law audit of a positive money/measure column —
    the classic fabricated-data and unit-mix detector for ingested tables:
    naturally-occurring amounts follow ``P(d) = log10(1+1/d)``; generated,
    truncated, or re-scaled data does not. Emits one row per digit 1..9
    (observed count, observed share, expected share, χ² term) with the
    total χ² statistic repeated — psi_drift's long form. χ² > ~15.5
    (df=8, α=0.05) flags the column.

    Determinism: the leading digit comes from the FIRST CHARACTER of the
    cents-integer's string rendering (positive bigint → identical text on
    any engine; no pow/log10 boundary risk), counts aggregate exactly,
    the expected shares are 9-dp python literals, and the χ² combination
    runs once per digit on exact operands.

    Scale shape: one map-combined 9-group aggregation of the scan — a
    fixed-size result at any corpus size; the total is a broadcast of the
    9-row frame back onto itself (`psi_drift`'s device). Non-positive and
    NULL values are excluded (Benford is defined on positive magnitudes).
    """
    exp = benford_expected()

    def _apply(df: DataFrame) -> DataFrame:
        from akka_stream_contrib_spark.util import pipeline_cache

        cents = (F.col(value_col).cast("decimal(12,2)") * 100).cast("bigint")
        d = df.select(cents.alias("_c")).filter(F.col("_c") > 0).select(
            F.substring(F.col("_c").cast("string"), 1, 1).cast("int")
            .alias("digit"))
        # COMPLETE the digit spine: a digit with zero observations carries
        # the LARGEST possible χ² term ((0−e·N)²/(e·N) = e·N) and is
        # exactly the fabricated-data signature — groupBy alone would
        # silently drop it and understate χ² when it matters most
        spine = (df.sparkSession.range(1).select(
            F.explode(F.sequence(F.lit(1), F.lit(9))).alias("digit")))
        per = pipeline_cache(
            spine.join(d.groupBy("digit").agg(F.count(F.lit(1)).alias("_n")),
                       "digit", "left")
            .select("digit",
                    F.coalesce("_n", F.lit(0).cast("long")).alias("n")))
        tot = per.agg(F.sum("n").alias("_t"))
        emap = F.create_map(*[
            F.lit(x) for dd, e in enumerate(exp, start=1)
            for x in (dd, e)])
        scored = (per.crossJoin(F.broadcast(tot))
                  .withColumn("expected", emap[F.col("digit")])
                  .withColumn("_en", F.col("expected") * F.col("_t")
                              .cast("double")))
        chi_term = ((F.col("n").cast("double") - F.col("_en"))
                    * (F.col("n").cast("double") - F.col("_en"))
                    / F.col("_en"))
        # _en > 0 guard: a fully-empty input (no positive values) zeroes
        # every expected count — emit NULL terms on both engines instead
        # of Spark-NULL-vs-DuckDB-NaN divergence
        per_digit = scored.select(
            "digit", "n",
            (F.round(F.when(F.col("_t") > 0,
                            F.col("n").cast("double")
                            / F.col("_t").cast("double")), 6) + F.lit(0.0))
            .alias("share"),
            F.col("expected"),
            # decimal(28,9), not (15,9): a MISSING digit's term is e·N
            # (≈ 0.046·N for digit 9), which blows a 6-integer-digit
            # decimal past ~22M rows — under Spark 4's ANSI default the
            # cast would CRASH the audit exactly on the fabricated-data
            # input it exists to flag
            F.when(F.col("_en") > 0, F.round(chi_term, 9))
            .cast("decimal(28,9)").alias("chi_term"))
        total = per_digit.agg(
            F.round(F.sum("chi_term").cast("double"), 6).alias("chi2"))
        return (per_digit.crossJoin(F.broadcast(total))
                .select("digit", "n", "share", "expected",
                        (F.col("chi_term").cast("double") + F.lit(0.0))
                        .alias("chi_term"),
                        (F.col("chi2") + F.lit(0.0)).alias("chi2")))

    return _apply


def k_anonymity(quasi_cols: list[str], k: int = 5
                ) -> Callable[[DataFrame], DataFrame]:
    """k-anonymity audit over a set of quasi-identifier columns — the
    standard re-identification check before publishing or sharing a table:
    every combination of quasi-identifier values must describe at least
    ``k`` individuals; smaller groups are re-identifiable and must be
    generalized or suppressed. Emits one row per VIOLATING group (the
    quasi values plus its size) — empty result = the table is
    k-anonymous at this ``k``.

    Scale shape: ONE map-combined groupBy on the quasi columns and a
    size filter; output is bounded by the number of small groups, never
    the table. NULL is a legitimate quasi value (SQL GROUP BY semantics
    keep NULL groups intact on any engine). Companion to `pii_redact` /
    `pii_luhn` — those find the identifiers, this measures whether the
    remaining attributes still single people out.

    Reference anchor: none (governance extension of the quality family).
    """
    if k < 2:
        raise ValueError("k_anonymity: k must be >= 2 (k=1 is vacuous)")

    def _apply(df: DataFrame) -> DataFrame:
        return (df.groupBy(*quasi_cols)
                .agg(F.count(F.lit(1)).alias("group_size"))
                .filter(F.col("group_size") < k))

    return _apply


def gini_concentration(key_col: str) -> Callable[[DataFrame], DataFrame]:
    """Gini coefficient of row counts across ``key_col`` groups — the
    corpus-concentration audit (how unequal is the data across domains /
    sources / users?): 0 = perfectly even, →1 = one key dominates. The
    scalar companion to `corpus.domain_cap`'s actionable form.

    Exact integer arithmetic end-to-end: per-key counts, ascending ranks
    1..K over (count, key) — assigned by the two-phase range rank
    (`global_rank`), NEVER a single-partition window, because at 100 TB
    the key cardinality (domains, users) is itself unbounded — then
    ``G = (2·Σ rank·cnt − (K+1)·Σ cnt) / (K·Σ cnt)`` with the products as
    narrow-decimal × decimal (the precision-trim trap: decimal(10,0) ×
    decimal(19,0) stays exact) and ONE double division at the end. Ties
    on count order by key — Σ rank·cnt is tie-order-invariant, so the
    tie-break only pins the oracle. Returns one row
    (n_keys, total_rows, gini). NULL keys count as one group (an audit
    should see them).

    Reference anchor: none (corpus-audit extension; family of
    k_anonymity / skew_report).
    """
    from akka_stream_contrib_spark.operators.global_order import global_rank

    def _apply(df: DataFrame) -> DataFrame:
        per = (df.groupBy(F.col(key_col).alias("_k"))
               .agg(F.count(F.lit(1)).alias("_cnt")))
        ranked = global_rank(per, ["_cnt", "_k"], out="_r")
        agg = ranked.agg(
            F.count(F.lit(1)).alias("_nk"),
            F.sum("_cnt").alias("_tot"),
            F.sum(F.col("_r").cast("decimal(10,0)")
                  * F.col("_cnt").cast("decimal(19,0)")).alias("_s1"))
        num = (F.lit(2).cast("decimal(10,0)") * F.col("_s1")
               - (F.col("_nk") + F.lit(1)).cast("decimal(10,0)")
               * F.col("_tot").cast("decimal(19,0)"))
        den = (F.col("_nk").cast("decimal(10,0)")
               * F.col("_tot").cast("decimal(19,0)"))
        return agg.select(
            F.col("_nk").alias("n_keys"),
            F.col("_tot").alias("total_rows"),
            (F.round(F.try_divide(num.cast("double"), den.cast("double")),
                     6) + F.lit(0.0)).alias("gini"))

    return _apply


def filter_funnel(stages: "list[tuple[str, Column]]",
                  group_col: str | None = None
                  ) -> Callable[[DataFrame], DataFrame]:
    """Filter-funnel attribution: a curation pipeline is a chain of keep
    predicates, and when 40% of a corpus disappears the question is always
    WHICH stage killed it, per corpus slice. Each row is attributed to its
    FIRST failing stage (the order the chain would actually drop it);
    per (slice, stage) the report gives rows entering, rows killed there,
    rows surviving, the stage's conditional survival rate, and cumulative
    survival from the start — the numbers a dataset card's filtering
    section reports (Gopher/Dolma-style pipeline accounting).

    ``stages`` is an ordered list of (name, keep-Column) pairs evaluated
    against the input row; a NULL predicate counts as False (a row a
    predicate cannot judge does not pass it).

    Scale shape: every stage flag and the first-fail attribution are
    scan-side codegen (one CASE chain — stage count is a config constant);
    ONE partial-aggregated groupBy on the slice key produces the per-stage
    kill counts as |stages| conditional sums in a single wide row, and the
    per-stage report rows inline-explode from that row with
    plan-build-time prefix arithmetic (no window, no join, no second
    pass). Output cardinality = slices x stages.

    Emits (group, stage_idx, stage, n_in, n_killed, n_out,
    survival_rate, cumulative_survival).
    """
    if not stages:
        raise ValueError("stages must be a non-empty ordered list")
    names = [n for n, _ in stages]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate stage names: {names}")

    def _apply(df: DataFrame) -> DataFrame:
        # first failing stage index (1-based), NULL for survivors
        first_fail = F.lit(None).cast("int")
        for idx in range(len(stages) - 1, -1, -1):
            pred = F.coalesce(stages[idx][1].cast("boolean"), F.lit(False))
            first_fail = F.when(~pred, F.lit(idx + 1)).otherwise(first_fail)
        grp = (F.col(group_col) if group_col
               else F.lit("all")).alias("group")
        agg = (df.select(grp, first_fail.alias("_ff"))
               .groupBy("group")
               .agg(F.count(F.lit(1)).alias("_total"),
                    # when(...) not a bare cast: ff is NULL for survivors,
                    # and a group where EVERY row survives a stage would
                    # sum all-NULLs to NULL, poisoning the prefix
                    # subtraction downstream
                    *[F.sum(F.when(F.col("_ff") == i + 1, F.lit(1))
                            .otherwise(F.lit(0)).cast("bigint"))
                      .alias(f"_k{i + 1}") for i in range(len(stages))]))
        # prefix arithmetic unrolled at plan-build time: rows entering
        # stage i = total - kills before i
        entering = F.col("_total")
        rows = []
        for i, name in enumerate(names, start=1):
            killed = F.col(f"_k{i}")
            out = entering - killed
            rate = F.when(entering > 0,
                          F.round(out / entering, 6) + F.lit(0.0))
            cum = F.when(F.col("_total") > 0,
                         F.round(out / F.col("_total"), 6) + F.lit(0.0))
            rows.append(F.struct(
                F.lit(i).alias("stage_idx"), F.lit(name).alias("stage"),
                entering.cast("bigint").alias("n_in"),
                killed.cast("bigint").alias("n_killed"),
                out.cast("bigint").alias("n_out"),
                rate.alias("survival_rate"),
                cum.alias("cumulative_survival")))
            entering = out
        return (agg.select("group", F.explode(F.array(*rows)).alias("_s"))
                .select("group", "_s.stage_idx", "_s.stage", "_s.n_in",
                        "_s.n_killed", "_s.n_out", "_s.survival_rate",
                        "_s.cumulative_survival"))

    return _apply
