"""Byte-pair-encoding tokenizer training as distributed DataFrame plans.

Training-data-pipeline extension (no reference analogue — the reference's
per-element transforms stop at counting; tokenizer *training* is the natural
100 TB companion): learn BPE merge rules from a document corpus.

The scale-right formulation is the classic vocabulary collapse: adjacent-pair
statistics are computed over the DISTINCT-WORD table weighted by word
frequency, never over the raw corpus. The first aggregation reduces 100 TB of
text to a vocabulary (≪ corpus, bounded by Heaps' law), with map-side partial
aggregation doing almost all the work before the only corpus-sized shuffle;
every merge iteration after that runs on the vocabulary alone, so iteration
cost is independent of corpus size.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freq(df: DataFrame, text_col: str = "text",
              min_len: int = 2) -> DataFrame:
    """``(w, f)`` distinct-word frequencies — the corpus-sized step (one
    shuffle, partial-agg heavy). Words of fewer than ``min_len`` characters
    carry no adjacent pair and are dropped at the scan."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.length("w") >= min_len)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )


def bpe_pair_counts(text_col: str = "text", k: int = 20,
                    min_len: int = 2) -> Callable[[DataFrame], DataFrame]:
    """Top-``k`` adjacent character pairs by corpus frequency — the statistic
    behind the FIRST BPE merge, as one declarative plan.

    ``(a, b, pair_count)`` where pair_count sums the containing word's corpus
    frequency over every adjacent occurrence (overlaps counted per position:
    'aaa' contributes ('a','a') twice, matching naive pre-merge pair counting).
    Shuffles: corpus→vocab aggregation, then a vocab-sized pair aggregation —
    the explode fans out over distinct words only. Ties break lexically so
    top-k is deterministic on any engine.
    """

    def _apply(df: DataFrame) -> DataFrame:
        wf = word_freq(df, text_col, min_len)
        idx = F.sequence(F.lit(1), F.length("w") - F.lit(1))
        pair = F.explode(F.transform(
            idx,
            lambda i: F.struct(
                F.col("w").substr(i, F.lit(1)).alias("a"),
                F.col("w").substr(i + F.lit(1), F.lit(1)).alias("b")),
        )).alias("p")
        return (
            wf.select(pair, "f")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("f").cast("bigint").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "a", "b")
            .limit(k)
        )

    return _apply


def _merge_pair(syms, a: str, b: str):
    """Fold ``syms`` left-to-right replacing each non-overlapping adjacent
    (a, b) with the concatenation — standard BPE application semantics
    ('aaa' + merge (a,a) → [aa, a]). Pure array HOF: runs codegen-side on
    the vocabulary table, no UDF."""
    ab = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn_merges(df: DataFrame, n_merges: int = 10,
                     text_col: str = "text", min_len: int = 2) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules; returns ``(step, left, right,
    pair_count)`` — the merge table a tokenizer ships.

    Iterative (driver loop, like k-means/PageRank here): each round counts
    adjacent SYMBOL pairs over the weighted vocabulary, picks the argmax
    (ties lexical), and rewrites the vocabulary's symbol arrays with the
    array-fold merge — all vocabulary-sized work. The corpus is touched
    exactly once, in the initial word-frequency aggregation. localCheckpoint
    per round truncates the growing lineage (same pattern as
    functions/graph.py's label propagation).
    """
    spark = df.sparkSession
    vocab = (
        word_freq(df, text_col, min_len)
        # (?!^)(?=.): split at every between-character boundary; the (?=.)
        # guard stops the end-of-string position matching (F.split keeps
        # trailing empties, which would otherwise become a '' symbol)
        .select(F.split("w", "(?!^)(?=.)").alias("syms"), "f")
        .localCheckpoint()
    )
    merges = []
    for step in range(1, n_merges + 1):
        pair = F.explode(F.arrays_zip(
            F.slice("syms", 1, F.size("syms") - 1).alias("a"),
            F.slice("syms", 2, F.size("syms") - 1).alias("b"))).alias("p")
        top = (
            vocab.filter(F.size("syms") >= 2)
            .select(pair, "f")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("f").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .head()
        )
        if top is None:
            break
        merges.append((step, top["a"], top["b"], int(top["c"])))
        vocab = (
            vocab.select(_merge_pair(F.col("syms"), top["a"], top["b"])
                         .alias("syms"), "f")
            .localCheckpoint()
        )
    return spark.createDataFrame(
        merges, "step int, left string, right string, pair_count bigint")
