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
        # 1-char words have no adjacent pair, and sequence(1, 0) generates
        # a DESCENDING [1, 0] in Spark whose substr(0, 1) aliases the first
        # char into phantom (c, c)/(c, '') pairs — exclude them explicitly
        wf = word_freq(df, text_col, min_len).filter(F.length("w") >= 2)
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
    exactly once, in the initial word-frequency aggregation. Per-round
    lineage is truncated by a pipeline-scoped persist (r10, the graph.py
    discipline): each round's argmax ``head()`` is the driver action that
    materializes the round's vocab cache, so no eager checkpoint job runs
    and the merge-fold is never recomputed. The vocab chain has a single
    back-reference per round, so the analyzed tree stays linear in steps.
    """
    from akka_stream_contrib_spark.util import pipeline_cache

    spark = df.sparkSession
    vocab = pipeline_cache(
        word_freq(df, text_col, min_len)
        # (?!^)(?=.): split at every between-character boundary; the (?=.)
        # guard stops the end-of-string position matching (F.split keeps
        # trailing empties, which would otherwise become a '' symbol).
        # (?s) so the boundary before a line terminator also splits —
        # otherwise '\n' glues to its predecessor and the symbol table
        # diverges from the oracle's per-character split
        .select(F.split("w", "(?s)(?!^)(?=.)").alias("syms"), "f")
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
        vocab = pipeline_cache(
            vocab.select(_merge_pair(F.col("syms"), top["a"], top["b"])
                         .alias("syms"), "f")
        )
    return spark.createDataFrame(
        merges, "step int, left string, right string, pair_count bigint")


# Delimiter for the flat symbol-string encoding below: a control character
# that never appears in text tokens, so symbol boundaries are unambiguous.
_SEP = "\x1f"

#: Merge table learned (bpe_learn_merges, n=8) from the sf0.01 documents
#: fixture — the "shipped tokenizer" constant the gate query applies. Rank
#: order matters: ('m','er') fires only after ('e','r') has produced 'er'.
FIXTURE_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
    ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"),
)


def _encode_expr(word, merges) -> "F.Column":
    """Flat BPE application as a pure string expression: wrap EVERY symbol
    in its own leading AND trailing separator (adjacent symbols are joined
    by a DOUBLE separator), then for each merge (a, b) in rank order run a
    plain left-to-right ``replace`` of SEP+a+SEP+SEP+b+SEP with SEP+ab+SEP.

    Why this exact representation — two failure modes it is the unique
    plain-replace fix for (r6 review):
    1. Anchoring only the LEFT boundary of each symbol let the pattern
       match a longer symbol that merely STARTS with b, merging (a, b)
       into an adjacent 'bc'.
    2. Anchoring with a single SHARED trailing separator breaks chained
       merges: scan-forward replace resumes in the SOURCE after the
       consumed separator, so 'aaaa' under merge (a,a) came out [aa, a, a]
       instead of the greedy [aa, aa].
    With per-symbol wrapping, both symbol boundaries are anchored and
    adjacent matches share no characters, so replace-all equals the
    left-to-right greedy merge pass of standard BPE exactly like
    :func:`_merge_pair` ('aaaaa' + (a,a) → [aa, aa, a]). Plain ``replace``
    (not regexp) exists with identical scan-forward semantics in Spark and
    DuckDB, which is what makes the oracle bit-exact."""
    # (?s): '.' must match line terminators too — a word containing \n
    # (split is on spaces only) would otherwise keep that char un-wrapped,
    # breaking the 2n+1 split invariant and diverging from the oracle's
    # string_split_regex(w, ''), which splits EVERY character
    e = F.regexp_replace(word, "(?s)(.)", _SEP + "$1" + _SEP)
    for a, b in merges:
        e = F.replace(e, F.lit(_SEP + a + _SEP + _SEP + b + _SEP),
                      F.lit(_SEP + a + b + _SEP))
    return e


def bpe_encode(merges=FIXTURE_MERGES, id_col: str = "doc_id",
               text_col: str = "text") -> Callable[[DataFrame], DataFrame]:
    """Tokenize documents with a LEARNED merge table (the inference half of
    the tokenizer: :func:`bpe_learn_merges` trains once; this applies the
    shipped constant everywhere). Returns (doc_id, n_words, bpe_tokens).

    Scale shape: the corpus explodes to (doc_id, word) once, but the merge
    cascade runs over the DISTINCT-word vocabulary only (Heaps-law bounded,
    ≪ corpus) — then a vocabulary join (broadcastable: the vocab carries two
    ints per word) maps per-word token counts back and re-aggregates per
    document. Encoding cost is independent of how often each word repeats
    across 100 TB. The vocab join is left to AQE: it broadcasts while the
    (word, int) table fits the threshold and falls back to an ordinary
    uniform-key hash join for extreme vocabularies — never forced."""

    def _apply(df: DataFrame) -> DataFrame:
        words = (df.select(F.col(id_col).alias("doc_id"),
                           F.explode(F.split(F.col(text_col), " ")).alias("w"))
                 .filter(F.col("w") != ""))
        vocab = words.select("w").distinct()
        # split of the per-symbol-wrapped string yields 2n+1 elements
        # ('', s1, '', s2, ..., ''): n = (size - 1) / 2, exact in double
        n_tok = ((F.size(F.split(_encode_expr(F.col("w"), merges), _SEP))
                  - F.lit(1)) / F.lit(2)).cast("bigint")
        vocab_counts = vocab.select("w", n_tok.alias("_n_tok"))
        return (
            words.join(vocab_counts, "w")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_words"),
                 F.sum("_n_tok").cast("bigint").alias("bpe_tokens"))
        )

    return _apply


def bpe_encode_tokens(merges=FIXTURE_MERGES, text_col: str = "text",
                      k: int = 20) -> Callable[[DataFrame], DataFrame]:
    """Corpus token frequencies under the merge table: top-``k``
    (token, freq) after BPE encoding — the sanity table a tokenizer rollout
    reviews. Same vocabulary-collapse shape as :func:`bpe_encode`; the
    symbol explode fans out over distinct words only, weighted by word
    frequency. Ties break lexically so top-k is deterministic."""

    def _apply(df: DataFrame) -> DataFrame:
        wf = word_freq(df, text_col, min_len=1)
        syms = F.split(_encode_expr(F.col("w"), merges), _SEP)
        return (
            # symbols are the non-empty elements of the 2n+1 split
            wf.select(F.explode(F.filter(syms, lambda s: s != "")).alias("token"), "f")
            .groupBy("token")
            .agg(F.sum("f").cast("bigint").alias("freq"))
            .orderBy(F.desc("freq"), "token")
            .limit(k)
        )

    return _apply
