"""Text-analysis functions for the documents pipeline.

All pure Column expressions (JVM-side, whole-stage codegen): tokenization,
quality stats, language-ID heuristic, BPE-ish token estimation, and a
position-sensitive document fingerprint. Engine-portable by construction —
every expression has an exact DuckDB equivalent (see __spark_entry__.py
oracles).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FP_MOD = 1_000_003  # prime modulus for the fingerprint accumulator

# tiny per-language stopword marker lists for the heuristic classifier
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "das"),
    "es": ("el", "la", "los"),
}


def tokens(col: str = "text") -> Column:
    """SINGLE-SPACE tokenization as an array column — the corpus-wide token
    contract. A token is a run of non-space characters between single ' '
    separators; this is deliberately NOT \\s+ splitting, because the same
    literal split exists bit-identically in DuckDB (string_split), which is
    what keeps every token-derived oracle exact. Text with tabs / newlines /
    repeated spaces should pass through :func:`normalize_text` first (its
    whitespace collapse makes the single-space contract exact); un-normalized
    mixed whitespace yields fused or empty tokens by design of the contract.
    """
    return F.split(F.col(col), " ")


def token_id(col: Column) -> Column:
    """Portable 32-bit token hash: first 8 hex digits of md5 as a bigint.

    Fully distributed (no vocabulary join / global rank) and bit-identical in
    any engine with md5 — the property the DuckDB oracle needs. At 100 TB this
    is the right shape too: a pure map-side expression. (xxhash64 would be
    ~3× faster but is Spark-specific; swap via this single function if oracle
    portability is not needed.)
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def text_stat_cols(text_col: str = "text",
                   stopwords: Sequence[str] = ("the", "a")) -> list[Column]:
    """The `text_stats` output expressions as standalone aliased Columns —
    for composing into a WIDER single projection (e.g. the training_prep
    pipeline computes stats + language inline from one scan instead of
    re-scanning per transform and joining corpus-sized frames on doc_id)."""
    sw = ", ".join(f"'{s}'" for s in stopwords)
    toks = tokens(text_col)
    return [
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            F.expr(f"aggregate(transform(split({text_col}, ' '), x -> length(x)), 0L, (a, x) -> a + x)")
            / F.size(toks), 4).alias("avg_token_len"),
        F.round(
            F.size(F.expr(f"filter(split({text_col}, ' '), x -> x IN ({sw}))"))
            / F.size(toks), 6).alias("stopword_ratio"),
    ]


def text_stats(id_col: str = "doc_id", text_col: str = "text",
               stopwords: Sequence[str] = ("the", "a")) -> Callable[[DataFrame], DataFrame]:
    """Per-document quality stats: token count, distinct tokens, average token
    length, stopword ratio."""

    def _apply(df: DataFrame) -> DataFrame:
        return df.select(F.col(id_col), *text_stat_cols(text_col, stopwords))

    return _apply


def lang_score_cols(text_col: str = "text") -> list[Column]:
    """The three `lang_id` marker-score expressions as standalone aliased
    Columns (score_en / score_de / score_es) — the single-projection
    composition companion of `text_stat_cols`."""
    def _score(lang: str) -> Column:
        ws = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        return F.size(F.expr(f"filter(split({text_col}, ' '), x -> x IN ({ws}))"))

    return [_score("en").alias("score_en"), _score("de").alias("score_de"),
            _score("es").alias("score_es")]


def lang_argmax() -> Column:
    """`lang_id`'s argmax over already-projected score_en/score_de/score_es
    attributes (deterministic tie-break order en > de > es)."""
    # NULL text has no tokens to score: label NULL, not a language.
    # All-NULL scores would skip every when() and confidently fall
    # through to the 'es' branch.
    return (
        F.when(F.col("score_en").isNull(), F.lit(None).cast("string"))
        .when((F.col("score_en") >= F.col("score_de")) & (F.col("score_en") >= F.col("score_es")), "en")
        .when(F.col("score_de") >= F.col("score_es"), "de")
        .otherwise("es"))


def lang_id(id_col: str = "doc_id", text_col: str = "text") -> Callable[[DataFrame], DataFrame]:
    """Marker-word language heuristic: count hits from each language's marker
    list; argmax with deterministic tie-break order en > de > es."""

    def _apply(df: DataFrame) -> DataFrame:
        out = df.select(F.col(id_col), *lang_score_cols(text_col))
        return out.withColumn("predicted_lang", lang_argmax())

    return _apply


def token_count_bpe(id_col: str = "doc_id", text_col: str = "text",
                    chars_per_token: int = 4) -> Callable[[DataFrame], DataFrame]:
    """BPE-ish token-count estimate: alphanumeric words via regex, each word
    contributing ceil(len/chars_per_token) subword tokens (min 1)."""

    def _apply(df: DataFrame) -> DataFrame:
        c = chars_per_token
        return df.select(
            F.col(id_col),
            F.expr(
                f"aggregate(regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0), 0L,"
                f" (a, x) -> a + greatest(1L, (length(x) + {c - 1}) div {c}))"
            ).alias("est_tokens"),
        )

    return _apply


def doc_fingerprint(id_col: str = "doc_id", text_col: str = "text") -> Callable[[DataFrame], DataFrame]:
    """Position-sensitive document fingerprint:
    ``sum((token_id * position_1based) % p) % p`` — an order-aware rolling
    signature computed as one map-side expression (posexplode-free: the fold
    runs inside `aggregate` over the token array)."""

    def _apply(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.expr(
                f"aggregate(zip_with(split({text_col}, ' '),"
                f"  sequence(1, size(split({text_col}, ' '))),"
                f"  (tok, i) -> (cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint) * i) % {FP_MOD}),"
                f" 0L, (a, x) -> (a + x) % {FP_MOD})"
            ).cast("bigint").alias("fingerprint"),
        )

    return _apply


# Conservative patterns shared with the DuckDB oracle (both engines compile
# them identically; no lookbehind/backreferences).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9 ()-]{7,}[0-9]"


def redact_pii(id_col: str = "doc_id", text_col: str = "text",
               token: str = "[PII]") -> Callable[[DataFrame], DataFrame]:
    """Corpus-hygiene pass: replace email addresses and phone-number-shaped
    spans with ``token`` and count what was removed — the redaction step a
    training pipeline runs before anything is retained. Pure regexp
    expressions on the scan: zero shuffle, scales with read bandwidth."""

    def _apply(df: DataFrame) -> DataFrame:
        n_email = F.size(F.regexp_extract_all(text_col, F.lit(f"({EMAIL_RE})"), 1))
        redacted = F.regexp_replace(
            F.regexp_replace(F.col(text_col), EMAIL_RE, token),
            PHONE_RE, token)
        n_phone = F.size(F.regexp_extract_all(
            F.regexp_replace(F.col(text_col), EMAIL_RE, token),
            F.lit(f"({PHONE_RE})"), 1))
        return df.select(
            F.col(id_col).alias("doc_id"),
            redacted.alias("redacted_text"),
            n_email.cast("bigint").alias("n_emails"),
            n_phone.cast("bigint").alias("n_phones"),
        )

    return _apply


def repetition_stats(id_col: str = "doc_id", text_col: str = "text"
                     ) -> Callable[[DataFrame], DataFrame]:
    """Gopher-style repetition filter inputs: tokens, distinct tokens, the
    most-frequent token's count, and its share of the document.

    Cardinality contract: docs that produce NO token rows (NULL text)
    have no output row — like token_entropy and bigram_logprob_score,
    this is a stats-for-scorable-docs table; LEFT-join it from the corpus
    when every doc needs a row (a dropped doc means "no tokens", not
    "filtered for quality")
    (repetition_ratio) — high ratios flag boilerplate/spam for removal.

    Two uniform-key shuffles ((doc, token) count, then per-doc max) — the
    distributed word-count shape, never a per-doc collect."""

    def _apply(df: DataFrame) -> DataFrame:
        tok = df.select(F.col(id_col).alias("doc_id"),
                        F.explode(F.split(F.lower(F.col(text_col)), " "))
                        .alias("token"))
        per_token = (tok.groupBy("doc_id", "token")
                     .agg(F.count(F.lit(1)).alias("_c")))
        return (
            per_token.groupBy("doc_id")
            .agg(F.sum("_c").alias("n_tokens"),
                 F.count(F.lit(1)).alias("n_distinct_tokens"),
                 F.max("_c").alias("top_token_freq"))
            .select("doc_id", "n_tokens", "n_distinct_tokens", "top_token_freq",
                    (F.round(F.col("top_token_freq") / F.col("n_tokens"), 6)
                     + F.lit(0.0)).alias("repetition_ratio"))
        )

    return _apply


def token_entropy(id_col: str = "doc_id", text_col: str = "text"
                  ) -> Callable[[DataFrame], DataFrame]:
    """Per-document unigram Shannon entropy (nats): ``ln(n) - (1/n)*sum_t
    c_t*ln(c_t)`` — the lexical-diversity signal quality filters combine
    with `repetition_stats` (low entropy = repetitive/templated text).

    Engine-portability: an unordered float sum over tokens would be
    summation-order-dependent, so the per-token terms are folded in SORTED
    token order (collect sorted counts, left-fold inside `aggregate`) —
    deterministic on any engine. Scale shape: one shuffle to count
    (doc, token), one to assemble each doc's count array; the array is
    O(distinct tokens per doc), not corpus vocabulary.
    """

    def _apply(df: DataFrame) -> DataFrame:
        tok = df.select(F.col(id_col),
                        F.explode(F.split(F.col(text_col), " ")).alias("token"))
        cnt = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("c"))
        agg = cnt.groupBy(id_col).agg(
            F.sum("c").alias("n"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sort_array(F.collect_list(F.struct("token", "c"))).alias("_arr"),
        )
        s = F.expr(
            "aggregate(transform(_arr, x -> cast(x.c as double) * ln(cast(x.c as double))),"
            " cast(0.0 as double), (a, x) -> a + x)")
        ent = F.log(F.col("n").cast("double")) - s / F.col("n").cast("double")
        return agg.select(
            F.col(id_col),
            F.col("n").alias("n_tokens"),
            F.col("n_distinct").alias("n_distinct_tokens"),
            (F.round(ent, 6) + F.lit(0.0)).alias("entropy"),
        )

    return _apply


def hashed_features(dim: int = 64, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Hashing-trick featurizer (the scalable bag-of-words vectorizer): each
    token hashes to a bucket in [0, dim) via the portable md5-prefix hash,
    per-document bucket counts are L2-normalized, and the result is emitted
    in LONG form (doc_id, bucket, weight) — the sparse layout that joins,
    aggregates, and stores efficiently at corpus scale (and that downstream
    dot products consume directly: sum of weight products on bucket equality).

    No vocabulary is built or broadcast — the defining property of feature
    hashing: memory is O(1) in corpus size, the plan is explode → one hash
    aggregation on (doc, bucket) → a same-partitioning window for the norm.
    The hash, counts, and norm are engine-portable (md5 + integer counts +
    one sqrt), so the DuckDB oracle replays it exactly.
    """
    from pyspark.sql import Window

    def _apply(df):
        toks = df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"))
        counts = (toks.withColumn("bucket", F.pmod(token_id(F.col("tok")),
                                                   F.lit(dim)).cast("int"))
                  .groupBy("doc_id", "bucket")
                  .agg(F.count(F.lit(1)).alias("_tf")))
        w = Window.partitionBy("doc_id")
        nrm = F.sqrt(F.sum(F.col("_tf") * F.col("_tf")).over(w).cast("double"))
        return counts.select(
            "doc_id", "bucket",
            (F.round(F.col("_tf") / nrm, 6) + F.lit(0.0)).alias("weight"))

    return _apply


def bigram_logprob_score(k: float = 0.5, id_col: str = "doc_id",
                         text_col: str = "text"):
    """Perplexity-proxy quality score (the CCNet/Gopher-style LM filter,
    with the corpus itself as the LM): score each document by the mean
    add-k-smoothed bigram log-probability
    ``mean over bigrams of ln((c(w1,w2) + k) / (c(w1) + k*V))``
    where counts come from the whole corpus and V is the unigram vocabulary
    size. Documents full of rare/unseen transitions score low — the
    standard gibberish/boilerplate discriminator when no external LM is
    available. Docs with fewer than two tokens (or NULL text) have no
    bigrams and therefore NO output row — LEFT-join from the corpus if
    every doc needs a score.

    Scale shape: bigram extraction is a map-side array zip (no window);
    corpus bigram/unigram count tables aggregate with map-side partials;
    scoring joins each doc bigram against the two count tables on uniform
    token keys (ordinary hash joins — the Zipf head is handled by AQE skew
    split) and reduces per doc. The log/mean runs on SORTED per-doc sums?
    No: mean of logs is an unordered double sum — made engine-stable by
    rounding each log term to 9 dp before summation (exact in both engines
    at these magnitudes) and the mean to 6 dp.
    """

    def _apply(df):
        toks = df.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.lower(F.col(text_col)), " ").alias("_t"))
        bigrams = toks.select(
            "doc_id",
            F.explode(F.zip_with(
                F.slice("_t", 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                F.slice("_t", 2, F.greatest(F.size("_t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))).alias("bg")
        ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        # the explode feeds four consumers (counts, marginals, vocab, the
        # scoring join) — materialize it ONCE (distributed, no driver
        # collect); persist over localCheckpoint: same reuse, no checkpoint
        # write barrier. Registered with pipeline_cache so the NEXT
        # pipeline's drop_stale_caches releases it (a bare .persist() here
        # pinned a corpus-sized frame for the session lifetime)
        from akka_stream_contrib_spark.util import (drop_stale_caches,
                                                    pipeline_cache)
        drop_stale_caches()
        bigrams = pipeline_cache(bigrams)
        # the count table itself feeds FOUR consumers (marginals, both
        # vocab branches, the enrichment join) and the executed plan shows
        # ZERO ReusedExchange across them — without its own cache each
        # consumer re-runs the map-side partial aggregation over the whole
        # cached bigram stream (4 full passes; the shuffled bytes were
        # already vocab²-bounded thanks to the partial agg). Caching the
        # vocab²-BOUNDED aggregate cuts that to one pass (r11, guide §2.4;
        # measured jobs 23 → 21 on perplexity_buckets / 17 → 15 on
        # bigram_logprob, wall flat at sf0.1 — the kept win is the three
        # saved corpus-cache passes at scale).
        bg_counts = pipeline_cache(
            bigrams.groupBy("w1", "w2").agg(
                F.count(F.lit(1)).alias("c12")))
        # marginal + vocabulary DERIVE from the aggregated count table
        # (|vocab|² bounded) — the raw bigram rows shuffle exactly twice
        # (count table + final per-doc reduce), never for the marginals:
        # c(w1 as bigram head) = Σ_w2 c(w1,w2)
        u_counts = bg_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
        # V = distinct tokens over either position (smoothing vocabulary)
        vocab = (bg_counts.select(F.col("w1").alias("w"))
                 .union(bg_counts.select(F.col("w2").alias("w")))
                 .agg(F.count_distinct("w").cast("double").alias("_v")))
        # the add-k term is a function of the DISTINCT bigram only, so
        # compute it once per (w1, w2) on the vocab²-bounded count table
        # (marginal join + ln run on aggregate-sized rows) and join the
        # corpus-sized bigram stream ONCE — the old form joined the raw
        # stream twice (counts on (w1,w2), then marginals on w1), paying a
        # second corpus-stream shuffle and a per-occurrence ln (at sf0.1
        # the stream is small so the warm win is modest, 1.86 → 1.69 s;
        # the saved shuffle scales with the corpus while the added
        # marginal join scales with vocab². Output bit-identical: summing
        # N copies of the same 9-dp decimal is associative)
        term = F.round(
            F.log((F.col("c12") + F.lit(float(k)))
                  / (F.col("c1") + F.lit(float(k)) * F.col("_v"))),
            9).cast("decimal(15,9)")
        enriched = (bg_counts.join(u_counts, "w1")
                    .crossJoin(F.broadcast(vocab))
                    .select("w1", "w2", term.alias("_term")))
        scored = bigrams.join(enriched, ["w1", "w2"])
        return (scored.groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_bigrams"),
                     (F.round(F.sum("_term").cast("double")
                              / F.count(F.lit(1)), 6)
                      + F.lit(0.0)).alias("logprob")))

    return _apply


def pmi_bigrams(df: DataFrame, text_col: str = "text", min_count: int = 5,
                top_n: int = 50) -> DataFrame:
    """Top collocations by pointwise mutual information:
    ``pmi(w1,w2) = ln(c12 * N / (c1 * c2))`` over adjacent lowercase token
    pairs, where c1/c2 are the bigram head/tail marginals and N the total
    bigram count. The word2vec/phrase-mining prep step (collocations become
    single tokens before training). Output: (w1, w2, c12, pmi), the
    ``top_n`` highest-PMI pairs with support >= ``min_count``.

    Scale shape: bigram extraction is a map-side array zip (no window, no
    shuffle); three count aggregates with map-side partials; marginals join
    back on uniform token keys; N is a 1-row broadcast crossJoin. The
    ln runs once per surviving PAIR (not per occurrence) on exact bigint
    counts, rounded to 6 dp — engine-portable. Deterministic top-n via the
    (pmi desc, w1, w2) total order."""
    toks = df.select(F.split(F.lower(F.col(text_col)), " ").alias("_t"))
    bigrams = toks.select(
        F.explode(F.zip_with(
            F.slice("_t", 1, F.greatest(F.size("_t") - 1, F.lit(0))),
            F.slice("_t", 2, F.greatest(F.size("_t") - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    # marginals and N DERIVE from the aggregated pair table (the
    # bigram_logprob_score pattern): the raw exploded bigram rows are
    # consumed ONCE — without this the document scan + explode replayed
    # four times (pair counts, two marginals, total)
    from akka_stream_contrib_spark.util import (drop_stale_caches,
                                                pipeline_cache)
    drop_stale_caches()
    pair_c = pipeline_cache(
        bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")))
    head_c = pair_c.groupBy("w1").agg(F.sum("c12").alias("_c1"))
    tail_c = pair_c.groupBy("w2").agg(F.sum("c12").alias("_c2"))
    total = pair_c.agg(F.sum("c12").cast("double").alias("_n"))
    return (
        pair_c.filter(F.col("c12") >= min_count)
        .join(head_c, "w1").join(tail_c, "w2")
        .crossJoin(F.broadcast(total))
        .select("w1", "w2", "c12",
                F.round(F.log(F.col("c12") * F.col("_n")
                              / (F.col("_c1") * F.col("_c2"))), 6).alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(top_n)
    )


def readability_score(id_col: str = "doc_id", text_col: str = "text"
                      ) -> Callable[[DataFrame], DataFrame]:
    """Flesch reading-ease approximation per document:
    ``206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)`` with
    sentences = [.!?] runs (min 1), words = whitespace tokens, syllables =
    vowel groups ``[aeiouy]+`` (min 1 per word — the standard
    dictionary-free heuristic). A curation quality signal orthogonal to
    length/stopword ratios (`quality.py::quality_score`): flags
    both unreadably dense prose and token-salad.

    Pure codegen expressions (regexp counts + arithmetic), no shuffle at
    all — the score pipelines into any downstream filter at full scan
    speed. Counts are exact ints; the final arithmetic is one double
    expression per row. Rounding to 4 dp uses the engine-replayable
    ``floor(x·10⁴ + 0.5)/10⁴`` device (same as the int8 quantizer): the
    Flesch rational lands EXACTLY on half-boundaries (e.g. x.xxx75) where
    round() half-way policy differs between engines — caught by the
    sf0.1 gate sweep."""

    def _apply(df: DataFrame) -> DataFrame:
        txt = F.lower(F.col(text_col))
        words = F.size(F.split(F.trim(txt), " +"))
        sentences = F.greatest(
            F.size(F.regexp_extract_all(txt, F.lit(r"[.!?]+"), 0)), F.lit(1))
        vowel_groups = F.size(F.regexp_extract_all(txt, F.lit(r"[aeiouy]+"), 0))
        syllables = F.greatest(vowel_groups, words)  # >= 1 syllable per word
        score = (F.lit(206.835)
                 - F.lit(1.015) * words / sentences
                 - F.lit(84.6) * syllables / words)
        return df.select(
            F.col(id_col).alias("doc_id"),
            words.alias("n_words"),
            sentences.alias("n_sentences"),
            syllables.alias("n_syllables"),
            (F.floor(score * F.lit(10000.0) + F.lit(0.5))
             / F.lit(10000.0)).alias("flesch"))

    return _apply


def normalize_text(id_col: str = "doc_id", text_col: str = "text"
                   ) -> Callable[[DataFrame], DataFrame]:
    """Text canonicalization — the first map of every ingest pipeline:
    lowercase, strip ASCII control characters, collapse whitespace runs,
    trim. Emits (doc_id, norm_text, changed). Pure regexp/codegen
    expressions (zero shuffles, trivially pipelineable into any downstream
    operator); ASCII character classes only, so the exact same regexes run
    under Java regex (Spark) and RE2 (DuckDB oracle)."""

    def _apply(df: DataFrame) -> DataFrame:
        t = F.col(text_col)
        norm = F.lower(t)
        # \x0b (VT), \x0c (FF) and \x0d (CR) are LINE TERMINATORS, not
        # junk: stripping them fused the words around a bare-CR boundary
        # ('foo\rbar' -> 'foobar') before the collapse could space them
        norm = F.regexp_replace(norm, "[\\x00-\\x08\\x0e-\\x1f\\x7f]", "")
        norm = F.regexp_replace(norm, "[ \\t\\n\\r\\x0b\\x0c]+", " ")
        norm = F.trim(norm)
        return df.select(F.col(id_col).alias("doc_id"),
                         norm.alias("norm_text"),
                         (norm != t).alias("changed"))

    return _apply


def doc_keywords(top_n: int = 3, id_col: str = "doc_id",
                 text_col: str = "text") -> Callable[[DataFrame], DataFrame]:
    """Per-document keyword extraction: the ``top_n`` terms by TF-IDF
    (sublinear tf: 1 + ln(tf), idf: ln(N/df)) with deterministic (score
    desc, token asc) ranking. The corpus-level signal (df table) is the
    same partial-aggregated word-count reduction every retrieval operator
    here uses; N rides along as a 1-row broadcast; ranking is a per-doc
    window over that doc's distinct terms only.

    Scale shape: two uniform-key shuffles ((doc, token) tf + token df) +
    one doc window; the df table joins token-keyed (AQE broadcasts it while
    it fits, hash join beyond). Scores round to 6 dp with exact tie-break
    so the oracle replays the ranking bit-for-bit."""

    def _apply(df: DataFrame) -> DataFrame:
        from pyspark.sql import Window
        tok = df.select(F.col(id_col).alias("doc_id"),
                        F.explode(F.split(F.lower(F.col(text_col)), " "))
                        .alias("token"))
        tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
        dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("_n"))
        scored = (tf.join(dfreq, "token")
                  .crossJoin(F.broadcast(n_docs))
                  .withColumn(
                      "score",
                      F.round((F.lit(1.0) + F.log("tf"))
                              * F.log(F.col("_n") / F.col("df")), 6)
                      + F.lit(0.0)))
        w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "token")
        return (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= top_n)
                .select("doc_id", "token", "score",
                        F.col("rank").cast("int").alias("rank")))

    return _apply


def jaro_winkler(s1: str, s2: str) -> float:
    """Jaro-Winkler similarity (Winkler 1990): Jaro similarity boosted by
    up to 4 chars of common prefix (weight 0.1) when the base similarity
    exceeds 0.7 — the record-linkage standard for short name-like strings.
    Matches DuckDB's jaro_winkler_similarity (validated pairwise by the
    oracle gate and pytest), so fuzzy joins hash-compare cross-engine."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0  # DuckDB convention: ('','') scores 0, not 1
    if s1 == s2:
        return 1.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = i - window if i - window > 0 else 0
        hi = i + window + 1 if i + window + 1 < l2 else l2
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0
    if jaro > 0.7:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        jaro += prefix * 0.1 * (1.0 - jaro)
    return jaro


def jaro_winkler_col(a, b):
    """Arrow-batched Column form of :func:`jaro_winkler` (no JVM built-in
    exists; short strings → the per-row Python loop is bounded and the
    batch transfer amortized). Use inside a BLOCKED candidate join, never
    over an unbounded pair space."""
    import pandas  # noqa: F401 — resolvable name for the UDF type hints
    from pyspark.sql.functions import pandas_udf

    # NOTE: hints must resolve under `from __future__ import annotations`
    # (pandas_udf re-evaluates them as strings from module globals)
    def _jw_impl(x, y):
        # NULL on either side -> NULL similarity (a None would crash
        # len() inside jaro_winkler and fail the whole task)
        return pandas.Series(
            [None if u is None or v is None else jaro_winkler(u, v)
             for u, v in zip(x, y)], dtype="float64")

    _jw_impl.__annotations__ = {
        "x": pandas.Series, "y": pandas.Series, "return": pandas.Series}
    # asNondeterministic: the function IS pure (same inputs -> same
    # similarity), but leaving it "deterministic" lets Catalyst push a
    # filter on the result back through the projection and re-extract the
    # UDF into BOTH operators — two ArrowEvalPython passes over the
    # candidate stream (observed in fuzzy_vocab_jw's plan). The flag pins
    # the UDF where it was projected so every candidate pair crosses the
    # Python boundary exactly once; values are unchanged.
    _jw = pandas_udf("double")(_jw_impl).asNondeterministic()
    return _jw(a, b)


def luhn_valid(digits: Column) -> Column:
    """Luhn checksum (ISO/IEC 7812) over a digit-string Column — TRUE iff
    the number self-validates. The check runs right-to-left: double every
    second digit, subtract 9 when the double exceeds 9, and the grand
    total must divide by 10. Pure checksum — any length validates (the
    13–19 PAN length floor lives in ``luhn_scan``'s candidate filter, not
    here). Pure higher-order-function expression (reverse → per-position
    transform → aggregate): zero shuffles, no UDF, and the same arithmetic
    is expressible in any SQL engine (the oracle mirrors it with
    list_transform/list_sum)."""
    ds = F.split(F.reverse(digits), "")
    ds = F.filter(ds, lambda c: c != F.lit(""))  # trailing split artifact
    terms = F.transform(
        ds, lambda c, i: F.when(
            i % 2 == 1,
            F.when(c.cast("int") * 2 > 9, c.cast("int") * 2 - 9)
            .otherwise(c.cast("int") * 2),
        ).otherwise(c.cast("int")))
    total = F.aggregate(terms, F.lit(0), lambda acc, x: acc + x)
    # empty input is NOT a valid number (a vacuous checksum of 0 digits
    # would pass pmod 0); any non-empty digit run validates purely by
    # checksum — PAN length policy belongs to callers like luhn_scan
    return (F.length(digits) >= 1) & (F.pmod(total, F.lit(10)) == 0)


def luhn_scan(id_col: str = "doc_id", text_col: str = "text"
              ) -> "Callable[[DataFrame], DataFrame]":
    """Payment-card-number PII scan: extract 13–19 digit candidate runs
    (spaces/dashes allowed between groups), keep only those that pass the
    Luhn checksum — the validation that separates real card numbers from
    arbitrary digit noise (phone numbers, ids) and cuts the false-positive
    rate of a bare regex by ~90%. Emits one row per VALID hit:
    (id, last4, n_digits) — never the full number, so the scan's own
    output is not itself PII.

    Scale shape: regexp_extract_all + per-candidate checksum are pure
    map-side expressions; the explode multiplies rows only by the hit
    count. Companion to ``pii_redact`` (pattern redaction without
    checksum validation)."""

    def _apply(df: DataFrame) -> DataFrame:
        # maximal digit/separator runs (greedy in every regex engine, and
        # RE2-compatible — no lookarounds, so the DuckDB oracle matches the
        # same spans); over-long runs fall out at the 13–19 length filter
        cands = F.expr(
            rf"regexp_extract_all({text_col}, '[0-9][0-9 -]*[0-9]', 0)")
        out = df.select(F.col(id_col), F.explode(cands).alias("_raw"))
        digits = F.regexp_replace(F.col("_raw"), "[^0-9]", "")
        out = out.select(
            id_col, digits.alias("_d")).filter(
            (F.length("_d") >= 13) & (F.length("_d") <= 19))
        return (out.filter(luhn_valid(F.col("_d")))
                .select(F.col(id_col),
                        F.substring("_d", -4, 4).alias("last4"),
                        F.length("_d").cast("int").alias("n_digits")))

    return _apply


def tokenizer_fertility(group_col: str = "lang", text_col: str = "text",
                        chars_per_token: int = 4,
                        ) -> Callable[[DataFrame], DataFrame]:
    """Tokenizer fertility per ``group_col``: subword tokens emitted per
    whitespace word — THE tokenizer-evaluation number (a fertility far
    above ~1.3 for a language means the vocabulary under-serves it and its
    effective context shrinks). Uses the same BPE-ish estimator as
    `token_count_bpe` (ceil(len/chars_per_token) per alphanumeric word)
    over the same regex word stream, so the two queries are consistent.

    One map-combined groupBy; exact integer token/word sums, one
    try_divide (NULL for a group with no words), rounded to 6 dp. Returns
    (group, n_docs, total_tokens, total_words, fertility).

    Reference anchor: none (tokenizer-evaluation extension; family of
    token_count_bpe / oov_rate).
    """
    c = chars_per_token

    def _apply(df: DataFrame) -> DataFrame:
        toks = F.expr(
            f"aggregate(regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0), 0L,"
            f" (a, x) -> a + greatest(1L, (length(x) + {c - 1}) div {c}))")
        words = F.expr(
            f"cast(size(regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)) as long)")
        agg = (df.groupBy(group_col)
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum(toks).alias("total_tokens"),
                    F.sum(words).alias("total_words")))
        return agg.select(
            group_col, "n_docs", "total_tokens", "total_words",
            (F.round(F.try_divide(F.col("total_tokens").cast("double"),
                                  F.col("total_words").cast("double")), 6)
             + F.lit(0.0)).alias("fertility"))

    return _apply


def bleu2_corpus(refs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 ) -> Callable[[DataFrame], DataFrame]:
    """Corpus-level BLEU-2 of a candidate frame against a reference frame
    joined on ``id_col`` (Papineni et al. 2002, ACL: "BLEU: a Method for
    Automatic Evaluation of Machine Translation"). The generation-eval
    staple: clipped n-gram precision says "how much of what the candidate
    wrote appears in the reference", the brevity penalty stops a one-word
    candidate from scoring 1.0.

      p_n = Σ_pairs Σ_g min(cnt_cand(g), cnt_ref(g)) / Σ_pairs |cand|_n
      BLEU2 = BP · √(p₁·p₂),  BP = min(1, e^(1 − r/c)) over corpus totals

    (the geometric mean is written as one √ of a product — no exp/ln
    round-trip for the mean itself; exp appears only in the short-
    candidate BP branch, 1-ulp libm drift absorbed by the 6-dp rounding).

    Distributed shape (r10 opt, guide §2.3/§2.4 — aggregate before you
    shuffle, share passes): ONE equi-join pairs the two frames on id (the
    paired frame is pipeline-cached for its two consumers); ONE explode of
    a tagged (level, side, gram) array covers unigrams+bigrams on both
    sides, so all four gram streams ride ONE (id, level, gram) shuffle
    with map-side partial counts, and both clipped-match totals fall out
    of a single one-row aggregate — ``least(c, r)`` is 0 whenever a gram
    is absent from either side, which is exactly the inner-join clipping
    of the two-sided form this replaced (measured: 4 gram exchanges + 2
    (id, gram) joins → 1 gram exchange, explain Exchange mentions 24→9).
    Clipped matches and lengths stay exact integers until three final
    double divisions.

    Returns one row: (n_pairs, m1, d1, m2, d2, bp, p1, p2, bleu2).

    Reference anchor: none (generation-evaluation extension; family of
    ndcg_at_k / average_precision_at_k / js_divergence).
    """
    def _toks(c: Column) -> Column:
        return F.split(F.lower(c), " ")

    def _bigrams(t: Column) -> Column:
        n = F.size(t)
        return F.zip_with(
            F.slice(t, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(t, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit("\x1f"), b))

    def _apply(cands: DataFrame) -> DataFrame:
        from akka_stream_contrib_spark.util import pipeline_cache

        paired = pipeline_cache(
            cands.select(F.col(id_col).alias("_id"),
                         _toks(F.col(text_col)).alias("_ct"))
            .join(refs.select(F.col(id_col).alias("_id"),
                              _toks(F.col(text_col)).alias("_rt")),
                  "_id"))

        def _tagged(arr: Column, lvl: int, side: int) -> Column:
            # NULL token arrays carry no grams either way (explode of the
            # old per-side NULL array produced no rows; here the coalesce
            # keeps the OTHER side's entries alive in the concat)
            return F.transform(
                F.coalesce(arr, F.array()),
                lambda g: F.struct(F.lit(lvl).alias("lvl"),
                                   F.lit(side).alias("side"),
                                   g.alias("g")))

        entries = F.concat(
            _tagged(F.col("_ct"), 1, 0), _tagged(_bigrams(F.col("_ct")), 2, 0),
            _tagged(F.col("_rt"), 1, 1), _tagged(_bigrams(F.col("_rt")), 2, 1))
        counts = (paired.select("_id", F.explode(entries).alias("_e"))
                  .groupBy("_id", F.col("_e.lvl").alias("_lvl"),
                           F.col("_e.g").alias("_g"))
                  .agg(F.sum(F.when(F.col("_e.side") == 0, 1)
                             .otherwise(0)).alias("_c"),
                       F.sum(F.when(F.col("_e.side") == 1, 1)
                             .otherwise(0)).alias("_r")))
        clip = F.least(F.col("_c"), F.col("_r"))
        m = counts.agg(
            F.coalesce(F.sum(F.when(F.col("_lvl") == 1, clip)),
                       F.lit(0)).alias("m1"),
            F.coalesce(F.sum(F.when(F.col("_lvl") == 2, clip)),
                       F.lit(0)).alias("m2"))
        lens = paired.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.size("_ct")).alias("d1"),
            F.sum(F.greatest(F.size("_ct") - 1, F.lit(0))).alias("d2"),
            F.sum(F.size("_rt")).alias("r_len"))
        j = lens.crossJoin(F.broadcast(m))
        c = F.col("d1").cast("double")
        r = F.col("r_len").cast("double")
        bp = F.when(F.col("d1") >= F.col("r_len"), F.lit(1.0)) \
             .otherwise(F.exp(F.lit(1.0) - r / c))
        p1 = F.try_divide(F.col("m1").cast("double"), c)
        p2 = F.try_divide(F.col("m2").cast("double"),
                          F.col("d2").cast("double"))
        return j.select(
            "n_pairs", "m1", "d1", "m2", "d2",
            (F.round(bp, 6) + F.lit(0.0)).alias("bp"),
            (F.round(p1, 6) + F.lit(0.0)).alias("p1"),
            (F.round(p2, 6) + F.lit(0.0)).alias("p2"),
            (F.round(bp * F.sqrt(p1 * p2), 6) + F.lit(0.0)).alias("bleu2"))

    return _apply


def translit_map() -> tuple[str, str]:
    """The 1:1 Latin-diacritic fold shared by :func:`translit_normalize`
    and its DuckDB oracle mirror — ONE definition so the two engines can
    never diverge on a character. Deliberately 1:1 (``translate``
    semantics): multi-char expansions (ß→ss, æ→ae) fold to their leading
    letter instead; a real ICU transliterator is a library dependency out
    of scope under the no-third-party rule, and for DEDUP KEYS a lossy
    stable fold is exactly as good as a linguistically correct one."""
    groups = [
        ("àáâãäåāăą", "a"), ("çćč", "c"), ("ďð", "d"), ("èéêëēĕėęě", "e"),
        ("ìíîïĩīĭįı", "i"), ("ñńň", "n"), ("òóôõöøōŏő", "o"),
        ("ùúûüũūŭůű", "u"), ("ýÿ", "y"), ("žźż", "z"), ("šśß", "s"),
        ("þť", "t"), ("ĝğ", "g"), ("ĥ", "h"), ("ĵ", "j"), ("ķ", "k"),
        ("ĺļľł", "l"), ("ŕŗř", "r"), ("ŵ", "w"), ("æ", "a"), ("œ", "o"),
    ]
    src = "".join(g for g, _ in groups)
    dst = "".join(d * len(g) for g, d in groups)
    assert len(src) == len(dst)
    return src, dst


def translit_normalize(col: Column) -> Column:
    """Transliteration-normalized text for CROSS-LINGUAL dedup keys: the
    same sentence written with or without diacritics (or romanized with
    accent loss — OCR output, keyboard-limited re-posts, crawl mojibake
    repairs) folds to one canonical form. lowercase → 1:1 diacritic fold
    (:func:`translit_map`) → strip everything outside [a-z0-9 ] →
    collapse whitespace → trim. Pure codegen expressions, zero shuffles;
    non-Latin scripts strip to (near-)empty — this targets Latin-script
    variants, and empty keys are the caller's quarantine signal."""
    src, dst = translit_map()
    t = F.lower(col)
    t = F.translate(t, src, dst)
    t = F.regexp_replace(t, "[^a-z0-9 ]", " ")
    t = F.regexp_replace(t, " +", " ")
    return F.trim(t)


def generation_loops(id_col: str = "doc_id", text_col: str = "text",
                     max_period: int = 8, min_repeats: int = 3,
                     max_repeats: int = 12,
                     ) -> Callable[[DataFrame], DataFrame]:
    """Degenerate generation-loop detector — the filter a synthetic-data
    pipeline runs before model outputs are recycled as training text: a
    decoding loop leaves the document TAIL repeating a short token block
    ("the best of the best of the best ..."). For each document, find the
    SMALLEST period p ≤ ``max_period`` whose last ``min_repeats`` blocks of
    p tokens are identical, and count how many consecutive tail blocks
    repeat (capped at ``max_repeats``).

    Emits (doc_id, n_tokens, loop_period, n_repeats) — loop_period/
    n_repeats NULL when the tail is clean. Everything is unrolled
    array-slice equality inside codegen (periods and repeat counts are
    small compile-time bounds): zero shuffles, scan-bandwidth cost, and
    the same slice comparisons replay verbatim in the SQL oracle.

    Docs with NULL text are dropped (no tokens to scan — the usual
    explode-family row semantics).
    """

    def _apply(df: DataFrame) -> DataFrame:
        # stage the token array and its size as PROJECTED columns: the
        # period chain and the repeat folds reference them dozens of
        # times, and inside the aggregate() lambdas CSE cannot share a
        # recomputed split() (the span_corrupt/shingles discipline) — an
        # attribute read costs nothing
        staged = (df.filter(F.col(text_col).isNotNull())
                  .select(F.col(id_col).alias("doc_id"),
                          F.split(F.col(text_col), " ").alias("_t"))
                  .withColumn("_n", F.size("_t")))
        toks = F.col("_t")
        n = F.col("_n")

        def block(p: int, k: int) -> Column:
            # k-th tail block of length p (k = 1 is the last p tokens)
            return F.slice(toks, n - F.lit(k * p) + 1, p)

        def loops_at(p: int) -> Column:
            cond = n >= F.lit(min_repeats * p)
            eqs = [block(p, 1) == block(p, k)
                   for k in range(2, min_repeats + 1)]
            out = cond
            for e in eqs:
                out = out & e
            return out

        period = F.lit(None).cast("int")
        for p in range(max_period, 0, -1):
            period = F.when(loops_at(p), F.lit(p)).otherwise(period)

        def repeats_for(p: int) -> Column:
            # longest consecutive run of equal tail blocks, capped — an
            # exact fold: (still_running, count) over k = 2..max_repeats
            acc = F.struct(F.lit(True).alias("ok"), F.lit(1).alias("c"))
            fold = F.aggregate(
                F.sequence(F.lit(2), F.lit(max_repeats)),
                acc,
                lambda a, k: F.struct(
                    (a.ok & (n >= k * F.lit(p))
                     & (block(p, 1) == F.slice(
                         toks, n - k * F.lit(p) + 1, p))).alias("ok"),
                    F.when(a.ok & (n >= k * F.lit(p))
                           & (block(p, 1) == F.slice(
                               toks, n - k * F.lit(p) + 1, p)),
                           a.c + 1).otherwise(a.c).alias("c")),
                lambda a: a.c)
            return fold

        reps = F.lit(None).cast("int")
        for p in range(max_period, 0, -1):
            reps = F.when(period == p, repeats_for(p)).otherwise(reps)

        return staged.select("doc_id",
                             n.cast("bigint").alias("n_tokens"),
                             period.alias("loop_period"),
                             reps.alias("n_repeats"))

    return _apply


def distinct_ngrams(ns=(1, 2, 3), group_col: str = "source",
                    text_col: str = "text"
                    ) -> "Callable[[DataFrame], DataFrame]":
    """Distinct-n diversity (Li et al. 2016, "A Diversity-Promoting
    Objective Function for Neural Conversation Models"): the fraction of
    n-gram occurrences in a corpus slice that are distinct — THE standard
    mode-collapse detector for generated/synthetic data (a slice whose
    distinct-2 craters is a model repeating itself; raw dedup won't see
    it because whole documents still differ).

    Scale shape: n-grams materialize IN-ROW (one ``transform`` over
    ``sequence`` per document per n — no joins, no self-zip shuffle) and
    explode keyed by the 16-byte md5 of the gram (narrow shuffle rows,
    the dedup_exact discipline; md5 is also what the DuckDB oracle hashes
    so the distinct counts agree exactly). ONE (slice, n)-keyed aggregate
    whose count-distinct expands to the standard two-phase plan; output
    cardinality = slices x |ns|.

    Emits (group, n, n_grams_total, n_grams_distinct, distinct_ratio).
    """
    nss = sorted(set(int(n) for n in ns))
    if not nss or nss[0] < 1:
        raise ValueError(f"ns must be positive ints, got {ns!r}")

    def _apply(df: DataFrame) -> DataFrame:
        # tokens staged as a projected column BEFORE the higher-order
        # transform: HOF lambdas run interpreted (no CSE), so a
        # closure-captured split() re-splits the document per gram
        # position — measured 4.7x on this exact shape (see span_corrupt)
        staged = (df.filter(F.col(text_col).isNotNull())
                  .select(F.col(group_col).alias("group"),
                          F.split(F.col(text_col), " ").alias("_toks")))
        toks = F.col("_toks")
        sz = F.size(toks)

        def grams_for(n):
            # positions 1 .. sz-n+1; empty array when the doc is shorter
            return F.when(
                sz >= n,
                F.transform(
                    F.sequence(F.lit(1), sz - n + 1),
                    lambda i: F.md5(F.array_join(
                        F.slice(toks, i, F.lit(n)), " ")))
            ).otherwise(F.array().cast("array<string>"))

        per_n = F.explode(F.array(*[
            F.struct(F.lit(n).alias("n"), grams_for(n).alias("g"))
            for n in nss]))
        rows = (staged
                .select("group", per_n.alias("_x"))
                .select("group", F.col("_x.n").alias("n"),
                        F.explode("_x.g").alias("_gram")))
        # two-level aggregation instead of count + countDistinct in one
        # agg: the expand form ships every gram occurrence through the
        # shuffle twice, while the (group, n, gram) pre-aggregation
        # map-side-combines repeated grams (boilerplate n-grams repeat
        # massively in a real corpus) and the distinct count falls out of
        # the second, tiny aggregation
        per_gram = (rows.groupBy("group", "n", "_gram")
                    .agg(F.count(F.lit(1)).alias("_c")))
        return (per_gram.groupBy("group", "n")
                .agg(F.sum("_c").alias("n_grams_total"),
                     F.count(F.lit(1)).alias("n_grams_distinct"))
                .withColumn("distinct_ratio",
                            F.round(F.col("n_grams_distinct")
                                    / F.col("n_grams_total"), 6)
                            + F.lit(0.0)))

    return _apply
