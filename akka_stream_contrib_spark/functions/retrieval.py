"""Lexical retrieval: BM25 keyword scoring over the documents corpus.

Complements the vector family (`functions/similarity.py` — cosine / LSH /
IVF / kNN-join): a training-data pipeline retrieves both ways, embeddings
for semantic neighbors and BM25 for exact-term search (quality filtering,
targeted decontamination, eval-set mining).

Reference anchor: none (the reference's elements are opaque; this extends
the engine along the BASELINE.json mandate like `functions/dedup.py`).

Scale shape (100 TB): two passes over the corpus and nothing else —
  1. one global aggregate producing a SINGLE row of corpus statistics
     (N, total token length, per-term document frequency); partial
     aggregation map-side, one exchange carrying one row per partition;
  2. a broadcast of that row back over the corpus (Catalyst plans the
     1-row cross join as BroadcastNestedLoopJoin — no shuffle), scoring
     each document map-side inside codegen;
then a `TakeOrderedAndProject` top-k (per-partition heaps + driver merge,
no global sort shuffle). Term frequencies are computed with array
higher-order functions on a projected token array — no explode, no
per-term join. For a *many-query* workload the right structure is an
inverted index (explode once, groupBy term) — `inverted_index` below
builds it; `bm25_topk` is the single-query scan form.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def _term_tf(term: str):
    """HOF count of ``term`` in the projected ``_toks`` array (closure, not a
    default-arg lambda: pyspark reads lambda arity to pick the (x) vs (x, i)
    HOF form, so extra params are not allowed)."""
    return F.size(F.filter("_toks", lambda x: x == F.lit(term)))


def _bm25_score(n_terms: int):
    """The BM25 score Column over the (dl, tf0..tfN) + broadcast
    (n, sdl, df0..dfN) columns — ONE expression shape shared by
    ``bm25_topk`` and ``rrf_fusion`` so their oracles stay bit-identical:
    Lucene idf ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always positive),
    ``idf * tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl))`` per term."""
    avgdl = F.col("sdl").cast("double") / F.col("n").cast("double")
    norm = F.lit(K1) * (F.lit(1.0 - B) +
                        F.lit(B) * (F.col("dl").cast("double") / avgdl))
    score = None
    for i in range(n_terms):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n") - F.col(f"df{i}") + F.lit(0.5))
            / (F.col(f"df{i}") + F.lit(0.5)))
        tfd = F.col(f"tf{i}").cast("double")
        part = idf * (tfd * F.lit(K1 + 1.0)) / (tfd + norm)
        score = part if score is None else score + part
    return score


def _tfidf_score(n_terms: int):
    """The TF-IDF score Column over the same frame — shared by
    ``tfidf_topk`` and ``rrf_fusion``: sublinear tf ``(1 + ln(tf))`` for
    tf > 0 else 0, idf ``ln(N / df)`` with a df > 0 guard."""
    score = None
    for i in range(n_terms):
        tfd = F.col(f"tf{i}").cast("double")
        part = F.when(
            (F.col(f"tf{i}") > 0) & (F.col(f"df{i}") > 0),
            (F.lit(1.0) + F.log(tfd))
            * F.log(F.col("n").cast("double")
                    / F.col(f"df{i}").cast("double")),
        ).otherwise(F.lit(0.0))
        score = part if score is None else score + part
    return score


def bm25_topk(terms: Sequence[str], k: int = 20,
              id_col: str = "doc_id", text_col: str = "text",
              ) -> Callable[[DataFrame], DataFrame]:
    """Top-``k`` documents by BM25 score for the bag of query ``terms``.

    Uses the Lucene idf form ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always
    positive). Scores are rounded to 6 dp (`round(x,6) + 0.0` — the
    engine-portable double convention) and ranked by (score DESC, doc_id)
    so the top-k set is deterministic across engines.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")

    def _apply(df: DataFrame) -> DataFrame:
        # project the token array ONCE (HOF lambdas re-evaluate their input
        # expression per element — see functions/text.py perf notes)
        toks = df.select(
            F.col(id_col), F.split(F.col(text_col), " ").alias("_toks")
        ).filter(F.col("_toks").isNotNull())  # NULL text is not a document:
        # counting it in N while it contributes nothing to df/sdl biases
        # idf/avgdl, and its NULL score could pad the top-k
        tf = toks.select(
            F.col(id_col),
            F.size("_toks").alias("dl"),
            *[_term_tf(t).alias(f"tf{i}") for i, t in enumerate(terms)],
        )
        stats = tf.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dl").alias("sdl"),
            *[
                F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
                for i in range(len(terms))
            ],
        )
        scored = tf.crossJoin(F.broadcast(stats))
        score = _bm25_score(len(terms))
        return (scored
                .select(F.col(id_col),
                        (F.round(score, 6) + F.lit(0.0)).alias("score"))
                .orderBy(F.desc("score"), id_col)
                .limit(k))

    return _apply


def inverted_index(id_col: str = "doc_id", text_col: str = "text",
                   ) -> Callable[[DataFrame], DataFrame]:
    """Build the (term, doc_id, tf, dl) posting table — the precomputed
    structure a many-query BM25 workload scores against (one hash shuffle on
    the term; per-term document frequency is then a grouped count, and a
    query becomes a semi-join on its terms instead of a corpus scan).
    """

    def _apply(df: DataFrame) -> DataFrame:
        toks = df.select(
            F.col(id_col), F.split(F.col(text_col), " ").alias("_toks")
        ).filter(F.col("_toks").isNotNull())  # NULL text is not a document:
        # counting it in N while it contributes nothing to df/sdl biases
        # idf/avgdl, and its NULL score could pad the top-k
        return (toks
                .select(id_col, F.size("_toks").alias("dl"),
                        F.explode("_toks").alias("term"))
                .groupBy("term", id_col, "dl")
                .agg(F.count(F.lit(1)).alias("tf")))

    return _apply


def tfidf_topk(terms: Sequence[str], k: int = 20,
               id_col: str = "doc_id", text_col: str = "text",
               ) -> Callable[[DataFrame], DataFrame]:
    """Top-``k`` documents by TF-IDF for the bag of query ``terms`` —
    the classic vector-space complement to ``bm25_topk`` (same two-pass
    scale shape: one single-row stats aggregate broadcast back over the
    scan, then TakeOrderedAndProject).

    Weighting: sublinear tf ``(1 + ln(tf))`` for tf > 0 else 0, idf
    ``ln(N / df)`` (terms absent from the corpus contribute 0 — the
    df > 0 guard keeps the expression total). Scores round(6)+0.0 and
    rank by (score DESC, id) so both engines pick the same set.
    """
    if not terms:
        raise ValueError("tfidf_topk needs at least one query term")

    def _apply(df: DataFrame) -> DataFrame:
        toks = df.select(
            F.col(id_col), F.split(F.col(text_col), " ").alias("_toks")
        ).filter(F.col("_toks").isNotNull())  # NULL text is not a document:
        # counting it in N while it contributes nothing to df/sdl biases
        # idf/avgdl, and its NULL score could pad the top-k
        tf = toks.select(
            F.col(id_col),
            *[_term_tf(t).alias(f"tf{i}") for i, t in enumerate(terms)],
        )
        stats = tf.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
                for i in range(len(terms))
            ],
        )
        scored = tf.crossJoin(F.broadcast(stats))
        score = _tfidf_score(len(terms))
        return (scored
                .select(F.col(id_col),
                        (F.round(score, 6) + F.lit(0.0)).alias("score"))
                .orderBy(F.desc("score"), id_col)
                .limit(k))

    return _apply


def boolean_and_search(terms: Sequence[str], id_col: str = "doc_id",
                       text_col: str = "text"
                       ) -> Callable[[DataFrame], DataFrame]:
    """Conjunctive (AND-semantics) boolean retrieval: documents containing
    EVERY query term, with per-term frequencies — the posting-list
    intersection primitive under any ranked retriever (BM25/TF-IDF rank
    what this selects). Emits (id, tf_<term>..., n_terms_matched) for
    matching docs only.

    Scale shape: the per-term frequency is a pure map-side HOF count over
    the tokenized text (the token array is projected ONCE — see bm25_topk's
    perf note); the AND is a conjunction of ``tf > 0`` predicates pushed
    into the same scan. ZERO shuffles, no explode, no join: at 100 TB this
    is one codegen pass over the corpus.
    """
    if not terms:
        raise ValueError("boolean_and_search needs at least one query term")

    def _tf(term: str):
        return F.size(F.filter("_toks", lambda x: x == F.lit(term)))

    def _apply(df: DataFrame) -> DataFrame:
        toks = df.select(
            F.col(id_col), F.split(F.col(text_col), " ").alias("_toks")
        ).filter(F.col("_toks").isNotNull())  # NULL text is not a document:
        # counting it in N while it contributes nothing to df/sdl biases
        # idf/avgdl, and its NULL score could pad the top-k
        out = toks.select(
            id_col,
            *[_tf(t).alias(f"tf_{i}") for i, t in enumerate(terms)])
        cond = None
        for i in range(len(terms)):
            c = F.col(f"tf_{i}") > 0
            cond = c if cond is None else (cond & c)
        return (out.filter(cond)
                .withColumn("n_terms_matched", F.lit(len(terms))))

    return _apply


def rrf_fusion(terms: Sequence[str], k: int = 20, depth: int = 100,
               rrf_c: int = 60, id_col: str = "doc_id",
               text_col: str = "text") -> Callable[[DataFrame], DataFrame]:
    """Hybrid retrieval via reciprocal-rank fusion (Cormack, Clarke &
    Buettcher 2009): score the corpus with BOTH rankers (BM25 and TF-IDF,
    the same expression shapes as ``bm25_topk`` / ``tfidf_topk``), take each
    ranker's top-``depth`` list, and fuse by
    ``rrf = Σ 1/(rrf_c + rank)`` over the lists the document appears in.
    RRF is the standard way to combine heterogeneous retrievers (lexical +
    semantic) without score calibration — only ranks enter the fusion.

    Emits the fused top-``k``: (id, bm25_rank, tfidf_rank, rrf) with rank 0
    meaning "absent from that ranker's top-``depth``" (avoids NULL-typed
    rank columns) and rrf rounded to 6 dp, ordered ties broken by id.

    Scale shape (100 TB): ONE corpus scan computes the per-term tf columns
    (persisted via ``pipeline_cache`` — two consumers: the single-row stats
    aggregate and the scoring projection); both rankers score from the SAME
    cached frame, so fusing costs no extra pass. Each top-``depth`` is a
    ``TakeOrderedAndProject`` (per-partition heaps, no global sort); the
    rank windows and the full-outer fusion join run over ≤ ``depth`` rows —
    driver-scale, constant in corpus size.
    """
    if not terms:
        raise ValueError("rrf_fusion needs at least one query term")

    def _apply(df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        from akka_stream_contrib_spark.util import (drop_stale_caches,
                                                    pipeline_cache)

        drop_stale_caches()
        toks = df.select(
            F.col(id_col), F.split(F.col(text_col), " ").alias("_toks")
        ).filter(F.col("_toks").isNotNull())  # NULL text is not a document:
        # counting it in N while it contributes nothing to df/sdl biases
        # idf/avgdl, and its NULL score could pad the top-k
        tf = pipeline_cache(toks.select(
            F.col(id_col),
            F.size("_toks").alias("dl"),
            *[_term_tf(t).alias(f"tf{i}") for i, t in enumerate(terms)],
        ))
        stats = tf.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dl").alias("sdl"),
            *[
                F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
                for i in range(len(terms))
            ],
        )
        scored = tf.crossJoin(F.broadcast(stats))
        # the SAME shared score builders as bm25_topk / tfidf_topk — any
        # change to the standalone rankers changes this fusion identically,
        # keeping the bit-identity promise and the rank-replay test honest
        bm25 = _bm25_score(len(terms))
        tfidf = _tfidf_score(len(terms))
        both = scored.select(
            F.col(id_col),
            (F.round(bm25, 6) + F.lit(0.0)).alias("_sb"),
            (F.round(tfidf, 6) + F.lit(0.0)).alias("_st"))
        top_b = both.select(id_col, "_sb").orderBy(
            F.desc("_sb"), id_col).limit(depth)
        top_t = both.select(id_col, "_st").orderBy(
            F.desc("_st"), id_col).limit(depth)
        # rank windows run over the ≤depth-row top lists — single tiny
        # partition by construction (same benign post-limit WindowExec as
        # the post-aggregation windows elsewhere in the repo)
        ra = top_b.select(
            F.col(id_col),
            F.row_number().over(Window.orderBy(F.desc("_sb"), id_col))
            .cast("long").alias("bm25_rank"))
        rb = top_t.select(
            F.col(id_col),
            F.row_number().over(Window.orderBy(F.desc("_st"), id_col))
            .cast("long").alias("tfidf_rank"))
        contrib = (
            lambda r: F.when(r > 0, F.lit(1.0) /
                             (F.lit(float(rrf_c)) + r.cast("double")))
            .otherwise(F.lit(0.0)))
        fused = (ra.join(rb, id_col, "full_outer")
                 .select(F.col(id_col),
                         F.coalesce("bm25_rank", F.lit(0).cast("long"))
                         .alias("bm25_rank"),
                         F.coalesce("tfidf_rank", F.lit(0).cast("long"))
                         .alias("tfidf_rank")))
        return (fused
                .select(id_col, "bm25_rank", "tfidf_rank",
                        (F.round(contrib(F.col("bm25_rank"))
                                 + contrib(F.col("tfidf_rank")), 6)
                         + F.lit(0.0)).alias("rrf"))
                .orderBy(F.desc("rrf"), id_col)
                .limit(k))

    return _apply


def ndcg_weights(k: int) -> list[float]:
    """The nDCG position discounts ``1/log2(i+1)`` for ranks 1..k, rounded
    to 9 dp. Exposed (like ``ewma_weights``) so oracles and tests inject
    the IDENTICAL literals — no cross-engine log in the hot path."""
    import math
    return [round(1.0 / math.log2(i + 1), 9) for i in range(1, k + 1)]


def ndcg_at_k(rel_col: str = "rel", k: int = 10,
              order_by: Sequence[str] | None = None,
              id_col: str = "doc_id",
              ) -> Callable[[DataFrame], DataFrame]:
    """Ranking quality of a scored result list: nDCG@k —
    ``DCG = Σ rel_i / log2(i+1)`` over the top-k by (score desc, id),
    normalized by the ideal ordering's DCG. THE standard graded-relevance
    retrieval metric; pairs with `bm25_topk`/`rrf_fusion` the way `auc_roc`
    pairs with the classifiers.

    Determinism: the discounts are 9-dp python literals (`ndcg_weights`)
    held as exact decimals, relevance grades are integers, so both DCG
    sums are order-independent decimals; ranks tie-break by the full
    ``order_by`` then ``id_col`` (and the ideal ordering by rel desc then
    the same keys), making both permutations engine-identical. One double
    division at the end.

    Scale shape: the top-k cut is TakeOrdered (never a global sort); both
    rank windows run over the ≤k-row result — the same benign post-limit
    WindowExec as `rrf_fusion`. Returns one row (k, dcg, idcg, ndcg).
    """
    order_by = list(order_by) if order_by else ["score"]

    def _apply(df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        ws = ndcg_weights(k)
        order = [F.desc(c) for c in order_by] + [F.col(id_col)]
        top = df.orderBy(*order).limit(k)
        wmap = F.create_map(*[
            F.lit(x) for i, w in enumerate(ws)
            for x in (i + 1, F.lit(w).cast("decimal(18,9)"))])
        rnk = F.row_number().over(Window.orderBy(*order))
        irnk = F.row_number().over(
            Window.orderBy(F.desc(rel_col), *order))
        # rel as a NARROW decimal: long × decimal(18,9) would need
        # precision 39 and Spark trims the scale to fit 38, silently
        # dropping the 9th discount digit; decimal(10,0) × decimal(18,9)
        # stays exact at scale 9
        graded = top.select(
            F.col(rel_col).cast("decimal(10,0)").alias("_rel"),
            rnk.alias("_r"), irnk.alias("_ir"))
        agg = graded.agg(
            F.sum(F.col("_rel") * wmap[F.col("_r")]).alias("_dcg"),
            F.sum(F.col("_rel") * wmap[F.col("_ir")]).alias("_idcg"))
        return agg.select(
            F.lit(k).alias("k"),
            (F.col("_dcg").cast("double") + F.lit(0.0)).alias("dcg"),
            (F.col("_idcg").cast("double") + F.lit(0.0)).alias("idcg"),
            (F.round(F.try_divide(F.col("_dcg").cast("double"),
                                  F.col("_idcg").cast("double")), 6)
             + F.lit(0.0)).alias("ndcg"))

    return _apply


def average_precision_at_k(rel_col: str = "rel", k: int = 10,
                           order_by: Sequence[str] | None = None,
                           id_col: str = "doc_id",
                           ) -> Callable[[DataFrame], DataFrame]:
    """Average Precision at ``k`` over a scored result list with BINARY
    relevance: ``AP@k = (Σ_{i ≤ k, rel_i=1} precision@i) / R_k`` where
    ``R_k`` is the number of relevant hits in the top-k — the
    area-under-PR companion to `ndcg_at_k` (nDCG rewards graded order;
    AP rewards putting every relevant hit early). NULL relevance counts
    as not relevant.

    Determinism: ranks tie-break by ``order_by`` then ``id_col`` exactly
    like `ndcg_at_k`; each precision@i is ONE double division of two
    small exact integers, rounded to 9 dp and summed as decimal; the
    final AP is one try_divide (NULL when the top-k has no relevant hit
    — mirroring DuckDB via an explicit guard, not NaN).

    Scale shape: the top-k cut is TakeOrdered (never a global sort); the
    rank/prefix windows run over the ≤k-row result — the same benign
    post-limit WindowExec as `ndcg_at_k`. Returns one row
    (k, n_rel, ap).

    Reference anchor: none (retrieval-evaluation extension; family of
    ndcg_at_k / rrf_fusion).
    """
    order_by = list(order_by) if order_by else ["score"]

    def _apply(df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        order = [F.desc(c) for c in order_by] + [F.col(id_col)]
        top = df.orderBy(*order).limit(k)
        w = Window.orderBy(*order)
        rel = F.coalesce(F.col(rel_col).cast("int"), F.lit(0))
        ranked = top.select(
            rel.alias("_rel"),
            F.row_number().over(w).alias("_i"),
            F.sum(rel).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("_cum"))
        prec = F.when(
            F.col("_rel") == 1,
            F.round(F.col("_cum").cast("double")
                    / F.col("_i").cast("double"), 9)
        ).otherwise(F.lit(0.0)).cast("decimal(15,9)")
        agg = ranked.agg(F.sum(prec).alias("_sp"),
                         F.sum("_rel").alias("_nrel"))
        return agg.select(
            F.lit(k).alias("k"),
            F.col("_nrel").cast("long").alias("n_rel"),
            (F.round(F.try_divide(F.col("_sp").cast("double"),
                                  F.col("_nrel").cast("double")), 6)
             + F.lit(0.0)).alias("ap"))

    return _apply


def mrr_at_k(rel_col: str = "rel", k: int = 10,
             query_col: str = "query",
             order_by: Sequence[str] | None = None,
             id_col: str = "doc_id",
             ) -> Callable[[DataFrame], DataFrame]:
    """Mean Reciprocal Rank at ``k`` over a MULTI-query result frame with
    binary relevance: per query, ``rr = 1/rank`` of the FIRST relevant hit
    in the top-k (0 if none), averaged over all queries. The navigational
    companion to `ndcg_at_k`/`average_precision_at_k` — those grade the
    whole list, MRR grades only how fast the first right answer appears.

    Determinism: per-query ranks tie-break by ``order_by`` then ``id_col``
    (the ndcg_at_k convention); each reciprocal rank is rounded to 9 dp
    and held as decimal so the cross-query mean is an exact decimal sum
    with ONE double division at the end — order-independent on any
    engine. NULL relevance counts as not relevant.

    Scale shape: callers pass per-query candidate lists (bm25/rrf tops),
    so the per-query rank window runs over bounded ≤depth-row partitions
    keyed by query — a real partitioned window, never a global one. The
    final reduction is a single-row aggregate.

    Returns one row: (n_queries, n_hit, mrr).

    Reference anchor: none (retrieval-evaluation extension; family of
    ndcg_at_k / average_precision_at_k / rrf_fusion).
    """
    order_by = list(order_by) if order_by else ["score"]

    def _apply(df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        order = [F.desc(c) for c in order_by] + [F.col(id_col)]
        w = Window.partitionBy(query_col).orderBy(*order)
        rel = F.coalesce(F.col(rel_col).cast("int"), F.lit(0))
        ranked = (df.select(F.col(query_col).alias("_q"),
                            rel.alias("_rel"),
                            F.row_number().over(w).alias("_i"))
                  .filter(F.col("_i") <= k))
        first = (ranked.groupBy("_q")
                 .agg(F.min(F.when(F.col("_rel") == 1, F.col("_i")))
                      .alias("_fr")))
        rr = F.when(
            F.col("_fr").isNotNull(),
            F.round(F.lit(1.0) / F.col("_fr").cast("double"), 9)
        ).otherwise(F.lit(0.0)).cast("decimal(15,9)")
        agg = first.agg(F.count(F.lit(1)).alias("n_queries"),
                        F.count("_fr").alias("n_hit"),
                        F.sum(rr).alias("_srr"))
        return agg.select(
            "n_queries", "n_hit",
            (F.round(F.try_divide(F.col("_srr").cast("double"),
                                  F.col("n_queries").cast("double")), 6)
             + F.lit(0.0)).alias("mrr"))

    return _apply
