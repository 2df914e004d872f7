"""Market-basket analysis: pairwise association rules over transactions.

The classical co-occurrence miner (support / confidence / lift) applied to
any (basket, item) relation — parts co-ordered in the same order, tags
co-applied to the same document, tools co-invoked in the same session. Not
in the reference (an Akka operator library has no relational analytics);
this is part of the beyond-reference analytics mandate, same family as the
cohort/funnel/retention queries.

Scale shape (r10 posting rewrite): ONE basket-key shuffle collapses each
basket to its sorted distinct-item array; the dedup, the size guard
(``size(_l) <= max_basket_size``) and the quadratic pair fan-out all ride
that single row — pairs are generated IN-ROW by ``pair_fanout_expr`` (the
adamic_adar / ngram-posting discipline), so no join ever materializes the
(basket, x, y) stream and the old self-equi-join's second hash pass of
the item frame is gone (5 exchanges → 3 per operator). Per-basket fanout
is quadratic in basket size, so oversized baskets (a retailer's "test
order" with 1e5 items would emit 5e9 pairs) are EXCLUDED up front by
``max_basket_size`` — documented truncation, loud in the signature, not a
silent cap. Everything downstream is map-combined counting; the final
metrics divide exact integers once.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _basket_postings(df: DataFrame, basket_col: str, item_col: str,
                     max_basket_size: int) -> DataFrame:
    """One row per basket: the sorted distinct-item array (size-guarded).
    collect_set dedups within the basket, array_sort fixes the fan-out
    order, and the size filter is the quadratic-fanout guard — all on the
    single basket-key shuffle both miners share."""
    return (df.select(F.col(basket_col).alias("basket"),
                      F.col(item_col).alias("item"))
            .filter(F.col("basket").isNotNull() & F.col("item").isNotNull())
            .groupBy("basket")
            .agg(F.array_sort(F.collect_set("item")).alias("_l"))
            .filter(F.size("_l") <= max_basket_size))


def association_rules(basket_col: str, item_col: str,
                      min_pair_count: int = 3, top_k: int = 25,
                      max_basket_size: int = 100,
                      ) -> Callable[[DataFrame], DataFrame]:
    """Top-``top_k`` item pairs by lift with their support and confidence.

    For each unordered item pair {x, y} (x < y) co-present in a basket:
    ``support = n_xy / N``, ``confidence = n_xy / n_x`` (x→y), and
    ``lift = n_xy·N / (n_x·n_y)`` — computed from exact counts, products
    held as decimal (two 1e10-count items would overflow an int64
    product), ONE double division each, rounded to 6 dp. Ranking is
    (lift desc, x, y): fully deterministic on any engine.

    Pairs seen in fewer than ``min_pair_count`` baskets are dropped
    (singleton pairs of rare items have unboundedly noisy lift); baskets
    larger than ``max_basket_size`` distinct items are excluded entirely
    (see module docstring).

    Returns (x, y, n_xy, n_x, n_y, support, confidence, lift).
    """
    def _apply(df: DataFrame) -> DataFrame:
        from akka_stream_contrib_spark.functions.dedup import pair_fanout_expr
        from akka_stream_contrib_spark.util import pipeline_cache

        posting = pipeline_cache(_basket_postings(
            df, basket_col, item_col, max_basket_size))
        n_baskets = posting.agg(F.count(F.lit(1)).alias("n_baskets"))
        item_n = posting.select(F.explode("_l").alias("_i")).groupBy("_i") \
            .agg(F.count(F.lit(1)).alias("_n"))
        # in-row pair fan-out over the sorted array (x < y by construction
        # — the same order the old join's `x < y` predicate enforced)
        pairs = (posting.filter(F.size("_l") >= 2)
                 .select(F.explode(
                     F.expr(pair_fanout_expr("x", "y"))).alias("_p"))
                 .select("_p.x", "_p.y")
                 .groupBy("x", "y").agg(F.count(F.lit(1)).alias("n_xy"))
                 .filter(F.col("n_xy") >= min_pair_count))
        nx = item_n.select(F.col("_i").alias("_ix"), F.col("_n").alias("n_x"))
        ny = item_n.select(F.col("_i").alias("_iy"), F.col("_n").alias("n_y"))
        j = (pairs.join(nx, F.col("x") == F.col("_ix"))
             .join(ny, F.col("y") == F.col("_iy"))
             .crossJoin(F.broadcast(n_baskets)))
        dec = "decimal(19,0)"
        lift = (F.col("n_xy").cast(dec) * F.col("n_baskets")).cast("double") \
            / (F.col("n_x").cast(dec) * F.col("n_y")).cast("double")
        return (j.select(
            "x", "y", "n_xy", "n_x", "n_y",
            (F.round(F.col("n_xy").cast("double")
                     / F.col("n_baskets").cast("double"), 6) + F.lit(0.0))
            .alias("support"),
            (F.round(F.col("n_xy").cast("double")
                     / F.col("n_x").cast("double"), 6) + F.lit(0.0))
            .alias("confidence"),
            (F.round(lift, 6) + F.lit(0.0)).alias("lift"))
            .orderBy(F.desc("lift"), "x", "y")
            .limit(top_k))

    return _apply


def item_cf_topk(basket_col: str, item_col: str, k: int = 5,
                 min_pair_count: int = 3, max_basket_size: int = 100,
                 ) -> Callable[[DataFrame], DataFrame]:
    """Item-item collaborative filtering: for every item, the top-``k``
    co-consumed neighbors by cosine similarity over the binary
    basket-item matrix — ``cos(x,y) = n_xy / √(n_x·n_y)`` (Sarwar et al.
    2001, WWW: "Item-Based Collaborative Filtering Recommendation
    Algorithms"). The "users who bought X also bought Y" primitive;
    `association_rules` ranks GLOBAL pairs by lift, this builds the
    PER-ITEM neighbor lists a recommender serves.

    Scale shape (shared with association_rules — the r10 posting form):
    one basket-key shuffle collapses each basket to its sorted distinct
    item array (oversized baskets excluded in the same pass — the
    quadratic-fanout guard), and pairs are generated IN-ROW by
    ``pair_fanout_expr``, counts map-combined: no basket self-join ever
    materializes. Pairs materialize once as x < y and are mirrored to
    both directions AFTER counting (half the fan-out). The per-item
    top-k is a rank window partitioned by item over the min-count-pruned
    pair frame — bounded fan-in per item, never a global window.

    Determinism: counts are exact integers; the count product is decimal
    (int64-overflow guard); cosine is ONE double division of a sqrt of
    that exact product — engine-identical; ranking ties break (cosine
    desc, neighbor asc).

    Returns (item, neighbor, n_xy, cosine, rank) — ≤ k rows per item.

    Reference anchor: none (recsys/analytics extension; family of
    association_rules).
    """
    def _apply(df: DataFrame) -> DataFrame:
        from akka_stream_contrib_spark.functions.dedup import pair_fanout_expr
        from akka_stream_contrib_spark.util import pipeline_cache

        posting = pipeline_cache(_basket_postings(
            df, basket_col, item_col, max_basket_size))
        item_n = posting.select(F.explode("_l").alias("_i")).groupBy("_i") \
            .agg(F.count(F.lit(1)).alias("_n"))
        pairs = (posting.filter(F.size("_l") >= 2)
                 .select(F.explode(
                     F.expr(pair_fanout_expr("x", "y"))).alias("_p"))
                 .select("_p.x", "_p.y")
                 .groupBy("x", "y").agg(F.count(F.lit(1)).alias("n_xy"))
                 .filter(F.col("n_xy") >= min_pair_count))
        # mirror to both directions AFTER counting: each unordered pair
        # was joined and counted once
        both = pairs.unionByName(
            pairs.select(F.col("y").alias("x"), F.col("x").alias("y"),
                         "n_xy"))
        nx = item_n.select(F.col("_i").alias("_ix"), F.col("_n").alias("n_x"))
        ny = item_n.select(F.col("_i").alias("_iy"), F.col("_n").alias("n_y"))
        dec = "decimal(19,0)"
        cos = (F.col("n_xy").cast("double")
               / F.sqrt((F.col("n_x").cast(dec) * F.col("n_y"))
                        .cast("double")))
        scored = (both.join(nx, F.col("x") == F.col("_ix"))
                  .join(ny, F.col("y") == F.col("_iy"))
                  .select(F.col("x").alias("item"),
                          F.col("y").alias("neighbor"),
                          "n_xy",
                          (F.round(cos, 6) + F.lit(0.0)).alias("cosine")))
        w = Window.partitionBy("item").orderBy(
            F.desc("cosine"), "neighbor")
        return (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .orderBy("item", "rank"))

    return _apply
