"""Round-7 evaluation/curation family: semantic properties the oracle gate
can't express (identities, extremes, error contracts, diversity-vs-topk)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_js_divergence_identical_is_zero_and_disjoint_is_ln2(spark):
    from akka_stream_contrib_spark.functions.ml import js_divergence
    same = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 4, "item string")
    r = js_divergence(same, same, "item").collect()[0]
    assert r.jsd == 0.0 and r.vocab_union == 2
    p = spark.createDataFrame([("a",), ("b",)], "item string")
    q = spark.createDataFrame([("c",), ("d",)], "item string")
    r = js_divergence(p, q, "item").collect()[0]
    # disjoint supports: JSD = ln 2
    assert r.jsd == round(math.log(2.0), 6)
    assert (r.vocab_p, r.vocab_q, r.vocab_union) == (2, 2, 4)


def test_conditional_entropy_deterministic_and_independent(spark):
    from akka_stream_contrib_spark.functions.ml import conditional_entropy
    # deterministic transition (next fully determined by cur): H(X|C)=0,
    # mutual information = H(X)
    det = spark.createDataFrame(
        [("a", "x")] * 3 + [("b", "y")] * 3, "c string, x string")
    r = conditional_entropy(det, "c", "x").collect()[0]
    assert r.h_next_given_cur == 0.0
    assert r.mutual_info == r.h_next == round(math.log(2.0), 6)
    # independent: knowing cur tells nothing -> MI = 0
    rows = [(c, x) for c in ("a", "b") for x in ("x", "y") for _ in range(5)]
    ind = spark.createDataFrame(rows, "c string, x string")
    r = conditional_entropy(ind, "c", "x").collect()[0]
    assert r.mutual_info == 0.0
    assert r.h_next == r.h_next_given_cur == round(math.log(2.0), 6)
    # NULLs carry no transition evidence
    withnull = spark.createDataFrame(
        [("a", None), (None, "x"), ("a", "x")], "c string, x string")
    assert conditional_entropy(withnull, "c", "x").collect()[0] \
        .n_transitions == 1


def test_gini_concentration_extremes(spark):
    from akka_stream_contrib_spark.functions.quality import gini_concentration
    # perfectly even: G = 0
    even = spark.createDataFrame(
        [(k,) for k in ("a", "b", "c", "d") for _ in range(5)], "k string")
    assert even.transform(gini_concentration("k")).collect()[0].gini == 0.0
    # one key holds nearly everything: G -> (n-1)/n * (1 - eps)
    skew = spark.createDataFrame(
        [("big",)] * 96 + [("s1",), ("s2",), ("s3",), ("s4",)], "k string")
    r = skew.transform(gini_concentration("k")).collect()[0]
    # exact: ranks [1..4]=1, rank5=96 -> G = (2*(1+2+3+4+480) - 6*100)/500
    assert r.gini == round((2 * 490 - 600) / 500, 6)
    assert (r.n_keys, r.total_rows) == (5, 100)


def test_bootstrap_ci_contracts(spark):
    from akka_stream_contrib_spark.functions.ml import bootstrap_ci
    base = spark.createDataFrame(
        [(i, (i * 7) % 50) for i in range(100)], "id long, v long")
    r = bootstrap_ci(base, "v", "id", n=100, b=40).collect()[0]
    assert r.ci_lo <= r.mean_full <= r.ci_hi
    assert r.ci_lo < r.ci_hi  # resample means must actually vary
    # sparse panel ids fail loudly, not silently resample a short panel
    with pytest.raises(ValueError, match="dense"):
        bootstrap_ci(base.filter(F.col("id") % 2 == 0), "v", "id",
                     n=100, b=40).collect()
    with pytest.raises(ValueError, match="trim"):
        bootstrap_ci(base, "v", "id", n=100, b=10, trim=0.001)


def test_average_precision_hand_case(spark):
    from akka_stream_contrib_spark.functions.retrieval import (
        average_precision_at_k,
    )
    # ranking by score desc: rel pattern [1, 0, 1] -> AP = (1/1 + 2/3)/2
    df = spark.createDataFrame(
        [(1, 9.0, 1), (2, 8.0, 0), (3, 7.0, 1)],
        "doc_id long, score double, rel int")
    r = df.transform(average_precision_at_k(k=3)).collect()[0]
    assert r.n_rel == 2
    assert r.ap == round((1.0 + round(2 / 3, 9)) / 2, 6)
    # no relevant hit in top-k -> NULL (try_divide), not NaN
    none = spark.createDataFrame(
        [(1, 9.0, 0)], "doc_id long, score double, rel int")
    assert none.transform(average_precision_at_k(k=3)).collect()[0].ap is None


def test_mmr_select_prefers_diversity_over_redundant_topk(spark):
    from akka_stream_contrib_spark.functions.similarity import mmr_select
    # two near-identical high-relevance vectors + one orthogonal-ish one:
    # plain top-2 picks the twins; diversity-weighted MMR (λ=0.3) picks
    # one twin then the diverse vector (λ=0.7 is relevance-heavy: with
    # sim(c, selected) ≈ rel(c) the objective degenerates to ~4·rel and
    # ranks by relevance — verified by hand on the quantized integers)
    q = [1.0, 0.0, 0.0, 0.0]
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),     # relevance twin A
        (2, [0.999, 0.01, 0.0, 0.0]),  # relevance twin B
        (3, [0.5, 0.0, 0.86, 0.0]),    # less relevant, diverse
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [r.vec_id for r in
           mmr_select(df, q, k=2, shortlist=3,
                      lam_num=3, lam_den=10).collect()]
    assert got == [1, 3]
    # relevance-only degenerates to plain quantized top-k order
    rel_only = [r.vec_id for r in
                mmr_select(df, q, k=3, shortlist=3,
                           lam_num=10, lam_den=10).collect()]
    assert rel_only == [1, 2, 3]
    with pytest.raises(ValueError, match="k <= shortlist"):
        mmr_select(df, q, k=5, shortlist=3)


def test_tokenizer_fertility_hand_case(spark):
    from akka_stream_contrib_spark.functions.text import tokenizer_fertility
    # "internationalization" = ceil(20/4) = 5 tokens / 1 word;
    # "a bc" = 1 + 1 tokens / 2 words
    df = spark.createDataFrame(
        [("de", "internationalization"), ("en", "a bc")],
        "lang string, text string")
    got = {r.lang: (r.total_tokens, r.total_words, r.fertility)
           for r in df.transform(tokenizer_fertility()).collect()}
    assert got == {"de": (5, 1, 5.0), "en": (2, 2, 1.0)}


def test_perplexity_split_equal_count_buckets(spark):
    from akka_stream_contrib_spark.functions.corpus import perplexity_split
    df = spark.createDataFrame(
        [(i, float(-i)) for i in range(6)], "doc_id long, logprob double")
    got = {r.doc_id: r.ppl_bucket
           for r in df.transform(perplexity_split()).collect()}
    # ranking by logprob asc: doc 5 (-5.0) lowest -> bucket 0 (tail)
    assert got == {5: 0, 4: 0, 3: 1, 2: 1, 1: 2, 0: 2}
    with pytest.raises(ValueError, match="n_buckets"):
        df.transform(perplexity_split(n_buckets=0))


def test_rfm_features_hand_case(spark):
    from akka_stream_contrib_spark.functions.ml import rfm_features
    rows = [
        (1, "2024-01-10 08:00:00", 10.50),
        (1, "2024-01-12 09:00:00", None),     # valued NULL: freq yes, mon no
        (2, "2024-01-01 23:00:00", 2.25),
    ]
    df = (spark.createDataFrame(rows, "user_id long, ts string, value double")
          .withColumn("ts", F.to_timestamp("ts")))
    got = {r.user: (r.recency_days, r.frequency, r.monetary, r.n_valued)
           for r in rfm_features(df).collect()}
    # corpus anchor = 2024-01-12
    assert got == {1: (0, 2, 10.5, 1), 2: (11, 1, 2.25, 1)}


def test_degree_assortativity_star_and_regular(spark):
    from akka_stream_contrib_spark.functions.graph import degree_assortativity
    # star K(1,3): hub degree 3 vs leaf degree 1 everywhere -> r = -1
    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long")
    r = degree_assortativity(star).collect()[0]
    assert (r.n_edges, r.assortativity) == (3, -1.0)
    # triangle: degree-regular -> zero variance -> NULL (try_divide),
    # never NaN/inf
    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long")
    r = degree_assortativity(tri).collect()[0]
    assert r.n_edges == 3 and r.assortativity is None


def test_dup_cluster_sizes_internally_consistent(spark):
    import __spark_entry__ as entry
    rows = entry.queries()["dup_cluster_sizes"](
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    total_members = rows[0].total_members
    total_clusters = rows[0].total_clusters
    assert sum(r.cluster_size * r.n_clusters for r in rows) == total_members
    assert sum(r.n_clusters for r in rows) == total_clusters
    assert all(r.removable_docs == total_members - total_clusters
               for r in rows)
    assert all(r.cluster_size >= 2 for r in rows)  # singletons never cluster


def test_global_running_agg_out_collision_replaces(spark):
    """The consolidated multi-column fold must keep the single-column
    form's withColumn REPLACE semantics: `out` naming an existing column
    yields exactly one column of that name (the review found the
    select('*', alias) form appended an ambiguous duplicate)."""
    from akka_stream_contrib_spark.operators import global_running_agg
    df = spark.createDataFrame([(1, 10), (2, 20), (3, 30)],
                               "seq long, v long")
    out = global_running_agg(df, "seq", "v", "v", fn="sum")
    assert out.columns.count("v") == 1
    assert {r.seq: r.v for r in out.select("seq", "v").collect()} \
        == {1: 10, 2: 30, 3: 60}


def test_bootstrap_ci_rejects_duplicate_ids(spark):
    """Duplicates + matching gaps have the right COUNT but wrong support —
    the density check must compare distinct ids too."""
    from akka_stream_contrib_spark.functions.ml import bootstrap_ci
    rows = [(1 if i == 2 else i, i) for i in range(100)]  # id 2 -> dup of 1
    df = spark.createDataFrame(rows, "id long, v long")
    with pytest.raises(ValueError, match="distinct"):
        bootstrap_ci(df, "v", "id", n=100, b=40)


def test_mmr_select_dimension_mismatch_fails_loudly(spark):
    from akka_stream_contrib_spark.functions.similarity import mmr_select
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="dimension"):
        mmr_select(df, [1.0, 0.0], k=1, shortlist=1)
