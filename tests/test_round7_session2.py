"""Round-7 session-2 additions: agreement (Cohen's kappa), uncertainty
ranking (Wilson lower bound), threshold selection (F1 sweep), ranking eval
(MRR), recsys neighbors (item-item CF), link analysis (HITS), graph cores
(k-core peeling), and generation eval (corpus BLEU-2).

Each test pins the semantics against an independent pure-python replica on
a hand-built frame (the oracle gate separately pins the fixture queries
against DuckDB at three SFs)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from akka_stream_contrib_spark.functions.basket import item_cf_topk
from akka_stream_contrib_spark.functions.graph import hits_scores, k_core
from akka_stream_contrib_spark.functions.ml import (
    cohen_kappa,
    f1_threshold_sweep,
    wilson_rank,
)
from akka_stream_contrib_spark.functions.retrieval import mrr_at_k
from akka_stream_contrib_spark.functions.text import bleu2_corpus


# ---------------------------------------------------------------- kappa ---

def test_cohen_kappa_perfect_agreement(spark):
    df = spark.createDataFrame(
        [Row(a=x, b=x) for x in ["p", "q", "p", "r", "q", "p"]])
    r = df.transform(cohen_kappa("a", "b")).head()
    assert r.n == 6 and r.n_agree == 6
    assert r.p_o == 1.0 and r.kappa == 1.0


def test_cohen_kappa_known_value(spark):
    # classic 2x2 worked example: po = 0.7, pe = 0.5 -> kappa = 0.4
    rows = ([("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15)
    df = spark.createDataFrame(rows, "a string, b string")
    r = df.transform(cohen_kappa("a", "b")).head()
    assert r.n == 50 and r.n_agree == 35
    assert r.p_o == pytest.approx(0.7)
    pe = (25 * 30 + 25 * 20) / 50 / 50
    assert r.p_e == pytest.approx(round(pe, 6))
    assert r.kappa == pytest.approx(round((0.7 - pe) / (1 - pe), 6))


def test_cohen_kappa_null_raters_excluded(spark):
    df = spark.createDataFrame(
        [Row(a="x", b="x"), Row(a=None, b="x"), Row(a="x", b=None)])
    r = df.transform(cohen_kappa("a", "b")).head()
    assert r.n == 1 and r.kappa is None  # single cell -> pe = 1 -> NULL


# --------------------------------------------------------------- wilson ---

def _wilson_lb(s: int, n: int, z: float = 1.96) -> float:
    p = s / n
    z2 = z * z
    return ((p + z2 / (2 * n)
             - z * math.sqrt((p * (1 - p) + z2 / (4 * n)) / n))
            / (1 + z2 / n))


def test_wilson_rank_orders_by_lower_bound(spark):
    # 2/2 must rank BELOW 80/100 despite the higher raw rate
    rows = ([Row(g="small", ok=True)] * 2
            + [Row(g="big", ok=True)] * 80 + [Row(g="big", ok=False)] * 20)
    df = spark.createDataFrame(rows)
    out = df.transform(wilson_rank(F.col("ok"), "g", top_k=5,
                                   min_trials=1)).collect()
    assert [r.group for r in out] == ["big", "small"]
    assert out[0].wilson_lb == pytest.approx(round(_wilson_lb(80, 100), 6))
    assert out[1].wilson_lb == pytest.approx(round(_wilson_lb(2, 2), 6))


def test_wilson_rank_min_trials_filter(spark):
    rows = [Row(g="a", ok=True)] * 3 + [Row(g="b", ok=True)] * 10
    df = spark.createDataFrame(rows)
    out = df.transform(wilson_rank(F.col("ok"), "g", min_trials=5)).collect()
    assert [r.group for r in out] == ["b"]


# ------------------------------------------------------------- f1 sweep ---

def test_f1_threshold_sweep_matches_bruteforce(spark):
    rows = [(1, 9.0), (1, 7.0), (0, 7.0), (1, 5.0), (0, 4.0),
            (0, 3.0), (1, 3.0), (0, 1.0)]
    df = spark.createDataFrame(rows, "label int, score double")
    r = df.transform(f1_threshold_sweep()).head()

    # brute force every distinct threshold in python
    best = None
    pos = sum(1 for y, _ in rows if y == 1)
    for t in sorted({s for _, s in rows}):
        tp = sum(1 for y, s in rows if s >= t and y == 1)
        fp = sum(1 for y, s in rows if s >= t and y == 0)
        f1 = round(2 * tp / (tp + fp + pos), 6)
        # ascending iteration keeps the smallest threshold on f1 ties
        if best is None or f1 > best[1]:
            best = (t, f1, tp, fp)
    assert r.threshold == best[0]
    assert r.f1 == pytest.approx(best[1])
    assert (r.tp, r.fp) == (best[2], best[3])
    assert r.fn == pos - best[2]


def test_f1_threshold_sweep_no_positives_is_null(spark):
    df = spark.createDataFrame([(0, 1.0), (0, 2.0)],
                               "label int, score double")
    r = df.transform(f1_threshold_sweep()).head()
    # no positives: recall 0/0 is NULL; f1's denominator is fp alone so
    # the score is a well-defined 0
    assert r.recall is None and r.f1 == 0.0 and r.tp == 0


# ------------------------------------------------------------------ mrr ---

def test_mrr_at_k_known_ranks(spark):
    # q1 first hit at rank 2, q2 at rank 1, q3 no hit in top-3
    rows = [
        ("q1", 1, 9.0, 0), ("q1", 2, 8.0, 1), ("q1", 3, 7.0, 1),
        ("q2", 1, 9.0, 1), ("q2", 2, 8.0, 0),
        ("q3", 1, 9.0, 0), ("q3", 2, 8.0, 0), ("q3", 3, 7.0, 0),
    ]
    df = spark.createDataFrame(rows, "query string, doc_id int,"
                                     " score double, rel int")
    r = df.transform(mrr_at_k(k=3)).head()
    assert r.n_queries == 3 and r.n_hit == 2
    assert r.mrr == pytest.approx(round((0.5 + 1.0 + 0.0) / 3, 6))


def test_mrr_at_k_rank_cut(spark):
    # the only relevant hit sits at rank 4 -> outside k=3 -> rr = 0
    rows = [("q", i, 10.0 - i, 1 if i == 4 else 0) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "query string, doc_id int,"
                                     " score double, rel int")
    r = df.transform(mrr_at_k(k=3)).head()
    assert r.n_hit == 0 and r.mrr == 0.0


# -------------------------------------------------------------- item CF ---

def test_item_cf_topk_cosine_and_mirror(spark):
    # items A,B co-occur in 2 of A's 3 / B's 2 baskets; A,C in 1
    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (3, "C"),
            (4, "C")]
    df = spark.createDataFrame(rows, "b int, i string")
    out = df.transform(item_cf_topk("b", "i", k=5, min_pair_count=1)
                       ).collect()
    got = {(r.item, r.neighbor): (r.n_xy, r.cosine) for r in out}
    assert got[("A", "B")] == (2, round(2 / math.sqrt(3 * 2), 6))
    assert got[("B", "A")] == got[("A", "B")]  # mirrored after counting
    assert got[("A", "C")] == (1, round(1 / math.sqrt(3 * 2), 6))
    # per-item rank: A's best neighbor is B
    ranks = {(r.item, r.rank): r.neighbor for r in out}
    assert ranks[("A", 1)] == "B"


def test_item_cf_topk_respects_k(spark):
    rows = [(b, it) for b in range(4) for it in ["x", "y", "z", "w"]]
    df = spark.createDataFrame(rows, "b int, i string")
    out = df.transform(item_cf_topk("b", "i", k=2, min_pair_count=1)
                       ).collect()
    per = {}
    for r in out:
        per.setdefault(r.item, []).append(r.neighbor)
    assert all(len(v) == 2 for v in per.values())


# ----------------------------------------------------------------- HITS ---

def _hits_python(edges, iters=3):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    hub = {n: 1.0 for n in nodes}
    auth = {}
    for _ in range(iters):
        raw_a = {n: 0.0 for n in nodes}
        for u, v in edges:
            raw_a[v] += hub[u]
        an = sum(raw_a[v] for v in sorted({v for _, v in edges}))
        auth = {n: raw_a[n] / an for n in nodes}
        raw_h = {n: 0.0 for n in nodes}
        for u, v in edges:
            raw_h[u] += auth[v]
        hn = sum(raw_h[u] for u in sorted({u for u, _ in edges}))
        hub = {n: raw_h[n] / hn for n in nodes}
    return hub, auth


def test_hits_scores_match_python_model(spark):
    edges = [(1, 2), (1, 3), (2, 3), (4, 3), (3, 1)]
    df = spark.createDataFrame(edges, "src int, dst int")
    out = {r.id: (r.hub, r.auth) for r in hits_scores(df, 3).collect()}
    hub, auth = _hits_python(edges)
    for n in hub:
        assert out[n][0] == pytest.approx(hub[n], abs=1e-9)
        assert out[n][1] == pytest.approx(auth[n], abs=1e-9)
    # node 3 is the clear authority, node 1 the top hub
    assert max(auth, key=auth.get) == 3
    assert max(hub, key=hub.get) == 1


# --------------------------------------------------------------- k-core ---

def test_k_core_peels_tail(spark):
    # triangle {1,2,3} plus a pendant path 3-4-5: 2-core = the triangle
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src int, dst int")
    out = {r.id: r.degree for r in k_core(df, k=2, rounds=8).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_k_core_cascade_needs_multiple_rounds(spark):
    # a path 1-2-3-4-5-6 with k=2 peels one end pair per round and
    # vanishes entirely — exercises the multi-round cascade
    edges = [(i, i + 1) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "src int, dst int")
    assert k_core(df, k=2, rounds=8).count() == 0


def test_k_core_fixture_converges_within_round_budget(spark):
    """The gate fixture's 8-round bound is a true fixpoint at the test SF:
    extra rounds change nothing (the oracle-equivalence precondition)."""
    import __spark_entry__ as entry
    a = entry.q_k_core(spark, "/root/testdata/sf0.001").collect()
    from akka_stream_contrib_spark.functions.graph import k_core as kc
    from akka_stream_contrib_spark import tables
    ev = tables.load(spark, "events", "/root/testdata/sf0.001")
    b = (kc(entry._interaction_edges(ev), k=3, rounds=12)
         .select(F.col("id").alias("user_id"), "degree", "in_core")
         .orderBy("user_id").collect())
    assert a == b


# ----------------------------------------------------------------- BLEU ---

def test_bleu2_corpus_hand_counts(spark):
    cand = spark.createDataFrame([(1, "the cat sat on the mat")],
                                 "doc_id int, text string")
    ref = spark.createDataFrame([(1, "the cat lay on the mat")],
                                "doc_id int, text string")
    r = cand.transform(bleu2_corpus(ref)).head()
    # unigrams: the(2/2) cat(1) on(1) mat(1) sat(0) -> m1=5, d1=6
    # bigrams: "the cat","on the","the mat" -> m2=3, d2=5
    assert (r.m1, r.d1, r.m2, r.d2) == (5, 6, 3, 5)
    assert r.bp == 1.0  # equal lengths
    expected = math.sqrt((5 / 6) * (3 / 5))
    assert r.bleu2 == pytest.approx(round(expected, 6))


def test_bleu2_corpus_brevity_penalty(spark):
    cand = spark.createDataFrame([(1, "the cat")], "doc_id int, text string")
    ref = spark.createDataFrame([(1, "the cat sat on the mat")],
                                "doc_id int, text string")
    r = cand.transform(bleu2_corpus(ref)).head()
    assert r.bp == pytest.approx(round(math.exp(1 - 6 / 2), 6))
    assert r.p1 == 1.0 and r.p2 == 1.0
    assert r.bleu2 == pytest.approx(round(math.exp(1 - 6 / 2), 6))


def test_bleu2_corpus_unpaired_ids_drop(spark):
    cand = spark.createDataFrame([(1, "a b"), (9, "zz")],
                                 "doc_id int, text string")
    ref = spark.createDataFrame([(1, "a b"), (7, "qq")],
                                "doc_id int, text string")
    r = cand.transform(bleu2_corpus(ref)).head()
    assert r.n_pairs == 1 and r.bleu2 == 1.0


# ------------------------------------------------------------- LPA / BFS ---

def _lpa_python(edges, rounds=2):
    und = set()
    for u, v in edges:
        if u != v:
            und.add((u, v)); und.add((v, u))
    nodes = sorted({a for a, _ in und})
    lab = {n: n for n in nodes}
    for _ in range(rounds):
        new = {}
        for n in nodes:
            votes = {}
            for a, b in und:
                if a == n:
                    votes[lab[b]] = votes.get(lab[b], 0) + 1
            # max count, ties -> smallest label
            new[n] = min(votes, key=lambda l: (-votes[l], l))
        lab = new
    return lab


def test_lpa_communities_matches_python_model(spark):
    # two triangles bridged by one edge: LPA splits them
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    from akka_stream_contrib_spark.functions.graph import lpa_communities
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.id: r.label for r in lpa_communities(df, rounds=2).collect()}
    assert got == _lpa_python(edges, 2)
    # the two triangle cores carry distinct labels
    assert got[1] == got[2] and got[5] == got[6]
    assert got[1] != got[6]


def test_bfs_hops_distances_and_bound(spark):
    from akka_stream_contrib_spark.functions.graph import bfs_hops
    # path 1-2-3-4-5-6-7 plus shortcut 1-4: dist(4)=1, dist(7)=4
    edges = [(i, i + 1) for i in range(1, 7)] + [(1, 4)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.id: r.dist for r in bfs_hops(df, 1, max_hops=4).collect()}
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2, 6: 3, 7: 4}
    # tighter bound drops the tail beyond it
    got2 = {r.id: r.dist for r in bfs_hops(df, 1, max_hops=2).collect()}
    assert got2 == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}


# --------------------------------------------------- active users / PPR ---

def test_rolling_active_users_hand_windows(spark):
    from datetime import datetime
    from akka_stream_contrib_spark.functions.ml import rolling_active_users
    rows = [
        (1, datetime(2024, 3, 1, 10)), (2, datetime(2024, 3, 1, 11)),
        (1, datetime(2024, 3, 2, 9)),
        (3, datetime(2024, 3, 9, 9)),   # 8 days later: outside u2's WAU
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {str(r.day): (r.dau, r.wau, r.mau)
           for r in rolling_active_users(df, wau_days=7, mau_days=28
                                         ).collect()}
    assert got["2024-03-01"] == (2, 2, 2)
    assert got["2024-03-02"] == (1, 2, 2)      # u1 again + trailing u2
    assert got["2024-03-08"] == (0, 1, 2)      # day-2 u1 still in WAU
    assert got["2024-03-09"] == (1, 1, 3)      # u3 active; u1/u2 MAU only
    # a user active twice in a window counts once
    assert got["2024-03-03"] == (0, 2, 2)


def test_rolling_active_users_stickiness_division(spark):
    from datetime import datetime
    from akka_stream_contrib_spark.functions.ml import rolling_active_users
    df = spark.createDataFrame([(1, datetime(2024, 1, 1))],
                               "user_id long, ts timestamp")
    r = rolling_active_users(df).head()
    assert r.dau == 1 and r.mau == 1 and r.stickiness == 1.0


def _ppr_python(edges, seed, iters=3, d=0.85):
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    out = {}
    for u, _ in e:
        out[u] = out.get(u, 0) + 1
    r = {n: (1.0 if n == seed else 0.0) for n in nodes}
    for _ in range(iters):
        m = sum(r[n] for n in nodes if n not in out)
        inflow = {n: 0.0 for n in nodes}
        for u, v in e:
            inflow[v] += r[u] / out[u]
        r = {n: (1.0 if n == seed else 0.0) * ((1.0 - d) + d * m)
             + d * inflow[n] for n in nodes}
    return r


def test_personalized_pagerank_matches_python_model(spark):
    from akka_stream_contrib_spark.functions.graph import (
        personalized_pagerank)
    edges = [(1, 2), (2, 3), (3, 1), (2, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.id: r.rank
           for r in personalized_pagerank(df, 1, iterations=3).collect()}
    want = _ppr_python(edges, 1)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12)
    # mass conservation and seed locality: ranks sum to 1, the seed's
    # neighborhood outranks the far tail
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got[1] > got[5]


# ------------------------------------------------ conformal / forecast ---

def test_split_conformal_quantile_and_coverage(spark):
    from akka_stream_contrib_spark.functions.ml import split_conformal
    # calib scores 1..10 -> k = ceil(11*9/10) = 10 -> q_hat = 10.0
    rows = ([(float(i), True, i) for i in range(1, 11)]
            + [(5.0, False, 100), (10.0, False, 101), (11.0, False, 102)])
    df = spark.createDataFrame(rows, "s double, c boolean, doc_id int")
    r = df.transform(split_conformal("s", "c")).head()
    assert (r.n_calib, r.k, r.q_hat) == (10, 10, 10.0)
    assert (r.n_test, r.n_covered) == (3, 2)  # 5 and 10 covered, 11 not
    assert r.coverage == pytest.approx(round(2 / 3, 6))


def test_split_conformal_k_clamps_to_n(spark):
    from akka_stream_contrib_spark.functions.ml import split_conformal
    rows = [(1.0, True, 1), (2.0, True, 2), (1.5, False, 3)]
    df = spark.createDataFrame(rows, "s double, c boolean, doc_id int")
    r = df.transform(split_conformal("s", "c")).head()
    # ceil(3*9/10) = 3 > n_calib=2 -> clamp to 2 -> q_hat = 2.0
    assert (r.n_calib, r.k, r.q_hat) == (2, 2, 2.0)
    assert r.n_covered == 1


def test_ewma_forecast_eval_matches_python(spark):
    from akka_stream_contrib_spark.operators.timeseries import (
        ewma_forecast_eval, ewma_weights)
    vals = [10.0, 12.0, 11.0, 15.0, 14.0]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id int, event_id int, value double")
    r = df.transform(ewma_forecast_eval(alpha=0.3, depth=8)).head()

    ws = ewma_weights(0.3, 8)
    ew = []
    for i in range(len(vals)):
        num = sum(w * vals[i - j] for j, w in enumerate(ws) if i - j >= 0)
        den = sum(w for j, w in enumerate(ws) if i - j >= 0)
        ew.append(round(num / den, 6))
    es = [round(abs(vals[i] - ew[i - 1]), 9) for i in range(1, len(vals))]
    nes = [round(abs(vals[i] - vals[i - 1]), 9) for i in range(1, len(vals))]
    assert r.n == 4
    assert r.mae == pytest.approx(round(sum(es) / 4, 6))
    assert r.naive_mae == pytest.approx(round(sum(nes) / 4, 6))
    assert r.mase == pytest.approx(round((sum(es) / 4) / (sum(nes) / 4), 6))


def test_ewma_forecast_eval_constant_series_mase_null(spark):
    from akka_stream_contrib_spark.operators.timeseries import (
        ewma_forecast_eval)
    rows = [(1, i, 5.0) for i in range(4)]
    df = spark.createDataFrame(rows, "user_id int, event_id int, value double")
    r = df.transform(ewma_forecast_eval()).head()
    # naive error is all-zero -> MASE undefined -> NULL; MAE exactly 0
    assert r.naive_mae == 0.0 and r.mase is None and r.mae == 0.0


def test_bfs_hops_self_loop_only_source_keeps_dist0(spark):
    from akka_stream_contrib_spark.functions.graph import bfs_hops
    df = spark.createDataFrame([(5, 5)], "src int, dst int")
    got = {r.id: r.dist for r in bfs_hops(df, 5, max_hops=3).collect()}
    assert got == {5: 0}


def test_personalized_pagerank_rejects_absent_seed(spark):
    from akka_stream_contrib_spark.functions.graph import (
        personalized_pagerank)
    df = spark.createDataFrame([(1, 2)], "src int, dst int")
    with pytest.raises(ValueError, match="seed"):
        personalized_pagerank(df, 99)


def test_theil_sen_median_slope_resists_outlier(spark):
    from akka_stream_contrib_spark.operators.timeseries import (
        theil_sen_trend)
    # clean slope 2 with one wild outlier at the end
    rows = [(1, x, 2.0 * x) for x in range(1, 7)] + [(1, 7, 1000.0)]
    df = spark.createDataFrame(rows, "user_id int, event_id int,"
                                     " value double")
    r = df.transform(theil_sen_trend()).head()
    # brute-force median of pairwise slopes in python
    pts = [(x, v) for _, x, v in rows]
    slopes = sorted((vj - vi) / (xj - xi)
                    for i, (xi, vi) in enumerate(pts)
                    for xj, vj in pts[i + 1:])
    k = (len(slopes) + 1) // 2
    assert r.n_points == 7 and r.n_pairs == len(slopes)
    assert r.theil_slope == pytest.approx(round(slopes[k - 1], 6))
    assert r.theil_slope == 2.0  # the outlier cannot move the median


def test_theil_sen_size_guard_excludes_long_series(spark):
    from akka_stream_contrib_spark.operators.timeseries import (
        theil_sen_trend)
    rows = ([(1, x, float(x)) for x in range(10)]
            + [(2, x, float(x)) for x in range(3)])
    df = spark.createDataFrame(rows, "user_id int, event_id int,"
                                     " value double")
    out = df.transform(theil_sen_trend(max_points=5)).collect()
    assert [r.user_id for r in out] == [2]


# ---------------------------------------------------------- adamic-adar ---

def test_adamic_adar_known_small_graph(spark):
    import math

    from akka_stream_contrib_spark.functions.graph import adamic_adar
    # path graph 1-2-3-4 plus edge 2-5: non-adjacent pairs through shared
    # centers: (1,3) via 2 (deg 3), (2,4) via 3 (deg 2), (1,5)/(3,5) via 2
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (2, 5)], "src long, dst long")
    rows = {(r.x, r.y): (r.n_common, r.adamic_adar)
            for r in adamic_adar(edges, top_k=10, max_degree=10).collect()}
    t3 = round(round(1.0 / math.log(3), 9), 6)   # center deg 3
    t2 = round(round(1.0 / math.log(2), 9), 6)   # center deg 2
    assert rows == {(1, 3): (1, t3), (1, 5): (1, t3), (3, 5): (1, t3),
                    (2, 4): (1, t2)}


def test_adamic_adar_excludes_adjacent_and_caps_degree(spark):
    from akka_stream_contrib_spark.functions.graph import adamic_adar
    # triangle 1-2-3: every pair is adjacent -> no predictions at all
    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long")
    assert adamic_adar(tri).count() == 0
    # star center 0 with 5 leaves: max_degree=4 excludes the hub ->
    # no candidate pairs survive the cap
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long")
    assert adamic_adar(star, max_degree=4).count() == 0
    assert adamic_adar(star, max_degree=5).count() == 10  # C(5,2) leaves
