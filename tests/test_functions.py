"""Extension-function invariants: similarity kernels agree with each other,
dedup pipelines find planted duplicates, multimodal plumbing has real schemas
with a stubbed decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from akka_stream_contrib_spark.functions import (
    ann_topk_all,
    cosine_topk,
    dedup_exact,
    minhash_lsh_dedup,
    simhash,
)
from akka_stream_contrib_spark.functions.multimodal import (
    decode_features,
    frame_sample,
    with_media_columns,
)


def vectors_df(spark, n=50, dim=8):
    import numpy as np
    rng = np.random.RandomState(3)
    rows = [(i, rng.uniform(-1, 1, dim).astype("float32").tolist())
            for i in range(n)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_ann_topk_all_agrees_with_single_query_bruteforce(spark):
    df = vectors_df(spark)
    all_topk = ann_topk_all(df, k=5)
    mine = {r.neighbor_id: r.cos_sim for r in
            all_topk.filter(F.col("vec_id") == 7).collect()}
    qvec = df.filter(F.col("vec_id") == 7).head().embedding
    brute = {r.vec_id: r.cos_sim for r in
             cosine_topk(df.filter(F.col("vec_id") != 7), qvec, k=5).collect()}
    assert set(mine) == set(brute)
    for k in mine:
        assert abs(mine[k] - brute[k]) < 1e-5


def test_minhash_lsh_finds_planted_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy")
    other = "completely different text about spark window aggregation " * 6
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id bigint, text string")
    pairs = {(r.doc_a, r.doc_b) for r in
             minhash_lsh_dedup(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_dedup_exact_counts(spark):
    docs = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "unique")], "doc_id bigint, text string")
    rows = {r.canonical_doc_id: r.dup_count
            for r in docs.transform(dedup_exact()).collect()}
    assert rows == {1: 2, 3: 1}


def test_simhash_similar_docs_close_hamming(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    near = base.replace("delta", "delta2")
    far = "one two three four five six seven eight nine ten " * 4
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id bigint, text string")
    h = {r.doc_id: int(r.simhash) for r in docs.transform(simhash()).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(h[1], h[2]) < ham(h[1], h[3])


def test_multimodal_stub_raises_without_fake_decode(spark):
    docs = spark.createDataFrame([(1, "payload", 7)],
                                 "doc_id bigint, text string, n_chars int")
    media = docs.transform(with_media_columns(
        payload=F.col("text").cast("binary"), modality=F.lit("image")))
    with pytest.raises(Exception, match="NotImplementedError|media decoding"):
        media.transform(decode_features(fake_decode=False)).collect()


def test_multimodal_fake_decode_shapes_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, f"payload-{i}", i) for i in range(4)],
        "doc_id bigint, text string, n_chars int")
    media = docs.transform(with_media_columns(
        payload=F.col("text").cast("binary"), modality=F.lit("audio")))
    feats = media.transform(decode_features(fake_decode=True))
    rows = feats.collect()
    assert len(rows) == 4
    assert all(len(r.features) == 16 for r in rows)
    again = {r.doc_id: r.features for r in
             media.transform(decode_features(fake_decode=True)).collect()}
    assert all(again[r.doc_id] == r.features for r in rows)  # deterministic


def test_frame_sample_grid(spark):
    docs = spark.createDataFrame([(1, "vid", 0)],
                                 "doc_id bigint, text string, n_chars int")
    media = docs.transform(with_media_columns(
        payload=F.col("text").cast("binary"), modality=F.lit("video")))
    dur = media.select("media_meta.duration_ms").head()[0]
    frames = media.transform(frame_sample(every_ms=1000)).collect()
    # ceil grid: instants t < duration only (no frame AT the exact end)
    assert len(frames) == (dur + 999) // 1000
    assert sorted(f.frame_ts_ms for f in frames)[:3] == [0, 1000, 2000]


def test_chunk_documents_overlap_and_tail(spark):
    from akka_stream_contrib_spark.functions import chunk_documents

    text = " ".join(f"t{i}" for i in range(100))  # 100 tokens
    docs = spark.createDataFrame([(1, text), (2, "just three tokens")],
                                 "doc_id bigint, text string")
    rows = {(r.doc_id, r.chunk_id): r for r in
            docs.transform(chunk_documents(chunk_size=64, overlap=8)).collect()}
    # doc 1: ceil((100-8)/56) = 2 chunks; chunk 1 starts at token 56 (overlap 8)
    assert (1, 0) in rows and (1, 1) in rows and (1, 2) not in rows
    c0, c1 = rows[(1, 0)], rows[(1, 1)]
    assert c0.n_chunk_tokens == 64 and c0.chunk_text.split(" ")[0] == "t0"
    assert c1.chunk_text.split(" ")[0] == "t56"  # stride = 64 - 8
    assert c1.n_chunk_tokens == 100 - 56  # tail chunk is short, never dropped
    assert c0.chunk_text.split(" ")[-8:] == c1.chunk_text.split(" ")[:8]  # overlap
    # short doc: single whole-document chunk
    assert rows[(2, 0)].chunk_text == "just three tokens"
    with pytest.raises(ValueError):
        chunk_documents(chunk_size=8, overlap=8)


def test_pack_sequences_bin_assignment(spark):
    from akka_stream_contrib_spark.functions import pack_sequences

    mk = lambda i, n: (i, "x " * (n - 1) + "x", "s")
    # token counts 100, 100, 100: doc 3 starts at prefix 200 < 256 -> bin 0
    # doc 4 (prefix 300) -> bin 1
    docs = spark.createDataFrame(
        [mk(1, 100), mk(2, 100), mk(3, 100), mk(4, 50)],
        "doc_id bigint, text string, source string")
    out = {r.bin_id: r for r in
           docs.transform(pack_sequences(budget=256)).collect()}
    assert out[0].n_docs == 3 and out[0].total_tokens == 300  # one-doc overflow
    assert out[1].n_docs == 1 and out[1].total_tokens == 50


def test_dup_clusters_chain_and_clique(spark):
    from akka_stream_contrib_spark.functions import dup_clusters

    # chain 1-2-3-4 (diameter 3), clique {10,11,12}, pair {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        "id_a bigint, id_b bigint")
    got = {r.id: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dup_clusters_long_path_pointer_jump(spark):
    # a 64-node path has diameter 63: pure neighbor-min propagation needs
    # ~63 rounds (> max_iter=30 would raise), while the round-3+ pointer
    # jump (lbl(lbl(x)) in the per-round min) converges in O(log n) rounds
    # — this pins both the convergence speed and the min-label result on
    # the deep-graph path the shallow-clique fixtures never reach
    from akka_stream_contrib_spark.functions import dup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 64)], "id_a bigint, id_b bigint")
    got = {r.id: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert got == {i: 1 for i in range(1, 65)}


def test_redact_pii_synthetic(spark):
    from akka_stream_contrib_spark.functions import redact_pii

    docs = spark.createDataFrame([
        (1, "contact john.doe+x@example.co.uk or +1 (555) 123-4567 today"),
        (2, "no pii here at all"),
        (3, "two mails a@b.io c.d@e.org and line +49 89 123456 78"),
    ], "doc_id bigint, text string")
    got = {r.doc_id: r for r in docs.transform(redact_pii()).collect()}
    assert got[1].n_emails == 1 and got[1].n_phones == 1
    assert "@" not in got[1].redacted_text
    assert "555" not in got[1].redacted_text
    assert got[1].redacted_text.startswith("contact [PII] or ")
    assert got[2].redacted_text == "no pii here at all"
    assert got[2].n_emails == 0 and got[2].n_phones == 0
    assert got[3].n_emails == 2 and got[3].n_phones == 1


def test_repetition_stats_golden(spark):
    from akka_stream_contrib_spark.functions import repetition_stats

    docs = spark.createDataFrame(
        [(1, "spam spam spam eggs"), (2, "a b c d")],
        "doc_id bigint, text string")
    got = {r.doc_id: r for r in docs.transform(repetition_stats()).collect()}
    assert (got[1].n_tokens, got[1].n_distinct_tokens,
            got[1].top_token_freq, got[1].repetition_ratio) == (4, 2, 3, 0.75)
    assert got[2].repetition_ratio == 0.25


def test_bm25_matches_python_model(spark):
    import math
    docs = [
        (1, "spark join window spark spark"),
        (2, "join join filter scan"),
        (3, "window sort merge window window window"),
        (4, "scan filter sort merge"),
        (5, "spark"),
    ]
    terms, k1, b = ["spark", "join", "window"], 1.2, 0.75
    toks = {i: t.split(" ") for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    expect = {}
    for i, tl in toks.items():
        s = 0.0
        for t in terms:
            tf = tl.count(t)
            df_t = sum(1 for v in toks.values() if t in v)
            idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(tl) / avgdl))
        expect[i] = round(s, 6)
    from akka_stream_contrib_spark.functions import bm25_topk
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r.doc_id: r.score for r in df.transform(bm25_topk(terms, k=5)).collect()}
    assert got == pytest.approx(expect, abs=1e-6)
    # ranking: highest score first
    ranked = [r.doc_id for r in df.transform(bm25_topk(terms, k=2)).collect()]
    assert ranked == sorted(expect, key=lambda i: (-expect[i], i))[:2]


def test_mixture_sample_copy_counts(spark):
    from akka_stream_contrib_spark.functions import mixture_sample
    from akka_stream_contrib_spark.functions.text import token_id
    rows = [(i, f"src{i % 4}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    weights = {"src0": 2.5, "src1": 1.0, "src2": 0.25}
    out = df.transform(mixture_sample(weights, default=0.5))
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append(r.copy_id)
    hashes = {r.doc_id: r.h % 10000 for r in
              df.select("doc_id", token_id(F.col("doc_id").cast("string")).alias("h")).collect()}
    for i, src in rows:
        w = weights.get(src, 0.5)
        base = int(w)
        frac_hit = hashes[i] < int(round((w - base) * 10000))
        n_copies = base + (1 if frac_hit else 0)
        copies = sorted(got.get(i, []))
        assert copies == list(range(1, n_copies + 1)), (i, src, w, copies)


def test_train_test_split_deterministic_and_complete(spark):
    from akka_stream_contrib_spark.functions import train_test_split
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id bigint")
    a = {r.doc_id: r.split for r in df.transform(train_test_split((80, 90))).collect()}
    b = {r.doc_id: r.split for r in
         df.repartition(7).transform(train_test_split((80, 90))).collect()}
    assert a == b  # partitioning-independent
    assert set(a.values()) == {"train", "val", "test"}
    frac_train = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.7 < frac_train < 0.9


def test_pagerank_matches_python_model(spark):
    from akka_stream_contrib_spark.functions import pagerank
    edges = [(2, 1), (3, 1), (4, 1), (1, 2), (3, 2)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.id: r.rank for r in pagerank(df, iterations=3, damping=0.85).collect()}

    # python power iteration, same dangling-mass redistribution
    nodes = sorted({u for e in edges for u in e})
    n, d = len(nodes), 0.85
    out = {}
    for s, _ in edges:
        out.setdefault(s, set())
    for s, t in edges:
        out[s].add(t)
    rank = {u: 1.0 / n for u in nodes}
    for _ in range(3):
        dangling = sum(rank[u] for u in nodes if u not in out)
        nxt = {}
        for u in nodes:
            inflow = sum(rank[s] / len(out[s]) for s in out if u in out[s])
            nxt[u] = (1 - d) / n + d * dangling / n + d * inflow
        rank = nxt
    assert set(got) == set(nodes)
    for u in nodes:
        assert got[u] == pytest.approx(rank[u], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_expect_single_pass_and_null_semantics(spark):
    from akka_stream_contrib_spark.functions import expect
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 200.0), (4, -5.0)],
        "id bigint, v double")
    out = {r.check_name: r.n_violations for r in df.transform(expect({
        "v_null": F.col("v").isNull(),
        "v_negative": F.col("v") < 0,
        "v_too_big": F.col("v") > 100,
    })).collect()}
    # NULL predicate rows don't count as violations of range checks
    assert out == {"v_null": 1, "v_negative": 1, "v_too_big": 1}


def test_winsorize_clamps_tails_only(spark):
    from akka_stream_contrib_spark.functions import winsorize
    rows = [(i, "t", float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id bigint, grp string, v double")
    out = df.transform(winsorize("grp", "v", 0.05, 0.95, out_col="w")).collect()
    lo = 1 + 0.05 * 99   # exact interpolated percentiles of 1..100
    hi = 1 + 0.95 * 99
    for r in out:
        assert r.w == pytest.approx(min(max(r.v, round(lo, 6)), round(hi, 6)))
    clamped = [r for r in out if r.w != r.v]
    assert 6 <= len(clamped) <= 12  # ~5% each tail


def test_hll_sketches_merge_exactly_and_estimate_accurately(spark):
    from akka_stream_contrib_spark.functions import hll_merge, hll_sketch_rollup
    rows = [(i % 500, f"d{i % 7}") for i in range(5000)]
    df = spark.createDataFrame(rows, "uid bigint, day string")
    daily = hll_sketch_rollup(df, keys=["day"], item="uid", lgk=12)
    merged = hll_merge(daily, keys=[]).head()
    # mergeability: union of per-day sketches ~ sketch of the whole stream
    # (not bit-identical: DataSketches unions may densify through a different
    # representation than a directly-built sketch)
    whole = (df.agg(F.hll_sketch_estimate(
        F.hll_sketch_agg(F.col("uid"), F.lit(12))).alias("e")).head().e)
    assert abs(merged.approx_distinct - whole) / whole < 0.02
    assert merged.n_buckets == 7
    # accuracy: a few permille at lg_k=12 on 500 distinct
    assert abs(merged.approx_distinct - 500) / 500 < 0.05
    # determinism: the same data always yields the same estimate
    again = hll_merge(hll_sketch_rollup(df.repartition(13), ["day"], "uid", 12),
                      keys=[]).head()
    assert again.approx_distinct == merged.approx_distinct


def test_token_entropy_golden(spark):
    import math
    from akka_stream_contrib_spark.functions import token_entropy
    docs = [
        (1, "a a a a"),          # zero entropy
        (2, "a b c d"),          # max entropy = ln(4)
        (3, "a a b b b c"),      # mixed
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r.doc_id: (r.n_tokens, r.n_distinct_tokens, r.entropy)
           for r in df.transform(token_entropy()).collect()}
    assert got[1] == (4, 1, 0.0)
    assert got[2] == (4, 4, pytest.approx(round(math.log(4), 6)))
    h3 = -(2/6*math.log(2/6) + 3/6*math.log(3/6) + 1/6*math.log(1/6))
    assert got[3][2] == pytest.approx(round(h3, 6), abs=1e-6)


def test_winsorize_approx_swap_close_to_exact(spark):
    """SCALE.md documents approx_percentile as the extreme-cardinality swap
    for winsorize's exact percentiles — pin that the swapped bounds stay
    within the sketch's accuracy envelope."""
    rows = [(i, "t", float(i % 997)) for i in range(20000)]
    df = spark.createDataFrame(rows, "id bigint, grp string, v double")
    exact = df.groupBy("grp").agg(
        F.expr("percentile(v, 0.95)").alias("p")).head().p
    approx = df.groupBy("grp").agg(
        F.expr("approx_percentile(v, 0.95, 10000)").alias("p")).head().p
    assert abs(approx - exact) / exact < 0.01


def test_tfidf_matches_python_model(spark):
    import math
    docs = [
        (1, "spark join window spark spark"),
        (2, "join join filter scan"),
        (3, "window sort merge window window window"),
        (4, "scan filter sort merge"),
        (5, "spark"),
    ]
    terms = ["spark", "join", "window"]
    toks = {i: t.split(" ") for i, t in docs}
    n = len(docs)
    expect = {}
    for i, tl in toks.items():
        s = 0.0
        for t in terms:
            tf = tl.count(t)
            df_t = sum(1 for v in toks.values() if t in v)
            if tf > 0 and df_t > 0:
                s += (1.0 + math.log(tf)) * math.log(n / df_t)
        expect[i] = round(s, 6)
    from akka_stream_contrib_spark.functions import tfidf_topk
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r.doc_id: r.score for r in df.transform(tfidf_topk(terms, k=5)).collect()}
    assert got == pytest.approx(expect, abs=1e-6)
    ranked = [r.doc_id for r in df.transform(tfidf_topk(terms, k=2)).collect()]
    assert ranked == sorted(expect, key=lambda i: (-expect[i], i))[:2]


def test_quantize_embeddings_codes_and_error_bound(spark):
    from akka_stream_contrib_spark.functions import quantize_embeddings
    rows = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [0.003, -0.001, 0.002, 0.004]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector: scale 0, zero codes
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    for r in out.values():
        assert all(-127 <= q <= 127 for q in r.qvec)
    assert out[3].scale == 0.0 and out[3].qvec == [0, 0, 0, 0]
    # max-magnitude component maps to ±127; dequantized error ≤ 0.5/scale
    assert out[1].qvec[0] == 127
    import numpy as np
    for vid, emb in ((1, rows[0][1]), (2, rows[1][1])):
        scale = out[vid].scale
        for orig, q in zip(emb, out[vid].qvec):
            # the stored column is float32 — bound vs the value actually read
            orig32 = float(np.float32(orig))
            assert abs(q / scale - orig32) <= 0.5 / scale + 1e-12


def test_quantized_topk_recall_vs_exact(spark):
    """Int8 quantization must preserve the cosine ranking almost exactly on
    the fixture embeddings: recall@10 ≥ 0.8 vs the exact ranking (the
    quantization trade is ~1e-2 score error at d=64)."""
    from akka_stream_contrib_spark.functions import (
        cosine_topk, quantized_cosine_topk)
    from akka_stream_contrib_spark import tables
    emb = tables.load(spark, "embeddings", "/root/testdata/sf0.001")
    qvec = [((i * 37) % 19 - 9) / 9.0 for i in range(64)]
    exact = {r.vec_id for r in cosine_topk(emb, qvec, k=10).collect()}
    quant = {r.vec_id for r in quantized_cosine_topk(emb, qvec, k=10).collect()}
    assert len(exact & quant) >= 8


def test_mg_heavy_hitters_exact_under_decrement_pressure(spark):
    """Skewed head + long uniform tail with capacity far below the
    cardinality: the MG decrement path runs, and the guaranteed-recoverable
    head (share > 1/(capacity+1)) still comes back exactly."""
    from akka_stream_contrib_spark.functions import mg_heavy_hitters
    rows = []
    for i, n in (("hot_a", 400), ("hot_b", 300), ("hot_c", 200)):
        rows += [(i,)] * n
    rows += [(f"tail{j}",) for j in range(500)]  # 500 singletons
    df = spark.createDataFrame(rows, "item string").repartition(4)
    got = [(r.item, r.cnt) for r in
           mg_heavy_hitters(df, "item", k=3, capacity=16).collect()]
    assert got == [("hot_a", 400), ("hot_b", 300), ("hot_c", 200)]


def test_mg_heavy_hitters_matches_exact_topk_on_corpus(spark):
    from akka_stream_contrib_spark.functions import mg_heavy_hitters
    from akka_stream_contrib_spark import tables
    from pyspark.sql import functions as F
    docs = tables.load(spark, "documents", "/root/testdata/sf0.001")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    got = [(r.token, r.cnt) for r in
           mg_heavy_hitters(toks, "token", k=10, capacity=1024).collect()]
    exact = [(r.token, r.cnt) for r in
             toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
             .orderBy(F.desc("cnt"), "token").limit(10).collect()]
    assert got == exact


def test_dedup_keep_best_keeps_highest_score(spark):
    from akka_stream_contrib_spark.functions import dedup_keep_best
    rows = [(1, "same text", 10), (2, "same text", 50), (3, "same text", 50),
            (4, "other", 7)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, quality int")
    out = {r.doc_id: r.dup_count
           for r in df.transform(dedup_keep_best(F.col("quality"))).collect()}
    # cluster {1,2,3}: quality 50 tie -> lowest id 2 wins; singleton 4 stays
    assert out == {2: 3, 4: 1}


def test_domain_cap_deterministic_and_bounded(spark):
    from akka_stream_contrib_spark.functions import domain_cap
    rows = [(i, "a" if i < 40 else "b") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = df.transform(domain_cap(5, domain_col="source")).collect()
    by_dom: dict[str, list] = {}
    for r in out:
        by_dom.setdefault(r.source, []).append(r.doc_id)
    assert len(by_dom["a"]) == 5 and len(by_dom["b"]) == 5
    again = df.transform(domain_cap(5, domain_col="source")).collect()
    assert sorted((r.source, r.doc_id) for r in out) == \
           sorted((r.source, r.doc_id) for r in again)


def test_remove_boilerplate_strips_frequent_segments_in_order(spark):
    from akka_stream_contrib_spark.functions import remove_boilerplate
    rows = [(1, "cookie banner hello world"), (2, "cookie banner foo"),
            (3, "cookie banner bar baz"), (4, "cookie banner qux")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: (r.clean_text, r.n_kept, r.n_removed)
           for r in df.transform(remove_boilerplate(max_doc_frac=0.5)).collect()}
    # "cookie"/"banner" appear in 4/4 docs (> 50%) -> stripped everywhere,
    # remaining tokens keep their original order
    assert out == {1: ("hello world", 2, 2), 2: ("foo", 1, 2),
                   3: ("bar baz", 2, 2), 4: ("qux", 1, 2)}


def test_dedup_incremental_first_seen_only(spark):
    from akka_stream_contrib_spark.functions import dedup_incremental
    seen = spark.createDataFrame(
        [("old dup",)], "text string").select(F.md5("text").alias("text_hash"))
    new = spark.createDataFrame(
        [(10, "old dup"),      # already in history -> dropped
         (11, "fresh"), (12, "fresh"),   # in-batch dup -> keep lowest id
         (13, "unique")],
        "doc_id bigint, text string")
    out = sorted(r.doc_id for r in dedup_incremental(new, seen).collect())
    assert out == [11, 13]


def test_quality_score_feature_directions(spark):
    from akka_stream_contrib_spark.functions import quality_score
    rows = [(1, "a rich varied vocabulary spreads across many distinct interesting words"),
            (2, "1 2 3 4 5 6 7 8 9 0 1 2 3 4 5 6"),     # numeric soup
            (3, "SHOUTING LOUD CAPS EVERYWHERE ALWAYS YELLING NOISE HERE")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: (r.quality_score, r.keep)
           for r in df.transform(quality_score()).collect()}
    # directional: diverse prose outranks numeric soup and all-caps noise
    assert out[1][0] > out[2][0] and out[1][0] > out[3][0]
    assert out[1][1] is True
    # heavier weights push the numeric doc under the keep threshold
    strict = {r.doc_id: r.keep for r in df.transform(
        quality_score({"digit_ratio": -8.0})).collect()}
    assert strict[1] is True and strict[2] is False


def test_hashed_features_unit_norm_and_no_vocab(spark):
    import math
    from akka_stream_contrib_spark.functions import hashed_features
    df = spark.createDataFrame(
        [(1, "spark spark hash trick"), (2, "one token")],
        "doc_id bigint, text string")
    rows = df.transform(hashed_features(dim=16)).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.bucket < 16
        by_doc.setdefault(r.doc_id, []).append(r.weight)
    for doc, ws in by_doc.items():
        assert math.isclose(sum(w * w for w in ws), 1.0, rel_tol=1e-4)
    # "spark" counted twice -> its bucket outweighs single-count buckets
    assert max(by_doc[1]) > min(by_doc[1])


def test_cm_sketch_never_undercounts_and_merges(spark):
    from akka_stream_contrib_spark.functions import cm_estimate, cm_sketch
    rows = [("a",)] * 50 + [("b",)] * 20 + [(f"noise{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "token string")
    sketch = cm_sketch(df, "token", depth=4, width=32)
    # bounded size: at most depth*width cells
    assert sketch.count() <= 4 * 32
    items = spark.createDataFrame([("a",), ("b",), ("absent",)], "token string")
    est = {r.token: r.est_count for r in
           cm_estimate(sketch, items, "token", depth=4, width=32).collect()}
    # CM property: estimates >= true counts (collisions only inflate)
    assert est["a"] >= 50 and est["b"] >= 20 and est["absent"] >= 0
    # merge = cell-wise sum: sketch(x 2 streams) == 2 * counts lower bound
    from pyspark.sql import functions as F
    merged = (sketch.union(sketch).groupBy("row", "bucket")
              .agg(F.sum("cnt").alias("cnt")))
    est2 = {r.token: r.est_count for r in
            cm_estimate(merged, items, "token", depth=4, width=32).collect()}
    assert est2["a"] == 2 * est["a"] and est2["b"] == 2 * est["b"]


def test_bigram_logprob_discriminates_gibberish(spark):
    from akka_stream_contrib_spark.functions import bigram_logprob_score
    common = "the cat sat on the mat and the cat ran to the mat"
    rows = [(i, common) for i in range(1, 9)]  # common transitions, seen 8x
    rows.append((99, "zx qv jk wp zx qv mn bb cc dd ee ff gg hh ii jj"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r.logprob
           for r in df.transform(bigram_logprob_score()).collect()}
    # frequent transitions score far above one-off gibberish bigrams
    assert out[1] > out[99]
    assert all(out[i] == out[1] for i in range(2, 9))  # identical docs tie


def test_minhash_incremental_flags_near_dup_of_history(spark):
    from akka_stream_contrib_spark.functions import (
        minhash_band_table, minhash_incremental_dedup)
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    hist = spark.createDataFrame([(1, base)], "doc_id bigint, text string")
    new = spark.createDataFrame(
        [(10, base.replace("lazy", "sleepy")),      # near-dup of history
         (11, "entirely different content about spark shuffles and joins " * 5)],
        "doc_id bigint, text string")
    index = minhash_band_table(hist)
    got = {r.doc_id: r.candidate_dup
           for r in minhash_incremental_dedup(new, index).collect()}
    assert got == {10: True, 11: False}


def test_triangle_count_known_graph(spark):
    from akka_stream_contrib_spark.functions import triangle_count
    # K4 on {1,2,3,4} (4 triangles, every pair adjacent) plus a pendant edge
    # and a duplicate/reversed edge to exercise canonicalization.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (2, 1), (3, 3)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    row = triangle_count(df).head()
    assert row.n_triangles == 4
    # K4 under any total order: each vertex of out-degree d contributes
    # C(d,2) wedges; degree-ordered orientation of K4 has out-degrees
    # 3,2,1,0 from the lowest-ranked vertex → 3+1+0+0 = 4 wedges... plus
    # the pendant edge cannot form a wedge pair with w1 < w2 ordering
    # asserted exactly by the model below.
    assert row.n_wedges >= row.n_triangles


def test_triangle_count_no_triangles(spark):
    from akka_stream_contrib_spark.functions import triangle_count
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src bigint, dst bigint")
    row = triangle_count(df).head()
    assert row.n_triangles == 0


def test_kmeans_assign_separated_clusters(spark):
    from akka_stream_contrib_spark.functions import kmeans_assign
    import numpy as np
    rng = np.random.default_rng(7)
    centers = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]])
    rows = []
    for i in range(60):
        c = i % 3
        v = centers[c] + rng.normal(0, 0.3, 2)
        rows.append((i, [float(v[0]), float(v[1])]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = kmeans_assign(df, k=3, iterations=4).collect()
    assert len(out) == 60
    # all members of a ground-truth cluster must share one predicted label
    by_truth = {}
    for r in out:
        by_truth.setdefault(r.vec_id % 3, set()).add(r.cluster)
    assert all(len(s) == 1 for s in by_truth.values())
    assert len({next(iter(s)) for s in by_truth.values()}) == 3
    assert all(r.dist < 2.0 for r in out)


def test_kmeans_assign_portable_round_preserves_assignments(spark):
    """portable_round=6 only quantizes the centroid literals — on separated
    data the cluster memberships (and 6-dp distances) match the unrounded
    loop, and the IVF trainer honors the same flag (unit-norm rounded
    centroids)."""
    import numpy as np

    from akka_stream_contrib_spark.functions import kmeans_assign
    from akka_stream_contrib_spark.functions.similarity import _train_centroids
    rng = np.random.default_rng(11)
    centers = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]])
    rows = []
    for i in range(60):
        v = centers[i % 3] + rng.normal(0, 0.3, 2)
        rows.append((i, [float(v[0]), float(v[1])]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    plain = {r.vec_id: (r.cluster, r.dist)
             for r in kmeans_assign(df, k=3, iterations=4).collect()}
    rounded = {r.vec_id: (r.cluster, r.dist)
               for r in kmeans_assign(df, k=3, iterations=4,
                                      portable_round=6).collect()}
    assert {i: c for i, (c, _) in plain.items()} == \
        {i: c for i, (c, _) in rounded.items()}
    # distances agree to the quantization the rounding introduces
    assert all(abs(plain[i][1] - rounded[i][1]) < 1e-4 for i in plain)
    cents = _train_centroids(df, nlist=3, iters=2, id_col="vec_id",
                             vec_col="embedding", portable_round=6)
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-5)
    assert np.array_equal(cents, np.round(cents, 6))


def test_kmeans_assign_empty_and_validation(spark):
    from akka_stream_contrib_spark.functions import kmeans_assign
    import pytest as _pytest
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    assert kmeans_assign(empty, k=2, iterations=1).count() == 0
    with _pytest.raises(ValueError):
        kmeans_assign(empty, k=0)


def test_pmi_bigrams_model(spark):
    import math
    from akka_stream_contrib_spark.functions import pmi_bigrams
    docs = [(1, "a b a b c"), (2, "a b x y")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {(r.w1, r.w2): (r.c12, r.pmi)
           for r in pmi_bigrams(df, min_count=2, top_n=10).collect()}
    # bigrams: (a,b)x3 (b,a)x1 (b,c)x1 (b,x)x1 (x,y)x1 → N=7
    # heads: a=3, b=3, x=1; tails: b=3, a=1, c=1, x=1, y=1
    assert out[("a", "b")][0] == 3
    assert out[("a", "b")][1] == round(math.log(3 * 7 / (3 * 3)), 6)


def test_readability_scores_model(spark):
    from akka_stream_contrib_spark.functions import readability_score
    df = spark.createDataFrame([(1, "The cat sat. It purred!")],
                               "doc_id bigint, text string")
    r = df.transform(readability_score()).head()
    # words: 5 tokens ("The","cat","sat.","It","purred!"); sentences: 2 runs
    # of [.!?]; vowel groups: e,a,a,i,u,e → 6
    assert (r.n_words, r.n_sentences, r.n_syllables) == (5, 2, 6)
    expected = round(206.835 - 1.015 * 5 / 2 - 84.6 * 6 / 5, 4)
    assert r.flesch == expected


def test_duplicate_spans_marks_non_canonical_copy(spark):
    from akka_stream_contrib_spark.functions import duplicate_spans, span_dedup
    # doc 2 repeats doc 1's opening 6 tokens; k=4 grams at pos 0,1,2 of both
    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [(1, shared + " eta theta"),
         (2, shared + " iota kappa"),
         (3, "wholly unrelated text content here now")],
        "doc_id bigint, text string")
    spans = {(r.doc_id, r.span_start, r.span_end)
             for r in duplicate_spans(docs, k=4).collect()}
    # canonical occurrence (doc 1, pos 0) is kept; doc 2's copy is one
    # merged island covering tokens 0..5
    assert spans == {(2, 0, 5)}
    cleaned = {r.doc_id: (r.clean_text, r.removed_tokens)
               for r in span_dedup(docs, k=4).collect()}
    assert cleaned[1] == (shared + " eta theta", 0)
    assert cleaned[2] == ("iota kappa", 6)
    assert cleaned[3][1] == 0


def test_span_dedup_fully_duplicated_doc_empties(spark):
    from akka_stream_contrib_spark.functions import span_dedup
    t = "one two three four five"
    docs = spark.createDataFrame(
        [(1, t), (2, t)], "doc_id bigint, text string")
    out = {r.doc_id: (r.clean_text, r.removed_tokens)
           for r in span_dedup(docs, k=5).collect()}
    assert out[1] == (t, 0)          # canonical survives
    assert out[2] == ("", 5)         # copy fully removed


def test_duplicate_spans_merges_adjacent_islands(spark):
    from akka_stream_contrib_spark.functions import duplicate_spans
    # two overlapping duplicated 3-gram regions in doc 2 merge to one span
    docs = spark.createDataFrame(
        [(1, "a b c d e x y z"),
         (2, "p q a b c d e r")],
        "doc_id bigint, text string")
    spans = [(r.doc_id, r.span_start, r.span_end)
             for r in duplicate_spans(docs, k=3).collect()]
    assert spans == [(2, 2, 6)]


def test_length_sorted_batches_minimizes_padding(spark):
    from akka_stream_contrib_spark.functions import length_sorted_batches
    # 4 docs of lengths 1,1,5,5; batch_size=2 → length-sorted batching pairs
    # equals (zero waste); any mixed pairing would waste 8 tokens
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b c d e f"), (3, "g"), (4, "h i j k l")],
        "doc_id bigint, text string")
    rows = {r.batch_id: (r.n_docs, r.max_tokens, r.padding_waste)
            for r in docs.transform(length_sorted_batches(batch_size=2)).collect()}
    assert rows == {0: (2, 1, 0), 1: (2, 5, 0)}


def test_negative_sampling_no_self_pairs_and_deterministic(spark):
    from akka_stream_contrib_spark.functions import negative_sampling
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id bigint, text string")
    out1 = sorted((r.doc_id, r.slot, r.neg_doc_id)
                  for r in docs.transform(negative_sampling(k=3)).collect())
    out2 = sorted((r.doc_id, r.slot, r.neg_doc_id)
                  for r in docs.transform(negative_sampling(k=3)).collect())
    assert out1 == out2                      # reproducible, no RNG state
    assert len(out1) == 30                   # k per doc, join loses none
    assert all(d != n for d, _, n in out1)   # self-pairs wrapped away


def test_hll_overlap_estimates_track_exact(spark):
    from akka_stream_contrib_spark.functions import (hll_overlap,
                                                     hll_sketch_rollup)
    # groups with a known overlap structure: a∩b = 50, a∩c = 0
    rows = ([("a", i) for i in range(100)]
            + [("b", i) for i in range(50, 150)]
            + [("c", i) for i in range(200, 260)])
    df = spark.createDataFrame(rows, "grp string, uid long")
    sk = hll_sketch_rollup(df, keys=["grp"], item="uid", lgk=12)
    got = {(r.k_a, r.k_b): r.est_overlap
           for r in hll_overlap(sk, key="grp").collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    # lgk=12 on a few hundred items is near-exact
    assert abs(got[("a", "b")] - 50) < 3
    assert abs(got[("a", "c")]) < 3 and abs(got[("b", "c")]) < 3


def test_histogram_build_split_matches_two_builds(spark):
    # the single-scan tagged form must reproduce two independent
    # histogram_build calls exactly: same (key, bin) row sets per side
    # (only bins with counts), same counts, side-specific value
    # expressions, NULL/NaN rows excluded on the side-selected value
    from pyspark.sql import functions as F

    from akka_stream_contrib_spark.functions import histogram_build
    from akka_stream_contrib_spark.functions.sketches import (
        histogram_build_split)
    rows = [(i, "k%d" % (i % 2), float(v)) for i, v in
            enumerate([3.0, 47.0, 11.0, 999.0, -5.0, 62.0, 5.0, 88.0])]
    rows += [(100, "k0", None), (101, "k1", float("nan"))]
    df = spark.createDataFrame(rows, "id long, key string, value double")
    is_live = F.col("id") % 2 == 1
    live, ref = histogram_build_split(
        df, is_live, key="key", ref_value=F.col("value"),
        live_value=F.col("value") * F.lit(1.1), lo=0.0, hi=100.0, n_bins=10)
    want_ref = histogram_build(
        df.filter(F.col("id") % 2 == 0), key="key", value="value",
        lo=0.0, hi=100.0, n_bins=10)
    want_live = histogram_build(
        df.filter(F.col("id") % 2 == 1)
        .withColumn("value", F.col("value") * F.lit(1.1)),
        key="key", value="value", lo=0.0, hi=100.0, n_bins=10)
    as_set = lambda d: {(r.key, r.bin, r.cnt) for r in d.collect()}  # noqa: E731
    assert as_set(ref) == as_set(want_ref)
    assert as_set(live) == as_set(want_live)
    assert as_set(ref) and as_set(live)      # fixture hits both sides
