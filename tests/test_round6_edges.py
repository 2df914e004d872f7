"""Round-6 adversarial-input hardening: NULL text, duplicate ids,
degenerate strata, invalid band arithmetic (review findings, all fixed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_exact_dedup_family_null_text_never_merges(spark):
    from akka_stream_contrib_spark.functions.dedup import (dedup_exact,
                                                           dedup_incremental,
                                                           dedup_keep_best)
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None), (5, None)],
        "doc_id bigint, text string")
    rep = df.transform(dedup_exact()).collect()
    # 'same' cluster (dup_count 2) + THREE singleton NULL-text clusters —
    # not one 3-doc cluster whose pruning would delete two real documents
    counts = sorted(r.dup_count for r in rep)
    assert counts == [1, 1, 1, 2]
    best = df.transform(dedup_keep_best(F.col("doc_id"))).collect()
    assert {r.doc_id for r in best} == {2, 3, 4, 5}  # max id wins 'same'
    seen = spark.createDataFrame([], "text_hash string")
    fresh = dedup_incremental(df, seen)
    assert {r.doc_id for r in fresh.collect()} == {1, 3, 4, 5}


def test_pair_generators_never_emit_self_pairs_on_duplicate_ids(spark):
    from akka_stream_contrib_spark.functions.dedup import (edit1_pairs,
                                                           ngram_jaccard_dedup,
                                                           simhash_pairs)
    dup_docs = spark.createDataFrame(
        [(7, "the quick brown fox jumps over the lazy dog"),
         (7, "the quick brown fox jumps over the lazy dog"),
         (9, "a completely different document about spark windows")],
        "doc_id bigint, text string")
    nj = ngram_jaccard_dedup(dup_docs, n=4, threshold=0.01, max_doc_freq=50)
    assert all(r.doc_a != r.doc_b for r in nj.collect())
    sh = simhash_pairs(dup_docs, max_hamming=3, bits=32)
    assert all(r.doc_a != r.doc_b for r in sh.collect())
    dup_names = spark.createDataFrame(
        [(7, "abc"), (7, "abd"), (9, "zzz")], "id bigint, name string")
    e1 = edit1_pairs(dup_names, "id", "name")
    assert all(r.id_a != r.id_b for r in e1.collect())


def test_span_dedup_cuts_copy_of_duplicated_row_and_passes_null(spark):
    from akka_stream_contrib_spark.functions.dedup import span_dedup
    text = "w0 w1 w2 w3 w4 w5 w6 w7"  # exactly one 8-gram
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, None)], "doc_id bigint, text string")
    out = {r.doc_id: (r.clean_text, r.removed_tokens)
           for r in span_dedup(df, k=8).collect()}
    # exactly ONE canonical occurrence survives; the copy is fully cut
    # (filter(x != array_min) used to drop BOTH under tied keys when the
    # duplicate was the same doc twice — here ids differ, pin the contract)
    assert out[1] == (text, 0)
    assert out[2] == ("", 8)
    # NULL text passes through: clean '' and removed 0, not NULL/NULL
    assert out[3] == ("", 0)


def test_span_dedup_same_doc_duplicated_rows_cut_one_copy(spark):
    from akka_stream_contrib_spark.functions.dedup import duplicate_spans
    text = "w0 w1 w2 w3 w4 w5 w6 w7"
    df = spark.createDataFrame(
        [(1, text), (1, text)], "doc_id bigint, text string")
    spans = duplicate_spans(df, k=8).collect()
    # two identical (doc_id, pos) occurrences: exactly one is canonical,
    # the other is marked (the tie-filter used to drop both -> no marks)
    assert [(r.doc_id, r.span_start, r.span_end)
            for r in spans] == [(1, 0, 7)]


def test_negative_sampling_rejects_single_doc_corpus(spark):
    from akka_stream_contrib_spark.functions.corpus import negative_sampling
    df = spark.createDataFrame([(1, "only doc")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="at least 2"):
        df.transform(negative_sampling(k=2))


def test_negative_sampling_empty_corpus_is_empty_not_error(spark):
    # 0 docs = no anchors = no pairs; only the 1-doc corpus is poisoned
    from akka_stream_contrib_spark.functions.corpus import negative_sampling
    df = spark.createDataFrame([], "doc_id bigint, text string")
    out = df.transform(negative_sampling(k=2))
    assert out.columns == ["doc_id", "slot", "neg_doc_id"]
    assert out.count() == 0


def test_neyman_degenerate_strata_fall_back_to_proportional(spark):
    from akka_stream_contrib_spark.functions.corpus import neyman_allocation
    # every stratum constant-valued: all sigma 0 -> total weight 0; the
    # NaN path silently allocated 0 everywhere — now proportional
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 5.0), (3, "a", 5.0),
         (4, "b", 7.0)],
        "event_id bigint, event_type string, value double")
    out = {r.stratum: (r.alloc, r.n_kept)
           for r in df.transform(neyman_allocation(4)).collect()}
    assert out["a"][0] == 3 and out["b"][0] == 1
    assert out["a"][1] == 3 and out["b"][1] == 1


def test_band_arithmetic_validation(spark):
    from akka_stream_contrib_spark.functions.dedup import (minhash_band_table,
                                                           minhash_lsh_dedup)
    df = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="divide"):
        minhash_band_table(df, num_hashes=8, bands=3)
    with pytest.raises(ValueError, match="divide"):
        minhash_lsh_dedup(df, num_hashes=8, bands=16)


def test_chunk_pack_retrieval_null_text(spark):
    from akka_stream_contrib_spark.functions.corpus import (chunk_documents,
                                                            pack_sequences)
    from akka_stream_contrib_spark.functions.retrieval import bm25_topk
    df = spark.createDataFrame(
        [(1, "a", "one two three"), (2, "a", None)],
        "doc_id bigint, source string, text string")
    chunks = df.transform(chunk_documents(chunk_size=4, overlap=0)).collect()
    # NULL-text doc yields NO phantom chunk row
    assert {r.doc_id for r in chunks} == {1}
    packs = df.transform(pack_sequences(budget=16)).collect()
    # NULL-text doc counts as 0 tokens but is still a doc in the bin
    assert [(r.n_docs, r.total_tokens) for r in packs] == [(2, 3)]
    hits = df.transform(bm25_topk(["two"], k=5)).collect()
    # NULL-text doc neither scores nor inflates N
    assert [r.doc_id for r in hits] == [1]


def test_winsorize_preserves_null_values(spark):
    from akka_stream_contrib_spark.functions.quality import winsorize
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 5.0), (3, "a", 9.0), (4, "a", None)],
        "event_id bigint, event_type string, value double")
    out = {r.event_id: r.value_wins
           for r in df.transform(
               winsorize("event_type", "value", 0.25, 0.75)).collect()}
    # greatest/least skip NULL args: the un-guarded clamp invented the low
    # bound for a NULL measurement
    assert out[4] is None and out[2] == 5.0


def test_lang_id_null_text_labels_null(spark):
    from akka_stream_contrib_spark.functions.text import lang_id
    df = spark.createDataFrame(
        [(1, "the cat of a hat"), (2, None)], "doc_id bigint, text string")
    out = {r.doc_id: r.predicted_lang
           for r in df.transform(lang_id()).collect()}
    assert out[1] == "en" and out[2] is None  # not a confident 'es'


def test_normalize_text_bare_cr_becomes_space(spark):
    from akka_stream_contrib_spark.functions.text import normalize_text
    df = spark.createDataFrame(
        [(1, "Foo\rBar"), (2, "a\x0bb\x0cc"), (3, "x\x01y")],
        "doc_id bigint, text string")
    out = {r.doc_id: r.norm_text
           for r in df.transform(normalize_text()).collect()}
    # line terminators collapse to spaces (stripping fused 'foobar');
    # true control junk is still deleted
    assert out[1] == "foo bar"
    assert out[2] == "a b c"
    assert out[3] == "xy"


def test_histogram_quantiles_nan_and_q_zero(spark):
    from akka_stream_contrib_spark.functions.sketches import (
        histogram_quantiles)
    rows = [(1, "a", float("nan"))] * 9 + [(10, "a", 500.0)]
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double")
    out = {r.q: r.est for r in histogram_quantiles(
        df, "event_type", qs=(0.0, 0.5)).collect()}
    # NaN rows excluded: n=1 and both quantiles interpolate inside the
    # 500-bin (NaN used to land in bin 0 and drag estimates toward lo);
    # q=0.0 emits a row (rank clamped to 1 — it used to vanish)
    assert set(out) == {0.0, 0.5}
    assert all(400 < v < 520 for v in out.values())


def test_mg_heavy_hitters_excludes_null_items(spark):
    from akka_stream_contrib_spark.functions.sketches import mg_heavy_hitters
    df = spark.createDataFrame(
        [(None,)] * 6 + [("a",)] * 3 + [("b",)],
        "item string")
    out = [r.item for r in mg_heavy_hitters(df, "item", k=2).collect()]
    assert out == ["a", "b"]


def test_decode_ppm_rescales_low_maxval(spark):
    from akka_stream_contrib_spark.functions.multimodal import decode_ppm
    # pure white at maxval=15: every sample is 15 -> must decode to 255 luma
    payload = b"P6 2 1 15\n" + bytes([15] * 6)
    img = decode_ppm(payload)
    assert img.shape == (1, 2)
    assert abs(img[0, 0] - 255.0) < 1e-9


def test_psi_drift_excludes_null_measurements(spark):
    # a NULL value must not form an unmatched NULL bucket on each side
    # (two disjoint PSI-floored rows); shares normalize over non-null rows
    from akka_stream_contrib_spark.functions.ml import psi_drift
    old = spark.createDataFrame([(None,), (10.0,), (200.0,)], "value double")
    new = spark.createDataFrame(
        [(None,), (None,), (15.0,), (900.0,)], "value double")
    rows = psi_drift(old, new).collect()
    assert sorted((r.bucket, r.p, r.q) for r in rows) == [
        (0, 0.5, 0.5), (2, 0.5, 0.0), (9, 0.0, 0.5)]
    assert all(r.bucket is not None for r in rows)


def test_url_parts_registered_domain_and_normalize(spark):
    from akka_stream_contrib_spark.functions.web import (
        normalize_url, registered_domain, with_url_parts)
    df = spark.createDataFrame(
        [(1, "HTTPS://WWW.Sub.Example.COM/A/B?q=1#frag"),
         (2, "http://10.0.0.1:8080/x"),
         (3, "http://localhost/y"),
         (4, "https://example.com/"),
         (5, "not a url at all"),
         (6, None)],
        "id bigint, url string")
    out = {r.id: r for r in
           df.transform(with_url_parts())
             .withColumn("reg", registered_domain(F.col("host")))
             .withColumn("norm", normalize_url(F.col("url"))).collect()}
    # host lowercased; fragment stripped from norm; path case preserved
    assert out[1].host == "www.sub.example.com"
    assert out[1].reg == "example.com"
    assert out[1].norm == "https://www.sub.example.com/A/B?q=1"
    # IP host passes through registered_domain whole (no fake '0.1' site);
    # port stays part of the authority
    assert out[2].host == "10.0.0.1"
    assert out[2].reg == "10.0.0.1"
    # single-label host passes through whole
    assert out[3].reg == "localhost"
    # bare-host trailing slash normalizes away
    assert out[4].norm == "https://example.com"
    # malformed URL -> NULL host is the quarantine signal
    assert out[5].host is None and out[6].host is None


def test_with_url_parts_refuses_to_clobber_existing_columns(spark):
    from akka_stream_contrib_spark.functions.web import with_url_parts
    df = spark.createDataFrame(
        [(1, "https://a.com/x", "edge-7")], "id bigint, url string, host string")
    with pytest.raises(ValueError, match="overwrite existing"):
        df.transform(with_url_parts())


def test_stream_interval_join_coerces_interval_bounds(spark):
    from akka_stream_contrib_spark.streaming import stream_interval_join
    l = spark.createDataFrame([], "k long, lts timestamp")
    r = spark.createDataFrame([], "k long, rts timestamp")
    with pytest.raises(ValueError):  # int('x') -> ValueError at call site
        stream_interval_join(l, r, "k", "lts", "rts",
                             lower_s="0 SECOND) OR (1=1", upper_s=5)


def test_url_query_params_map(spark):
    from akka_stream_contrib_spark.functions.web import with_url_parts
    df = spark.createDataFrame(
        [(1, "https://a.com/p?utm_source=x&q=spark&flag"),
         (2, "https://a.com/p")],
        "id bigint, url string")
    out = {r.id: r for r in df.transform(with_url_parts()).collect()}
    assert out[1].query_params["utm_source"] == "x"
    assert out[1].query_params["q"] == "spark"
    assert "flag" in out[1].query_params  # bare key present, value empty/NULL
    assert out[2].query_params is None    # no query at all
