"""Round-3 session additions: DSIR importance weights, mergeable histogram
quantiles, curriculum ordering."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F


def test_dsir_weights_tilt_toward_target(spark):
    from akka_stream_contrib_spark.functions import dsir_weights
    rows = [
        # target slice: physics-flavored docs
        (1, "quantum field theory lattice gauge symmetry", "en"),
        (2, "quantum gauge lattice field symmetry breaking", "en"),
        # raw-only slice: cooking docs
        (3, "butter flour sugar eggs whisk oven bake", "fr"),
        (4, "oven bake flour butter sugar whisk eggs", "fr"),
        # the docs to score: one in-domain, one off-domain
        (5, "quantum lattice symmetry", "xx"),
        (6, "butter sugar oven", "xx"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: r.logweight for r in df.transform(
        dsir_weights(F.col("lang") == "en", n_buckets=64, k=0.5)).collect()}
    # physics-gram doc must outweigh the cooking-gram doc
    assert out[5] > out[6]
    # target members themselves score high, raw-only members low
    assert min(out[1], out[2]) > max(out[3], out[4])


def test_dsir_weights_gram_count(spark):
    from akka_stream_contrib_spark.functions import dsir_weights
    df = spark.createDataFrame([(1, "a b c", "en")],
                               "doc_id long, text string, lang string")
    r = df.transform(dsir_weights(F.col("lang") == "en")).collect()[0]
    # 3 unigrams + 2 bigrams
    assert r.n_grams == 5


def test_dsir_weights_drops_null_text(spark):
    """NULL-text docs have no grams and no defined weight: they must be
    DROPPED (the explode-based formulation's row semantics), not emitted
    with n_grams=-1 / NULL logweight by the map-side scoring pass."""
    from akka_stream_contrib_spark.functions import dsir_weights
    df = spark.createDataFrame([(1, "a b c", "en"), (2, None, "fr")],
                               "doc_id long, text string, lang string")
    rows = df.transform(dsir_weights(F.col("lang") == "en")).collect()
    assert [r.doc_id for r in rows] == [1]


def test_histogram_quantiles_exact_bins(spark):
    from akka_stream_contrib_spark.functions.sketches import histogram_quantiles
    # 10 values of 5.0 and 10 of 95.0 in [0,100) with 10 bins of width 10:
    # p50 -> rank 10 falls in bin 0 (cum 10), interp = 0 + 10*(0 + 10/10) = 10
    # p90 -> rank 18 falls in bin 9, interp = 90 + 10*(8/10) = 98
    rows = [(i, "a", 5.0) for i in range(10)] + \
           [(i + 10, "a", 95.0) for i in range(10)]
    df = spark.createDataFrame(rows, "i long, k string, value double")
    out = {r.q: r for r in histogram_quantiles(
        df, key="k", value="value", lo=0.0, hi=100.0, n_bins=10,
        qs=(0.5, 0.9)).collect()}
    assert out[0.5].est == 10.0 and out[0.5].n == 20
    assert out[0.9].est == 98.0


def test_histogram_quantiles_clamps_out_of_range(spark):
    from akka_stream_contrib_spark.functions.sketches import histogram_quantiles
    df = spark.createDataFrame([(1, "a", -50.0), (2, "a", 500.0)],
                               "i long, k string, value double")
    out = histogram_quantiles(df, key="k", value="value", lo=0.0, hi=100.0,
                              n_bins=10, qs=(0.5,)).collect()
    # both rows land in the edge bins; the estimate stays within [lo, hi]
    assert len(out) == 1 and 0.0 <= out[0].est <= 100.0


def test_curriculum_order_stages_and_positions(spark):
    from akka_stream_contrib_spark.functions.corpus import curriculum_order
    rows = [(i, float(100 - i)) for i in range(20)]  # doc 0 scores highest
    df = spark.createDataFrame(rows, "doc_id long, score double")
    out = df.transform(curriculum_order(4, F.col("score"))).collect()
    by_stage = Counter(r.stage for r in out)
    assert by_stage == {0: 5, 1: 5, 2: 5, 3: 5}
    # stage 0 = the 5 highest scores = doc_ids 0..4 (descending score order)
    stage0 = {r.doc_id for r in out if r.stage == 0}
    assert stage0 == {0, 1, 2, 3, 4}
    # within each stage the positions are a 1..5 permutation
    for s in range(4):
        assert sorted(r.within_pos for r in out if r.stage == s) == [1, 2, 3, 4, 5]


def test_phash64_nearness_property():
    import numpy as np
    from akka_stream_contrib_spark.functions.multimodal import (
        _dct_matrix, phash64)

    # build images with KNOWN low-frequency content by inverse DCT of a
    # random 8x8 coefficient block (a flat gradient would be degenerate:
    # its AC coefficients sit at ~0, i.e. exactly at the median threshold)
    def img_from_block(seed):
        block = np.random.RandomState(seed).uniform(-300, 300, (8, 8))
        f = np.zeros((32, 32))
        f[:8, :8] = block
        c = _dct_matrix(32)
        return c.T @ f @ c

    a = img_from_block(1)
    noised = a + np.random.RandomState(7).uniform(-6, 6, a.shape)
    b = img_from_block(2)
    h0, h1, h2 = phash64(a), phash64(noised), phash64(b)
    assert bin(h0 ^ h1).count("1") <= 8       # same image + noise: near
    assert bin(h0 ^ h2).count("1") >= 16      # different image: far
    assert 0 <= h0 < (1 << 63)


def test_phash_near_dup_finds_exact_dups_only(spark):
    from akka_stream_contrib_spark.functions.multimodal import (
        media_phash, phash_near_dup)
    rows = [(1, bytearray(b"payload-alpha")), (2, bytearray(b"payload-alpha")),
            (3, bytearray(b"payload-beta")), (4, bytearray(b"payload-gamma"))]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    out = df.transform(media_phash(fake_decode=True)).transform(
        phash_near_dup(radius=4)).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in out] == [(1, 2, 0)]


def test_media_phash_requires_decoder_opt_in(spark):
    import pytest as _pytest
    from akka_stream_contrib_spark.functions.multimodal import media_phash
    df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, media binary")
    with _pytest.raises(Exception):
        df.transform(media_phash(fake_decode=False)).collect()


def test_novelty_score_duplicate_scores_zero(spark):
    from akka_stream_contrib_spark.functions.dedup import novelty_score
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),       # exact dup of doc 1
        (3, "epsilon zeta eta theta iota"),  # all-new content
        (4, "ab"),                           # too short for trigrams: no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in df.transform(novelty_score(n=3)).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].novelty == 1.0 and out[1].n_grams == 2
    assert out[2].novelty == 0.0
    assert out[3].novelty == 1.0 and out[3].n_grams == 3


def test_jaro_winkler_reference_values():
    from akka_stream_contrib_spark.functions.text import jaro_winkler
    # classic Winkler (1990) examples + DuckDB conventions
    assert abs(jaro_winkler("martha", "marhta") - 0.9611111111111111) < 1e-12
    assert abs(jaro_winkler("dixon", "dicksonx") - 0.8133333333333332) < 1e-12
    assert jaro_winkler("same", "same") == 1.0
    assert jaro_winkler("", "") == 0.0          # DuckDB convention
    assert jaro_winkler("abc", "") == 0.0
    assert jaro_winkler("abc", "xyz") == 0.0    # no matches


def test_jaro_winkler_matches_duckdb_on_corpus_pairs():
    import random
    import duckdb
    from akka_stream_contrib_spark.functions.text import jaro_winkler
    words = [r[0] for r in duckdb.sql(
        "select distinct p_name from "
        "'/root/testdata/sf0.001/part.parquet' order by 1").fetchall()]
    random.seed(3)
    pairs = [(random.choice(words), random.choice(words)) for _ in range(500)]
    con = duckdb.connect()
    for a, b in pairs:
        d = con.execute("select jaro_winkler_similarity(?, ?)",
                        [a, b]).fetchone()[0]
        assert abs(jaro_winkler(a, b) - d) < 1e-12, (a, b)


def test_phash64_batch_matches_scalar():
    import numpy as np
    from akka_stream_contrib_spark.functions.multimodal import (
        _fake_pixels, phash64, phash64_batch)
    pix = np.stack([_fake_pixels(f"payload-{i}".encode()) for i in range(40)])
    batch = phash64_batch(pix)
    scalar = [phash64(pix[i]) for i in range(40)]
    assert batch.tolist() == scalar


def test_segment_dedup_keep_first(spark):
    from akka_stream_contrib_spark.functions.corpus import segment_dedup
    rows = [
        (1, "a b c d"),          # two 2-token segments: "a b", "c d"
        (2, "a b x y"),          # "a b" seen in doc 1 -> dropped here
        (3, "a b c d"),          # fully duplicated -> disappears
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in df.transform(
        segment_dedup(seg_tokens=2)).collect()}
    assert set(out) == {1, 2}
    assert out[1].dedup_text == "a b c d" and out[1].n_dropped == 0
    assert out[2].dedup_text == "x y" and out[2].n_kept == 1


def test_cluster_silhouette_separated_clusters_score_high(spark):
    from akka_stream_contrib_spark.functions.clustering import (
        cluster_silhouette)
    rows = []
    for i in range(10):       # tight cluster at (10, 0, ...)
        rows.append((i, [10.0 + 0.01 * i, 0.0, 0.0, 0.0], 0))
    for i in range(10):       # tight cluster at (0, 10, ...)
        rows.append((100 + i, [0.0, 10.0 + 0.01 * i, 0.0, 0.0], 1))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = {r.label: r for r in cluster_silhouette(df).collect()}
    assert out[0].n == 10 and out[1].n == 10
    # well-separated tight clusters -> silhouette near 1
    assert out[0].silhouette > 0.9 and out[1].silhouette > 0.9


def test_cluster_silhouette_mixed_labels_score_low(spark):
    from akka_stream_contrib_spark.functions.clustering import (
        cluster_silhouette)
    # identical point cloud split arbitrarily across two labels:
    # centroids coincide -> a == b -> silhouette ~ 0
    rows = [(i, [float(i % 5), 1.0], i % 2) for i in range(20)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = {r.label: r.silhouette for r in cluster_silhouette(df).collect()}
    assert abs(out[0]) < 0.2 and abs(out[1]) < 0.2


def test_lsh_tune_picks_threshold_matching_banding():
    from akka_stream_contrib_spark.functions.dedup import lsh_tune
    import pytest as _pytest
    # 64 perms, want ~0.5: (16 bands, 4 rows) -> (1/16)^(1/4) = 0.5 exactly
    assert lsh_tune(0.5, 64) == (16, 4)
    # high threshold -> few bands, many rows
    b_hi, r_hi = lsh_tune(0.9, 64)
    b_lo, r_lo = lsh_tune(0.2, 64)
    assert b_hi < b_lo and b_hi * r_hi == 64 and b_lo * r_lo == 64
    with _pytest.raises(ValueError):
        lsh_tune(1.5)


def test_neyman_allocation_favors_high_variance_strata(spark):
    from akka_stream_contrib_spark.functions.corpus import neyman_allocation
    rows = []
    for i in range(100):   # stratum A: constant values -> sigma 0
        rows.append((i, "A", 50.0))
    for i in range(100):   # stratum B: high spread
        rows.append((1000 + i, "B", float(i % 2) * 100.0))
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r.stratum: r for r in df.transform(
        neyman_allocation(50, stratum_col="event_type")).collect()}
    assert out["A"].alloc == 0 and out["A"].n_kept == 0   # zero variance
    assert out["B"].alloc == 50 and out["B"].n_kept == 50
    assert out["B"].kept_id_sum > 0


def test_cluster_silhouette_single_label_is_zero(spark):
    """k=1 degenerate case: no 'other' centroid exists, so b is undefined —
    the conventional silhouette is 0.0, not NULL."""
    from akka_stream_contrib_spark.functions.clustering import (
        cluster_silhouette)
    df = spark.createDataFrame(
        [(i, [float(i), 1.0], 7) for i in range(6)],
        "vec_id long, embedding array<double>, label int")
    rows = cluster_silhouette(df).collect()
    assert len(rows) == 1
    assert rows[0].n == 6
    assert rows[0].silhouette == 0.0


def _ppm_bytes(img: "np.ndarray") -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6) with a comment
    line, exercising the decoder's header handling."""
    import numpy as np
    h, w, _ = img.shape
    header = f"P6\n# test image\n{w} {h}\n255\n".encode()
    return header + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def test_decode_ppm_roundtrip_and_header_parsing():
    import numpy as np

    from akka_stream_contrib_spark.functions.multimodal import decode_ppm
    rgb = np.zeros((4, 5, 3), dtype=np.uint8)
    rgb[..., 0] = 255  # pure red
    gray = decode_ppm(_ppm_bytes(rgb))
    assert gray.shape == (4, 5)
    assert np.allclose(gray, 0.299 * 255)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n0 0 0")  # ASCII PPM is not P6


def test_media_phash_real_ppm_decoder_end_to_end(spark):
    """The pluggable-decoder path on real image bytes: a noised copy of a
    low-frequency image hashes within a few bits; an unrelated image does
    not. Images are built by inverse DCT of a random coefficient block
    (same device as test_phash64_nearness_property — a flat gradient is
    degenerate) and upsampled 2x, which the decoder's block-mean resize
    inverts exactly."""
    import numpy as np

    from akka_stream_contrib_spark.functions.multimodal import (
        _dct_matrix, decode_ppm, media_phash, phash_near_dup)

    def img64(seed):
        block = np.random.RandomState(seed).uniform(-300, 300, (8, 8))
        f = np.zeros((32, 32))
        f[:8, :8] = block
        c = _dct_matrix(32)
        small = c.T @ f @ c
        big = np.kron(small, np.ones((2, 2)))  # 64x64, 2x upsample
        return np.clip(big + 128.0, 0, 255).astype(np.uint8)

    base = img64(1)
    near = np.clip(
        base.astype(float)
        + np.random.RandomState(7).uniform(-6, 6, base.shape),
        0, 255).astype(np.uint8)
    other = img64(2)

    def rgb(g):
        return np.stack([g, g, g], axis=-1)

    rows = [(1, _ppm_bytes(rgb(base))), (2, _ppm_bytes(rgb(near))),
            (3, _ppm_bytes(rgb(other)))]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    hashed = df.transform(media_phash(decoder=decode_ppm))
    hs = {r.doc_id: r.phash for r in hashed.collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(hs[1], hs[2]) <= 4
    assert ham(hs[1], hs[3]) >= 16
    pairs = hashed.transform(phash_near_dup(radius=4)).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}


def test_decode_features_real_ppm_decoder_matches_numpy(spark):
    import numpy as np

    from akka_stream_contrib_spark.functions.multimodal import (
        _pixel_features, decode_ppm, decode_features)

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(48, 40, 3), dtype=np.uint8)
    payload = _ppm_bytes(img)
    df = spark.createDataFrame([(1, payload)], "doc_id long, media binary")
    row = df.transform(decode_features(decoder=decode_ppm)).head()
    expected = _pixel_features(decode_ppm(payload))
    assert len(row.features) == 16
    assert np.allclose(row.features, expected)


def test_media_decode_requires_a_decoder(spark):
    import pytest as _pytest

    from akka_stream_contrib_spark.functions.multimodal import media_phash
    df = spark.createDataFrame([(1, b"xx")], "doc_id long, media binary")
    with _pytest.raises(Exception, match="decoder"):
        df.transform(media_phash()).collect()
