"""Large-scale training-data-pipeline functions (beyond the reference surface,
per BASELINE.json): text analysis, deduplication, similarity search, and
multimodal column plumbing. All hot paths are JVM-side Column expressions or
Arrow-batched pandas transforms — no row-at-a-time Python."""

from akka_stream_contrib_spark.functions.text import (
    tokens,
    text_stats,
    lang_id,
    token_count_bpe,
    token_entropy,
    doc_fingerprint,
    token_id,
    redact_pii,
    repetition_stats,
    hashed_features,
    bigram_logprob_score,
    pmi_bigrams,
    readability_score,
    normalize_text,
    doc_keywords,
)
from akka_stream_contrib_spark.functions.bpe import (
    bpe_pair_counts,
    bpe_learn_merges,
    bpe_encode,
    bpe_encode_tokens,
    FIXTURE_MERGES,
    word_freq,
)
from akka_stream_contrib_spark.functions.dedup import (
    dedup_exact,
    dedup_keep_best,
    dedup_incremental,
    shingles,
    minhash_signatures,
    lsh_candidate_pairs,
    band_keys,
    minhash_band_table,
    minhash_incremental_dedup,
    minhash_lsh_dedup,
    simhash,
    char_ngrams,
    ngram_jaccard_dedup,
    dup_clusters,
    positional_ngrams,
    duplicate_spans,
    span_dedup,
    edit1_pairs,
    simhash_pairs,
)
from akka_stream_contrib_spark.functions.corpus import (
    contamination_score,
    mixture_weights,
    kfold_split,
    quantile_normalize,
    chunk_documents,
    length_sorted_batches,
    negative_sampling,
    pack_sequences,
    vocab_topk,
    decontaminate,
    train_test_split,
    mixture_sample,
    domain_cap,
    remove_boilerplate,
)
from akka_stream_contrib_spark.functions.retrieval import (
    bm25_topk,
    inverted_index,
    tfidf_topk,
)
from akka_stream_contrib_spark.functions.graph import pagerank, triangle_count
from akka_stream_contrib_spark.functions.ml import (
    logreg_train,
    logreg_predict,
    text_feature_vector,
)
from akka_stream_contrib_spark.functions.clustering import kmeans_assign
from akka_stream_contrib_spark.functions.quality import (
    expect,
    winsorize,
    quality_score,
    gopher_rules,
    skew_report,
)
from akka_stream_contrib_spark.functions.projection import (
    jl_signs,
    rp_project,
    rp_project_sql,
)
from akka_stream_contrib_spark.functions.sketches import (
    hll_sketch_rollup,
    hll_merge,
    mg_heavy_hitters,
    cm_sketch,
    cm_estimate,
    bloom_build,
    bloom_probe,
)
from akka_stream_contrib_spark.functions.similarity import (
    cosine_topk,
    near_dup_pairs,
    ann_topk_all,
    ann_topk_all_ivf,
    ann_lsh_topk,
    ivf_topk,
    ivf_write_index,
    ivf_query_index,
    knn_join,
    quantize_embeddings,
    quantized_cosine_topk,
    pq_train,
    pq_encode,
    pq_topk_adc,
)

__all__ = [
    "tokens", "text_stats", "lang_id", "token_count_bpe", "doc_fingerprint",
    "token_id", "redact_pii", "repetition_stats", "token_entropy",
    "hashed_features", "bigram_logprob_score",
    "bpe_pair_counts", "bpe_learn_merges", "word_freq",
    "bpe_encode", "bpe_encode_tokens", "FIXTURE_MERGES",
    "dedup_exact", "dedup_keep_best", "dedup_incremental", "shingles",
    "minhash_signatures", "lsh_candidate_pairs",
    "minhash_lsh_dedup", "band_keys", "minhash_band_table",
    "minhash_incremental_dedup", "simhash", "char_ngrams", "ngram_jaccard_dedup",
    "positional_ngrams", "duplicate_spans", "span_dedup",
    "edit1_pairs", "simhash_pairs",
    "dup_clusters",
    "cosine_topk", "near_dup_pairs", "ann_topk_all", "ann_topk_all_ivf",
    "ann_lsh_topk", "ivf_topk", "ivf_write_index", "ivf_query_index",
    "knn_join", "quantize_embeddings", "quantized_cosine_topk",
    "chunk_documents", "length_sorted_batches", "negative_sampling", "pack_sequences", "vocab_topk", "decontaminate",
    "domain_cap", "remove_boilerplate",
    "train_test_split", "mixture_sample", "bm25_topk", "inverted_index", "tfidf_topk",
    "pagerank", "triangle_count", "kmeans_assign",
    "logreg_train", "logreg_predict", "text_feature_vector",
    "expect", "winsorize", "quality_score", "gopher_rules",
    "jl_signs", "rp_project", "rp_project_sql", "skew_report",
    "pq_train", "pq_encode", "pq_topk_adc",
    "contamination_score", "mixture_weights", "kfold_split",
    "quantile_normalize",
    "pmi_bigrams", "readability_score", "normalize_text", "doc_keywords",
    "hll_sketch_rollup", "hll_merge",
    "mg_heavy_hitters", "cm_sketch", "cm_estimate",
    "bloom_build", "bloom_probe",
]
