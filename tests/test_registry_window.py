"""The driver's per-round correctness window is the FIRST 50 registry
keys. Freeze the intended round-3 window so adding keys to a front
module (or reordering _MODULES) cannot silently displace
never-driver-verified keys out of it. New keys belong in modules BEHIND
the window (see registry._MODULES comment)."""

from __future__ import annotations

from hive_2_spark import registry

# All 50 were never covered by CORRECTNESS_r01/r02 — the point of the
# round-3 rotation. Update deliberately (with a rotation), never as a
# side effect of adding an operator.
_WINDOW_50 = [
    "text_stats", "token_count", "quality_score", "lang_id",
    "fingerprint", "fingerprint_rolling", "text_chunk", "token_pack",
    "pii_redact", "doc_split", "contamination_ngram", "tfidf_top_terms",
    "sample_weighted_mix", "shuffle_train_order", "quality_repetition",
    "quality_dup_ngram_corpus", "quality_lm_score", "bm25_topk",
    "keyword_search_and", "dedup_embedding", "sim_ivf_topk",
    "dedup_clusters", "sample_stratified", "dedup_levenshtein",
    "dedup_keep_best", "dedup_clusters_lsh", "media_features",
    "media_stats", "media_resize", "media_frame_sample",
    "media_phash_dedup", "fn_string", "fn_date", "fn_math", "fn_cond",
    "fn_json", "fn_array", "fn_explode", "cast_ingest",
    "ts_parse_format", "num_format", "bool_verbose", "row_to_json",
    "fill_defaults", "fn_string2", "fn_date2", "fn_hash", "fn_map",
    "fn_try", "fn_array2",
]


def test_first_50_keys_are_the_round3_window():
    assert list(registry.all_queries())[:50] == _WINDOW_50


def test_rows_only_keys_are_deliberate():
    """Every key without an oracle must be on the documented list —
    a forgotten oracle shows up here, not as a silent weaker check."""
    expected = {
        "agg_approx", "agg_sketch_merge", "dedup_minhash_lsh",
        "dedup_simhash", "sim_cosine_lsh", "sim_ivf_topk",
        "fingerprint_rolling", "media_features", "media_phash_dedup",
        # fixpoint k-means: the data-dependent round count is the point
        # of the key and cannot be a fixed SQL unroll; accuracy is
        # gated by tests/test_clustering.py instead
        "cluster_kmeans_converged",
    }
    assert registry.rows_only_keys() == expected
