"""Empty-input robustness: representative operators over a zero-row
dataset must plan and execute cleanly (empty result, no exceptions).
At 100 TB, empty partitions/filters-matching-nothing are routine."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hive_2_spark import registry
from hive_2_spark.catalog import TABLES, table_path
from tests.conftest import SF_DIR

# representative spread: scan/filter/join/agg/window/setop/session/text
KEYS = [
    "pricing_summary",
    "filter_range",
    "join_lookup_one",
    "join_outer",
    "agg_groupby",
    "agg_rollup",
    "win_rank",
    "set_union",
    "stream_session",
    "stream_tumbling",
    "text_stats",
    "dedup_exact",
    "dedup_prefix_filter",
    "topk_limit",
    "validate_rules",
    "text_chunk",
    "token_pack",
    "token_pack_salted",
    "media_frame_sample",
    "win_ignore_nulls",
    "sql_lateral_topk",
    "agg_mode",
    # round-2 additions
    "pii_redact",
    "doc_split",
    "contamination_ngram",
    "tfidf_top_terms",
    "emb_normalize",
    "emb_quantize_int8",
    "stream_interval_join_left",
    "sql_q21_waiting_suppliers",
    "media_features",
    # late round-2 additions (cdc_changes excluded: like insert_rows, its
    # synthesized insert batch is non-empty by construction)
    "ts_interpolate",
    "win_distinct_rolling",
    "agg_bitmap_distinct",
    "agg_incremental_merge",
    "join_interval_binned",
    "dedup_levenshtein",
    "scd2_dimension",
    "pivot_dynamic",
    "fn_explode_outer",
    "fn_from_json",
    "read_binaryfile",
    "quality_repetition",
    "quality_dup_ngram_corpus",
    "bm25_topk",
    "keyword_search_and",
    "shuffle_train_order",
    "catalog_dpp_join",
    "graph_pagerank",
    "stream_upsert_state",
    "quality_lm_score",
    "dedup_keep_best",
    "media_phash_dedup",
    "join_asof_nearest",
    "dedup_clusters_lsh",
    # round-3 additions
    "dedup_containment",
    "dedup_substring_windows",
    "curriculum_order",
    "ts_ewma",
    "ts_anomaly_zscore",
    "event_transitions",
    "graph_triangles",
    "dedup_incremental",
    # round-3 later-session additions
    "cluster_kmeans",
    "cluster_mix_report",
    "quality_entropy",
    "emb_pca_power",
    "emb_whiten",
    "ts_trend",
    "ts_rollup_cascade",
    "event_paths",
    "event_attribution",
    "win_ntile",
    "win_median_rolling",
    "stream_cluster_monitor",
    "cluster_kmeans_converged",
    "ts_forecast_linear",
    "event_cohort_ltv",
    # round-4 additions
    "dedup_url_canonical",
    "curation_domain_filter",
    "sample_source_token_cap",
    "win_global_cumsum",
    "quality_blocklist_words",
    "sample_temperature",
    "token_oov_rate",
    "mv_join_incremental",
    "profile_documents",
    "dedup_token_sort",
    "event_rfm",
    "agg_weighted_median",
    "catalog_view",
    "sim_cosine_topk",
    "sim_cosine_lsh",
    # round-5 additions
    "ts_anomaly_mad",
    "ts_seasonal_decompose",
    "retrieval_rrf_fusion",
    "agg_quantile_shard_merge",
    "stream_anomaly_monitor",
    # event_funnel_windowed excluded: a global census legitimately
    # returns ONE all-zero row on an empty corpus (scalar subqueries)
    "curation_mixture_balance",
    "sim_pq_topk",
    "fingerprint_rolling",
    "graph_pagerank_converged",
    "sim_ivf_topk",
    "agg_weighted_quartiles",
    "win_global_rank",
    "stream_doc_gate",
    # graph_bfs_distance excluded: the source node's literal (dist 0)
    # row survives an empty edge list — 1 row is its correct output
    # curation_funnel excluded: it is a REPORT (one row per stage with
    # survivors=0 on empty input), not a row stream — count() != 0 is
    # its correct empty-input behavior
    # round-6 additions (dedup_prefix_filter already listed above)
    "join_bloom_pruned",
    "phrase_search_positional",
    "ts_holt",
    "ts_changepoint",
    "quality_pmi_bigrams",
    "event_attribution_decay",
    "event_audience_overlap",
    "win_session_native",
    "dedup_time_horizon",
    "retrieval_mmr",
    "ts_acf",
    "sim_maxsim_topk",
    "stream_lateness_report",
    # quality_fk_audit + skew_report excluded: per-edge/per-relation
    # REPORT rows (counts land at 0) are their correct empty output
    # round-6 later-session additions (agg_gini excluded: a global
    # scalar agg legitimately returns ONE null-gini row on empty input)
    "quality_benford",
    "event_concurrency_peak",
    "dedup_paragraph",
    "retrieval_ndcg",
    "curation_repeat_upsample",
    "event_cumulative_reach",
    "event_streaks",
    "basket_pair_lift",
    "agg_hll_portable",
    "ts_downsample_lttb",
    "media_scene_cut",
    "ts_drift_report",
    # round-9 additions
    "curation_split_assign",
    "curation_split_leakage",
    # round-10 additions
    "agg_countmin_portable",
    "text_langid_profile",
    "sample_reservoir",
    "roundtrip_python_datasource",
    "graph_communities_lpa",
    # round-11 additions (read_python_datasource_pushdown excluded like
    # read_python_datasource: its rows are synthesized, not table-read)
    "graph_communities_incremental",
    "agg_kmv_portable",
    "sim_mrl_topk",
    "graph_cc_largestar",
    "event_bot_regularity",
    "layout_rendezvous_shards",
    "event_pattern_match",
    "graph_random_walks",
    # round-12 additions
    "event_pattern_match_within",
    "graph_node2vec_walks",
    "agg_sample_quantile_portable",
    "quality_vocab_zipf",
    "layout_hilbert_curve",
    "curation_soft_dedup_weights",
    "event_markov_stationary",
    # round-13 additions
    "ts_holtwinters",
    "graph_kcore",
    "event_pattern_alternation",
    "graph_hits",
    "agg_winsorized_stats",
    "curation_split_by_family",
    "graph_pagerank_personalized",
    "ts_anomaly_iqr",
    # round-14 additions
    "dedup_index_maintain",
    "text_bpe_merges",
    "text_bpe_apply",
    "graph_scc",
    "event_time_to_convert",
    "read_schema_evolution",
    # read_python_datasource_timetravel / _changes / _compacted
    # excluded: one row per log version / version pair (all-zero on an
    # empty corpus) is their correct output — the same REPORT-shape
    # exclusion as curation_funnel
]


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_empty"))
    for t in TABLES:
        schema = pq.read_schema(table_path(SF_DIR, t))
        pq.write_table(schema.empty_table(), os.path.join(d, f"{t}.parquet"))
    return d


@pytest.mark.parametrize("key", KEYS)
def test_runs_empty(spark, empty_sf_dir, key):
    df = registry.all_queries()[key](spark, empty_sf_dir)
    assert df.count() == 0
