"""The driver's per-round correctness window is the FIRST 50 registry
keys. Freeze the intended round-6 window so adding keys to a front
module (or reordering _MODULES/_FRONT) cannot silently displace
never-driver-verified keys out of it. New keys belong at the TOP of the
window (section (b) of registry._FRONT) while the round is open; after
the round's CORRECTNESS lands, rotate deliberately."""

from __future__ import annotations

import json
from pathlib import Path

from hive_2_spark import registry

# Round-6 window: (a) the 10-key backlog — the 9 round-5 operators
# (never driver-checked) + fingerprint_rolling (its md5-prefix oracle
# replaced the rows-only check in r5 but has never been driver-run) —
# then (b) round-6 additions, then (c) re-verification of the
# oldest-checked keys (latest driver check r1/r2; fixtures regenerated
# twice since), prioritizing float/timestamp rounding boundaries.
# Update deliberately (with a rotation), never as a side effect of
# adding an operator.
_BACKLOG_10 = [
    "sim_pq_topk", "curation_mixture_balance", "event_funnel_windowed",
    "ts_anomaly_mad", "ts_seasonal_decompose", "retrieval_rrf_fusion",
    "agg_quantile_shard_merge", "stream_anomaly_monitor",
    "graph_pagerank_converged", "fingerprint_rolling",
]

# keys added during round 6 — they slot between the backlog and the
# re-verification tail and must stay inside the first 50
_ROUND6_NEW = [
    "token_pack_salted",
    "dedup_incremental_indexed",
    "quality_ngram_census",
    "ts_acf",
    "retrieval_mmr",
    "dedup_time_horizon",
    "skew_report",
    "dedup_prefix_filter",
    "join_bloom_pruned",
    "phrase_search_positional",
    "ts_holt",
    "quality_pmi_bigrams",
    "event_attribution_decay",
    "quality_fk_audit",
    "ts_changepoint",
    "event_audience_overlap",
    "win_session_native",
    "ts_crosscorr",
    "sim_maxsim_topk",
    # upgraded rows-only -> full oracle this round; oracle never driver-run
    "dedup_simhash",
    # second-session additions + the first-session key that landed
    # after the window filled — never driver-checked, so they take
    # window slots ahead of re-verification
    "stream_lateness_report",
    "dedup_paragraph", "curation_repeat_upsample", "retrieval_ndcg",
    "quality_benford", "event_concurrency_peak", "agg_gini",
    "event_cumulative_reach", "event_streaks", "basket_pair_lift",
    "agg_hll_portable", "ts_downsample_lttb", "ts_drift_report",
    "media_scene_cut",
]

_REVERIFY_TAIL = [
    "win_rank", "win_running_sum", "win_range_frame", "win_range_time",
    "win_first_last", "win_ignore_nulls", "win_lag_lead", "win_pct_rank",
    "win_topk_per_group",
    "pricing_summary",
    "agg_percentile", "agg_stats", "agg_corr", "agg_mode", "agg_groupby",
    "agg_distinct", "agg_cube", "agg_rollup", "agg_grouping_sets",
    "agg_listagg", "agg_bitwise", "agg_approx", "agg_sketch_merge",
    "sql_q2_min_cost_supplier", "sql_q3_shipping_priority",
    "sql_q4_order_priority", "sql_q5_nation_volume",
    "sql_q6_forecast_revenue", "sql_q7_binat_volume",
    "sql_q8_market_share", "sql_q10_returned_items",
    "sql_q11_revenue_concentration", "sql_q12_priority_lines",
    "sql_q13_order_distribution", "sql_q14_promo_share",
    "join_range", "sort_multi_key", "topk_nulls_last", "agg_filtered",
]


def test_first_50_keys_are_the_round6_window():
    window = list(registry.all_queries())[:50]
    n_new = len(_ROUND6_NEW)
    expected = (
        _BACKLOG_10
        + _ROUND6_NEW
        + _REVERIFY_TAIL[: 50 - 10 - n_new]
    )
    assert window == expected


def test_backlog_keys_were_never_driver_hash_checked():
    """The 9 round-5 keys must be absent from all prior CORRECTNESS
    reports; fingerprint_rolling may appear (it was driver-run as
    rows-only in r3) but is deliberately re-windowed now that it
    carries a full DuckDB oracle."""
    repo = Path(__file__).resolve().parent.parent
    seen: set[str] = set()
    for p in sorted(repo.glob("CORRECTNESS_r0[12345].json")):
        seen |= set(json.loads(p.read_text()))
    if not seen:  # reports not present in a bare checkout
        return
    rewindowed = {"fingerprint_rolling"}
    overlap = (set(_BACKLOG_10) & seen) - rewindowed
    assert overlap == set(), overlap


def test_rows_only_keys_are_deliberate():
    """Every key without an oracle must be on the documented list —
    a forgotten oracle shows up here, not as a silent weaker check."""
    expected = {
        "agg_approx", "agg_sketch_merge", "dedup_minhash_lsh",
        "media_features", "media_phash_dedup",
        # fixpoint loops: the data-dependent round count is the point
        # of these keys and cannot be a fixed SQL unroll; accuracy is
        # gated by tests/test_clustering.py / tests/test_graph_converged.py
        "cluster_kmeans_converged",
        "graph_pagerank_converged",
        # real RAWV container decode — the media_features barrier;
        # planted-cut recall gated in tests/test_multimodal.py
        "media_scene_cut",
    }
    assert registry.rows_only_keys() == expected
