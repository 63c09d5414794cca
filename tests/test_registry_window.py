"""The driver's per-round correctness window is the FIRST 50 registry
keys. Freeze the intended round-5 window so adding keys to a front
module (or reordering _MODULES/_FRONT) cannot silently displace
never-driver-verified keys out of it. New keys belong BEHIND the window
(see registry._FRONT comment)."""

from __future__ import annotations

import json
from pathlib import Path

from hive_2_spark import registry

# Round-5 window: exactly the 48 keys never inside any r1-r4 driver
# window, plus the two similarity keys whose oracles were upgraded to
# full DuckDB replays in round 4 (the driver has only ever rows-checked
# them). After this round every registry key has been proven by the
# hard signal at least once. Update deliberately (with a rotation),
# never as a side effect of adding an operator.
_WINDOW_50 = [
    "fn_lambda", "fn_variant", "fn_binary", "fn_url", "fn_explode_outer",
    "fn_from_json",
    "curation_funnel", "dedup_clusters_semantic", "curriculum_order",
    "quality_entropy", "emb_pca_power", "emb_whiten",
    "pivot_wide", "unpivot_long", "pivot_dynamic",
    "join_salted", "agg_salted",
    "zorder_layout", "compact_small_files", "catalog_bucketed_join",
    "agg_histogram", "profile_orders", "quality_expectations",
    "set_union_by_name", "set_union_all", "set_intersect", "set_except",
    "set_intersect_all",
    "agg_bitmap_distinct", "agg_incremental_merge",
    "win_ntile", "win_distinct_rolling",
    "token_oov_rate", "sample_source_token_cap", "sample_temperature",
    "quality_blocklist_words", "dedup_url_canonical",
    "curation_domain_filter", "mv_join_incremental", "profile_documents",
    "agg_weighted_median", "agg_weighted_quartiles",
    "win_global_cumsum", "win_global_rank",
    "catalog_view", "stream_doc_gate", "dedup_token_sort", "event_rfm",
    "sim_cosine_lsh", "sim_ivf_topk",
]


def test_first_50_keys_are_the_round5_window():
    assert list(registry.all_queries())[:50] == _WINDOW_50


def test_window_is_never_driver_hash_checked():
    """Every window key must be absent from all prior CORRECTNESS
    reports — except sim_cosine_lsh / sim_ivf_topk, which appeared in
    r2/r3 windows as rows-only keys and are deliberately re-windowed
    now that they carry full DuckDB oracles."""
    repo = Path(__file__).resolve().parent.parent
    seen: set[str] = set()
    for p in sorted(repo.glob("CORRECTNESS_r0[1234].json")):
        seen |= set(json.loads(p.read_text()))
    if not seen:  # reports not present in a bare checkout
        return
    rewindowed = {"sim_cosine_lsh", "sim_ivf_topk"}
    overlap = (set(_WINDOW_50) & seen) - rewindowed
    assert overlap == set(), overlap


def test_rows_only_keys_are_deliberate():
    """Every key without an oracle must be on the documented list —
    a forgotten oracle shows up here, not as a silent weaker check."""
    expected = {
        "agg_approx", "agg_sketch_merge", "dedup_minhash_lsh",
        "dedup_simhash",
        "media_features", "media_phash_dedup",
        # fixpoint loops: the data-dependent round count is the point
        # of these keys and cannot be a fixed SQL unroll; accuracy is
        # gated by tests/test_clustering.py / tests/test_graph_converged.py
        "cluster_kmeans_converged",
        "graph_pagerank_converged",
    }
    assert registry.rows_only_keys() == expected
