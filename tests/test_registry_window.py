"""The driver's per-round correctness window is the FIRST 50 registry
keys. Freeze the intended round-14 window so adding keys to a front
module (or reordering _MODULES/_FRONT) cannot silently displace the
keys it must re-verify. New keys belong at the TOP of the window while
the round is open (displacing one key from the r6 filler tail); after
the round's CORRECTNESS lands, rotate deliberately."""

from __future__ import annotations

import json
from pathlib import Path

from hive_2_spark import registry

# Round-14 window (the NOTES.md plan recorded at the end of round 13):
# (a) new round-14 operators — never driver-checked, inserted at the
#     top as they land; (b) ALL keys whose latest genuine driver
#     hash-check is r5 (mechanically recomputed from the union of
#     genuine windows r1-r6, r9-r13 — 30 keys: one more than the
#     NOTES name list, which missed emb_pca_power; artifacts win);
# (c) the r6-stale tier front in registry order as the displaceable
#     tail.
_ROUND14_NEW: list[str] = [
    "dedup_index_maintain",
    "read_python_datasource_compacted",
    "text_bpe_merges",
    "text_bpe_apply",
    "graph_scc",
    "event_time_to_convert",
    "read_schema_evolution",
]

_R5_TIER = [
    "emb_pca_power", "emb_whiten", "pivot_wide", "unpivot_long",
    "pivot_dynamic", "join_salted", "agg_salted", "zorder_layout",
    "compact_small_files", "agg_histogram", "mv_join_incremental",
    "profile_orders", "profile_documents",
    "set_union_by_name", "set_union_all", "set_intersect",
    "set_except", "set_intersect_all",
    "agg_bitmap_distinct", "agg_incremental_merge",
    "agg_weighted_median", "agg_weighted_quartiles",
    "win_ntile", "win_distinct_rolling", "win_global_cumsum",
    "win_global_rank",
    "stream_doc_gate", "dedup_token_sort", "sim_cosine_lsh",
    "event_rfm",
]

_R6_FILL = [
    "fingerprint_rolling", "token_pack_salted", "retrieval_ndcg",
    "retrieval_rrf_fusion", "phrase_search_positional", "sim_pq_topk",
    "media_scene_cut", "skew_report", "ts_drift_report",
    "ts_downsample_lttb", "ts_crosscorr", "ts_changepoint",
    "ts_holt", "ts_anomaly_mad", "ts_seasonal_decompose", "ts_acf",
    "basket_pair_lift", "agg_hll_portable", "agg_gini",
    "agg_quantile_shard_merge",
]


def _window() -> list[str]:
    keep = 50 - len(_ROUND14_NEW) - len(_R5_TIER)
    return _ROUND14_NEW + _R5_TIER + _R6_FILL[:keep]


def test_window_is_exactly_50():
    assert len(_window()) == 50


def test_new_operators_never_displace_stale_tiers():
    """New round-14 keys may only displace the r6 filler tail — the
    r5 tier must stay in whole."""
    assert len(_ROUND14_NEW) <= len(_R6_FILL), (
        "too many new keys for the displaceable tail — rotate "
        "deliberately instead"
    )


def test_first_50_keys_are_the_round14_window():
    window = list(registry.all_queries())[:50]
    assert window == _window()


def test_rotation_slots_not_wasted_on_fresh_keys():
    """Every rotation slot must be spent on a key the driver did NOT
    hash in its round-13 window (the freshest genuine artifact) — a
    slot on a just-checked key is a wasted slot."""
    repo = Path(__file__).resolve().parent.parent
    r13 = repo / "CORRECTNESS_r13.json"
    if not r13.exists():  # bare checkout without round artifacts
        return
    fresh13 = set(json.loads(r13.read_text()))
    wasted = [k for k in _window() if k in fresh13]
    assert wasted == [], wasted


def test_rotation_covers_every_never_checked_and_r5_era_key():
    """The NOTES.md round-14 plan: every key never hashed by any
    genuine driver window, and every key whose latest genuine check
    is r5 (union of r1-r6, r9-r13 artifacts; r7/r8 were byte-copies
    of r6) must be in this window — none skipped."""
    repo = Path(__file__).resolve().parent.parent
    rounds = (1, 2, 3, 4, 5, 6, 9, 10, 11, 12, 13)
    arts = [repo / f"CORRECTNESS_r{n:02d}.json" for n in rounds]
    if not all(p.exists() for p in arts):
        return
    latest: dict[str, int] = {}
    for n, p in zip(rounds, arts):
        for k in json.loads(p.read_text()):
            latest[k] = n
    window = set(_window())
    queries = registry.all_queries()
    never = {k for k in queries if k not in latest and k not in _ROUND14_NEW}
    assert never <= window, sorted(never - window)
    stale5 = {k for k in queries if latest.get(k, 99) == 5}
    assert stale5 <= window, sorted(stale5 - window)


def test_rows_only_keys_are_deliberate():
    """Every key without an oracle must be on the documented list —
    a forgotten oracle shows up here, not as a silent weaker check."""
    expected = {
        "agg_approx", "agg_sketch_merge", "dedup_minhash_lsh",
        "media_features", "media_phash_dedup",
        # real RAWV container decode — the media_features barrier;
        # planted-cut recall gated in tests/test_multimodal.py
        "media_scene_cut",
    }
    assert registry.rows_only_keys() == expected
