"""The driver's per-round correctness window is the FIRST 50 registry
keys. Freeze the intended round-13 window so adding keys to a front
module (or reordering _MODULES/_FRONT) cannot silently displace the
keys it must re-verify. New keys belong at the TOP of the window while
the round is open (displacing one key from the r5 filler tail); after
the round's CORRECTNESS lands, rotate deliberately."""

from __future__ import annotations

import json
from pathlib import Path

from hive_2_spark import registry

# Round-13 window (the NOTES.md plan recorded at the end of round 12):
# (a) new round-13 operators — never driver-checked, inserted at the
#     top as they land; (b) ALL keys whose latest genuine driver
#     hash-check is r4 (mechanically recomputed from the union of
#     genuine windows r1-r6, r9-r12 — 32 keys, matching the NOTES
#     name list exactly); (c) the r5-stale tier front in registry
#     order as the displaceable tail.
_ROUND13_NEW: list[str] = [
    "ts_holtwinters",
    "graph_kcore",
    "event_pattern_alternation",
    "graph_hits",
    "agg_winsorized_stats",
    "curation_split_by_family",
    "graph_pagerank_personalized",
    "ts_anomaly_iqr",
]

_R4_TIER = [
    "cluster_mix_report",
    "udf_scalar", "udf_pandas_scalar", "udf_grouped_agg",
    "udf_grouped_map", "udf_sql_registered", "udf_table",
    "roundtrip_csv", "roundtrip_json", "roundtrip_orc",
    "partitioned_write_read", "read_binaryfile",
    "read_python_datasource",
    "ts_resample", "ts_interpolate", "ts_ewma", "ts_anomaly_zscore",
    "ts_trend", "ts_rollup_cascade", "ts_forecast_linear",
    "cdc_changes", "scd2_dimension", "graph_pagerank", "agg_argmax",
    "win_median_rolling", "stream_cluster_monitor",
    "dedup_incremental", "dedup_containment",
    "dedup_substring_windows",
    "event_transitions", "event_attribution", "event_cohort_ltv",
]

_R5_FILL = [
    "token_oov_rate", "sim_ivf_topk", "fn_lambda", "fn_variant",
    "fn_binary", "fn_url", "fn_explode_outer", "fn_from_json",
    "dedup_clusters_semantic", "dedup_url_canonical",
    "emb_pca_power", "emb_whiten", "pivot_wide", "unpivot_long",
    "pivot_dynamic", "join_salted", "agg_salted", "zorder_layout",
]


def _window() -> list[str]:
    keep = 50 - len(_ROUND13_NEW) - len(_R4_TIER)
    return _ROUND13_NEW + _R4_TIER + _R5_FILL[:keep]


def test_window_is_exactly_50():
    assert len(_window()) == 50


def test_new_operators_never_displace_stale_tiers():
    """New round-13 keys may only displace the r5 filler tail — the
    r4 tier must stay in whole."""
    assert len(_ROUND13_NEW) <= len(_R5_FILL), (
        "too many new keys for the displaceable tail — rotate "
        "deliberately instead"
    )


def test_first_50_keys_are_the_round13_window():
    window = list(registry.all_queries())[:50]
    assert window == _window()


def test_rotation_slots_not_wasted_on_fresh_keys():
    """Every rotation slot must be spent on a key the driver did NOT
    hash in its round-12 window (the freshest genuine artifact) — a
    slot on a just-checked key is a wasted slot."""
    repo = Path(__file__).resolve().parent.parent
    r12 = repo / "CORRECTNESS_r12.json"
    if not r12.exists():  # bare checkout without round artifacts
        return
    fresh12 = set(json.loads(r12.read_text()))
    wasted = [k for k in _window() if k in fresh12]
    assert wasted == [], wasted


def test_rotation_covers_every_never_checked_and_r4_era_key():
    """The NOTES.md round-13 plan: every key never hashed by any
    genuine driver window, and every key whose latest genuine check
    is r4 (union of r1-r6, r9-r12 artifacts; r7/r8 were byte-copies
    of r6) must be in this window — none skipped."""
    repo = Path(__file__).resolve().parent.parent
    rounds = (1, 2, 3, 4, 5, 6, 9, 10, 11, 12)
    arts = [repo / f"CORRECTNESS_r{n:02d}.json" for n in rounds]
    if not all(p.exists() for p in arts):
        return
    latest: dict[str, int] = {}
    for n, p in zip(rounds, arts):
        for k in json.loads(p.read_text()):
            latest[k] = n
    window = set(_window())
    queries = registry.all_queries()
    never = {k for k in queries if k not in latest and k not in _ROUND13_NEW}
    assert never <= window, sorted(never - window)
    stale4 = {k for k in queries if latest.get(k, 99) == 4}
    assert stale4 <= window, sorted(stale4 - window)


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
