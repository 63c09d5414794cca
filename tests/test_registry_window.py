"""The driver's per-round correctness window is the FIRST 50 registry
keys. Freeze the intended round-12 window so adding keys to a front
module (or reordering _MODULES/_FRONT) cannot silently displace the
keys it must re-verify. New keys belong at the TOP of the window while
the round is open (displacing one key from the r4 filler tail); after
the round's CORRECTNESS lands, rotate deliberately."""

from __future__ import annotations

import json
from pathlib import Path

from hive_2_spark import registry

# Round-12 window (the NOTES.md plan recorded at the end of round 11):
# (a) new round-12 operators — never driver-checked, inserted at the
#     top as they land; (b) the three round-11 operators that shipped
#     after the r11 window was consumed; (c) the three fillers
#     displaced late in round 11; (d) ALL keys whose latest genuine
#     driver hash-check is r3 (mechanically recomputed — 34 keys, the
#     NOTES name-list plus lang_id); (e) the r4-stale tier front in
#     registry order as the displaceable tail.
_ROUND12_NEW: list[str] = [
    "read_python_datasource_changes",
    "event_pattern_match_within",
    "graph_node2vec_walks",
    "agg_sample_quantile_portable",
    "quality_vocab_zipf",
    "layout_hilbert_curve",
    "curation_soft_dedup_weights",
    "event_markov_stationary",
]

_NEVER_CHECKED = [
    "event_pattern_match", "read_python_datasource_timetravel",
    "graph_random_walks",
]

_DISPLACED_FILLERS = ["event_paths", "text_stats", "token_count"]

_R3_TIER = [
    "lang_id", "fingerprint", "text_chunk", "token_pack",
    "bm25_topk", "keyword_search_and", "dedup_embedding",
    "dedup_clusters", "dedup_levenshtein", "dedup_keep_best",
    "dedup_clusters_lsh", "media_stats", "media_resize",
    "media_frame_sample", "media_phash_dedup",
    "fn_string", "fn_date", "fn_math", "fn_cond", "fn_json",
    "fn_array", "fn_explode", "cast_ingest", "ts_parse_format",
    "num_format", "bool_verbose", "row_to_json", "fill_defaults",
    "fn_string2", "fn_date2", "fn_hash", "fn_map", "fn_try",
    "fn_array2",
]

_R4_FILL = [
    "media_features", "cluster_kmeans", "cluster_mix_report",
    "udf_scalar", "udf_pandas_scalar", "udf_grouped_agg",
    "udf_grouped_map", "udf_sql_registered", "udf_table",
    "roundtrip_csv",
]


def _window() -> list[str]:
    keep = 50 - len(_ROUND12_NEW) - len(_NEVER_CHECKED) \
        - len(_DISPLACED_FILLERS) - len(_R3_TIER)
    return (_ROUND12_NEW + _NEVER_CHECKED + _DISPLACED_FILLERS
            + _R3_TIER + _R4_FILL[:keep])


def test_window_is_exactly_50():
    assert len(_window()) == 50


def test_new_operators_never_displace_stale_tiers():
    """New round-12 keys may only displace the r4 filler tail — the
    never-checked / displaced-filler / r3 tiers must all stay in."""
    assert len(_ROUND12_NEW) <= len(_R4_FILL), (
        "too many new keys for the displaceable tail — rotate "
        "deliberately instead"
    )


def test_first_50_keys_are_the_round12_window():
    window = list(registry.all_queries())[:50]
    assert window == _window()


def test_rotation_slots_not_wasted_on_fresh_keys():
    """Every rotation slot must be spent on a key the driver did NOT
    hash in its round-11 window (the freshest genuine artifact) — a
    slot on a just-checked key is a wasted slot."""
    repo = Path(__file__).resolve().parent.parent
    r11 = repo / "CORRECTNESS_r11.json"
    if not r11.exists():  # bare checkout without round artifacts
        return
    fresh11 = set(json.loads(r11.read_text()))
    wasted = [k for k in _window() if k in fresh11]
    assert wasted == [], wasted


def test_rotation_covers_every_never_checked_and_r3_era_key():
    """The NOTES.md round-12 plan: every key never hashed by any
    genuine driver window, and every key whose latest genuine check
    is r3 (union of r1-r6, r9, r10, r11 artifacts; r7/r8 were
    byte-copies of r6) must be in this window — none skipped."""
    repo = Path(__file__).resolve().parent.parent
    rounds = (1, 2, 3, 4, 5, 6, 9, 10, 11)
    arts = [repo / f"CORRECTNESS_r{n:02d}.json" for n in rounds]
    if not all(p.exists() for p in arts):
        return
    latest: dict[str, int] = {}
    for n, p in zip(rounds, arts):
        for k in json.loads(p.read_text()):
            latest[k] = n
    window = set(_window())
    queries = registry.all_queries()
    never = {k for k in queries if k not in latest and k not in _ROUND12_NEW}
    assert never <= window, sorted(never - window)
    stale3 = {k for k in queries if latest.get(k, 99) == 3}
    assert stale3 <= window, sorted(stale3 - window)


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
