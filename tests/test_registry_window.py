"""The driver's per-round correctness window is the FIRST 50 registry
keys. Freeze the intended round-11 window so adding keys to a front
module (or reordering _MODULES/_FRONT) cannot silently displace the
keys it must re-verify. New keys belong at the TOP of the window while
the round is open; after the round's CORRECTNESS lands, rotate
deliberately."""

from __future__ import annotations

import json
from pathlib import Path

from hive_2_spark import registry

# Round-11 window: (a) the seven new round-11 operators (never
# driver-checked — the three late-session ops displaced the filler
# tier, since a never-checked operator outranks any rotation filler),
# then (b) the rotation recorded in NOTES.md at the end of round 10 —
# ALL 43 keys whose latest genuine driver hash-check is r1/r2. The
# displaced fillers (event_paths, text_stats, token_count) move to the
# round-12 plan front. Update deliberately (with a rotation), never as
# a side effect of adding an operator.
_ROUND11_NEW = [
    "read_python_datasource_pushdown", "graph_communities_incremental",
    "agg_kmv_portable", "sim_mrl_topk",
    "graph_cc_largestar", "event_bot_regularity",
    "layout_rendezvous_shards",
]

_ROTATION = [
    "scan_full_table", "project_columns", "project_alias",
    "computed_column", "filter_eq_conj", "filter_range", "filter_in",
    "filter_like", "filter_null", "topk_limit", "distinct_pair",
    "count_subquery", "exists_probe", "model_over_agg", "pivot_keys",
    "set_union",
    "join_has_many", "join_many_to_many", "join_lookup_one",
    "join_outer", "join_semi", "join_anti", "join_full_outer",
    "join_null_safe",
    "insert_rows", "update_rows", "delete_rows", "upsert_rows",
    "changed_rows_diff", "validate_rules",
    "dedup_exact", "dedup_minhash_portable", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "sim_cosine_topk", "sim_pairwise_label",
    "emb_normalize", "emb_quantize_int8",
    "event_sessionize", "event_funnel", "event_retention",
    "agg_approx", "agg_sketch_merge",
]


def test_window_is_exactly_50():
    assert len(_ROUND11_NEW) + len(_ROTATION) == 50


def test_first_50_keys_are_the_round11_window():
    window = list(registry.all_queries())[:50]
    expected = _ROUND11_NEW + _ROTATION
    assert window == expected


def test_rotation_slots_not_wasted_on_fresh_keys():
    """Every rotation slot must be spent on a key the driver did NOT
    hash in its round-10 window (the freshest genuine artifact) — a
    slot on a just-checked key is a wasted slot."""
    repo = Path(__file__).resolve().parent.parent
    r10 = repo / "CORRECTNESS_r10.json"
    if not r10.exists():  # bare checkout without round artifacts
        return
    fresh10 = set(json.loads(r10.read_text()))
    wasted = [k for k in _ROUND11_NEW + _ROTATION if k in fresh10]
    assert wasted == [], wasted


def test_rotation_covers_every_r1_r2_era_key():
    """The NOTES.md round-11 plan: all 43 keys whose latest genuine
    driver check is r1/r2 (union of r1-r6, r9, r10 artifacts; r7/r8
    were byte-copies of r6) must be in this window — none skipped."""
    repo = Path(__file__).resolve().parent.parent
    arts = [repo / f"CORRECTNESS_r{n:02d}.json" for n in (1, 2, 3, 4, 5, 6, 9, 10)]
    if not all(p.exists() for p in arts):
        return
    latest: dict[str, int] = {}
    for n, p in zip((1, 2, 3, 4, 5, 6, 9, 10), arts):
        for k in json.loads(p.read_text()):
            latest[k] = n
    stale = {
        k for k in registry.all_queries()
        if latest.get(k, 0) in (1, 2)
    }
    window = set(_ROUND11_NEW + _ROTATION)
    assert stale <= window, sorted(stale - window)


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
