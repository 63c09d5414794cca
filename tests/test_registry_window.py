"""The driver's per-round correctness window is the FIRST 50 registry
keys. Freeze the intended round-10 window so adding keys to a front
module (or reordering _MODULES/_FRONT) cannot silently displace the
keys it must re-verify. New keys belong at the TOP of the window while
the round is open; after the round's CORRECTNESS lands, rotate
deliberately."""

from __future__ import annotations

import json
from pathlib import Path

from hive_2_spark import registry

# Round-10 window: (a) the three new round-10 operators (never
# driver-checked), then (b) the rotation the round-9 verdict asked for
# — the stalest families the driver has not personally hashed on
# CURRENT fixtures: TPC-H tail, catalog block, as-of family, quality/
# curation families. Update deliberately (with a rotation), never as a
# side effect of adding an operator.
_ROUND10_NEW = [
    "agg_countmin_portable", "text_langid_profile", "sample_reservoir",
    "roundtrip_python_datasource", "graph_communities_lpa",
]

_ROTATION = [
    "sql_q9_profit_by_nation", "sql_q15_top_supplier",
    "sql_q16_supplier_diversity", "sql_q17_small_qty_revenue",
    "sql_q20_volume_suppliers", "sql_q21_waiting_suppliers",
    "sql_q22_idle_customers",
    "catalog_managed_agg", "catalog_managed_join",
    "catalog_partitioned_ddl", "catalog_dpp_join", "catalog_view",
    "catalog_bucketed_join",
    "join_asof", "join_asof_forward", "join_asof_tolerance",
    "join_asof_nearest", "join_interval_binned",
    "quality_score", "quality_repetition", "quality_dup_ngram_corpus",
    "quality_lm_score", "quality_entropy", "quality_blocklist_words",
    "quality_ngram_census", "quality_pmi_bigrams", "quality_benford",
    "quality_fk_audit", "quality_expectations",
    "pii_redact", "doc_split", "contamination_ngram", "tfidf_top_terms",
    "sample_weighted_mix", "shuffle_train_order", "curriculum_order",
    "sample_temperature", "sample_source_token_cap",
    "curation_domain_filter", "curation_mixture_balance",
    "curation_funnel", "curation_repeat_upsample", "sample_stratified",
    "graph_triangles", "graph_bfs_distance",
    "event_funnel", "event_paths",
]


def test_first_50_keys_are_the_round10_window():
    window = list(registry.all_queries())[:50]
    expected = (_ROUND10_NEW + _ROTATION)[:50]
    assert window == expected


def test_rotation_slots_not_wasted_on_fresh_keys():
    """Every rotation slot must be spent on a key the driver did NOT
    hash in its round-9 window (the freshest genuine artifact) — a slot
    on a just-checked key is a wasted slot."""
    repo = Path(__file__).resolve().parent.parent
    r9 = repo / "CORRECTNESS_r09.json"
    if not r9.exists():  # bare checkout without round artifacts
        return
    fresh9 = set(json.loads(r9.read_text()))
    wasted = [k for k in _ROUND10_NEW + _ROTATION if k in fresh9]
    assert wasted == [], wasted


def test_rows_only_keys_are_deliberate():
    """Every key without an oracle must be on the documented list —
    a forgotten oracle shows up here, not as a silent weaker check."""
    expected = {
        "agg_approx", "agg_sketch_merge", "dedup_minhash_lsh",
        "media_features", "media_phash_dedup",
        # real RAWV container decode — the media_features barrier;
        # planted-cut recall gated in tests/test_multimodal.py
        "media_scene_cut",
        # round 9: cluster_kmeans_converged and graph_pagerank_converged
        # left this list — their oracles now unroll every round to the
        # loop cap and select the stop round in SQL, so the
        # data-dependent round count is hash-checked, not assumed.
    }
    assert registry.rows_only_keys() == expected
