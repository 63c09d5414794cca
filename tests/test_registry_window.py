"""The driver's per-round correctness window is the FIRST 50 registry
keys. Freeze the intended round-4 window so adding keys to a front
module (or reordering _MODULES/_FRONT) cannot silently displace
never-driver-verified keys out of it. New keys belong BEHIND the window
(see registry._FRONT comment)."""

from __future__ import annotations

import json
from pathlib import Path

from hive_2_spark import registry

# Round-4 window: media_features (the single red row in CORRECTNESS_r03,
# fixed this round — the driver must re-prove it) + 49 keys that were
# never inside the r1-r3 driver windows. Update deliberately (with a
# rotation), never as a side effect of adding an operator.
_WINDOW_50 = [
    "media_features",
    "sql_q9_profit_by_nation", "sql_q15_top_supplier",
    "sql_q16_supplier_diversity", "sql_q17_small_qty_revenue",
    "sql_q20_volume_suppliers", "sql_q21_waiting_suppliers",
    "sql_q22_idle_customers",
    "join_asof", "join_asof_forward", "join_asof_tolerance",
    "join_asof_nearest", "join_interval_binned",
    "graph_pagerank", "graph_triangles", "graph_bfs_distance",
    "cluster_kmeans", "cluster_mix_report", "cluster_kmeans_converged",
    "ts_resample", "ts_interpolate", "ts_ewma", "ts_anomaly_zscore",
    "ts_trend", "ts_rollup_cascade", "ts_forecast_linear",
    "event_transitions", "event_paths", "event_attribution",
    "event_cohort_ltv",
    "dedup_incremental", "dedup_containment", "dedup_substring_windows",
    "cdc_changes", "scd2_dimension",
    "roundtrip_csv", "roundtrip_json", "roundtrip_orc",
    "partitioned_write_read", "read_binaryfile", "read_python_datasource",
    "udf_scalar", "udf_pandas_scalar", "udf_grouped_agg",
    "udf_grouped_map", "udf_sql_registered", "udf_table",
    "stream_cluster_monitor",
    "agg_argmax", "win_median_rolling",
]


def test_first_50_keys_are_the_round4_window():
    assert list(registry.all_queries())[:50] == _WINDOW_50


def test_window_is_never_driver_checked_except_media_features():
    """Every window key except the deliberate media_features re-prove
    must be absent from all prior CORRECTNESS reports."""
    repo = Path(__file__).resolve().parent.parent
    seen: set[str] = set()
    for p in sorted(repo.glob("CORRECTNESS_r0[123].json")):
        seen |= set(json.loads(p.read_text()))
    if not seen:  # reports not present in a bare checkout
        return
    overlap = (set(_WINDOW_50) & seen) - {"media_features"}
    assert overlap == set(), overlap


def test_rows_only_keys_are_deliberate():
    """Every key without an oracle must be on the documented list —
    a forgotten oracle shows up here, not as a silent weaker check."""
    expected = {
        "agg_approx", "agg_sketch_merge", "dedup_minhash_lsh",
        "dedup_simhash",
        "fingerprint_rolling", "media_features", "media_phash_dedup",
        # fixpoint k-means: the data-dependent round count is the point
        # of the key and cannot be a fixed SQL unroll; accuracy is
        # gated by tests/test_clustering.py instead
        "cluster_kmeans_converged",
    }
    assert registry.rows_only_keys() == expected
