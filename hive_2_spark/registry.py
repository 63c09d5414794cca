"""Aggregate query/oracle registry — the single source the driver entry uses.

Every operator module exposes ``QUERIES`` (name -> (spark, sf_dir) ->
DataFrame) and ``ORACLES`` (name -> DuckDB SQL). This module merges them
and asserts key discipline: an oracle without a query is an error; a query
without an oracle is allowed (rows-only check) but must be listed in
``ROWS_ONLY`` deliberately.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Registry insertion order is the order the driver consumes keys in (the
# per-round correctness window is the FIRST 50 keys). Rounds 1-3 windows
# verified 150 keys (see CORRECTNESS_r0{1,2,3}.json). ``_FRONT`` below pins
# the exact key order for the still-unverified tail — finer-grained than
# module order, because families like multimodal mix driver-green keys with
# the one key round 4 must re-prove (media_features). Module order only
# decides the relative order of keys NOT in _FRONT.
_MODULES: list[str] = [
    "hive_2_spark.llm.text",
    "hive_2_spark.llm.curation",
    "hive_2_spark.llm.quality",
    "hive_2_spark.llm.retrieval",
    "hive_2_spark.llm.advanced",
    "hive_2_spark.llm.multimodal",
    "hive_2_spark.core.scalarfns",
    "hive_2_spark.core.scalarfns2",
    "hive_2_spark.core.scalarfns3",
    "hive_2_spark.llm.pipeline",
    "hive_2_spark.llm.urls",
    "hive_2_spark.llm.clustering",
    "hive_2_spark.llm.insights",
    "hive_2_spark.core.udfs",
    "hive_2_spark.core.io",
    "hive_2_spark.core.pysource",
    "hive_2_spark.core.asof",
    "hive_2_spark.core.reshape",
    "hive_2_spark.core.skew",
    "hive_2_spark.core.layout",
    "hive_2_spark.core.timeseries",
    "hive_2_spark.core.cdc",
    "hive_2_spark.core.mv",
    "hive_2_spark.core.graph",
    "hive_2_spark.core.profile",
    "hive_2_spark.core.analytics3",
    "hive_2_spark.core.setops",
    "hive_2_spark.core.analytics2",
    "hive_2_spark.core.aggregates",
    "hive_2_spark.core.windows",
    "hive_2_spark.core.writes",
    "hive_2_spark.core.metastore",
    "hive_2_spark.streaming.windows",
    "hive_2_spark.streaming.stateful",
    "hive_2_spark.streaming.joins",
    "hive_2_spark.streaming.cdc",
    "hive_2_spark.streaming.serving",
    "hive_2_spark.streaming.ingest",
    "hive_2_spark.llm.dedup",
    "hive_2_spark.llm.similarity",
    "hive_2_spark.core.events",
    "hive_2_spark.core.analytics",
    "hive_2_spark.flagship",
    "hive_2_spark.core.relational",
    "hive_2_spark.core.joins",
]

# Round-4 rotation: keys 1-50 are the driver window — media_features first
# (the single red row in CORRECTNESS_r03; the fix must be proven by the
# driver itself) followed by 49 keys never inside any driver window
# (r1-r3 covered 150 of 231). Keys 51-82 are the remaining 32
# never-driver-checked keys, staged for the round-5 rotation. Everything
# behind _FRONT is driver-green from r1-r3 and keeps module order.
_FRONT: list[str] = [
    # --- round-4 driver window (50) ---
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
    # --- staged for round 5 (32) ---
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
]


def _load() -> tuple[dict[str, QueryFn], dict[str, str]]:
    import importlib

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        q = getattr(mod, "QUERIES", {})
        o = getattr(mod, "ORACLES", {})
        dup = set(q) & set(queries)
        if dup:
            raise ValueError(f"duplicate query keys {dup} from {modname}")
        missing = set(o) - set(q)
        if missing:
            raise ValueError(f"oracles without queries {missing} in {modname}")
        queries.update(q)
        oracles.update(o)
    unknown = [k for k in _FRONT if k not in queries]
    if unknown:
        raise ValueError(f"_FRONT keys not in registry: {unknown}")
    ordered = {k: queries[k] for k in _FRONT}
    ordered.update((k, v) for k, v in queries.items() if k not in ordered)
    return ordered, oracles


def all_queries() -> dict[str, QueryFn]:
    return _load()[0]


def all_oracles() -> dict[str, str]:
    return _load()[1]


def rows_only_keys() -> set[str]:
    """Keys deliberately lacking a SQL oracle (non-SQL-expressible ops)."""
    q, o = _load()
    return set(q) - set(o)
