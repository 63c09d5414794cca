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
    "hive_2_spark.core.basket",
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

# Round-6 rotation: keys 1-50 are the driver window. Every key present as
# of round 4 has been driver-proven (union of CORRECTNESS_r0{1..5}.json =
# 247 keys); this window covers (a) the 10-key backlog — the 9 operators
# added in round 5 (never driver-checked; local-parity green at sf0.01 +
# sf0.1 only) plus fingerprint_rolling, whose md5-prefix oracle replaced
# the rows-only check in r5 but was last DRIVER-checked as rows-only in
# r3 — (b) the operators added THIS round, and (c) re-verification of the
# oldest-checked keys (latest driver check r1/r2 — fixtures have
# regenerated twice since), prioritizing float/timestamp rounding
# boundaries: win_*, agg_percentile/stats/corr, pricing_summary + the
# TPC-H q2-q14 shapes. Everything behind _FRONT keeps module order.
_FRONT: list[str] = [
    # --- (a) the 10-key backlog: r5 additions + fingerprint_rolling ---
    "sim_pq_topk", "curation_mixture_balance", "event_funnel_windowed",
    "ts_anomaly_mad", "ts_seasonal_decompose", "retrieval_rrf_fusion",
    "agg_quantile_shard_merge", "stream_anomaly_monitor",
    "graph_pagerank_converged", "fingerprint_rolling",
    # --- (b) round-6 additions (inserted as they land) ---
    "token_pack_salted", "dedup_incremental_indexed",
    "quality_ngram_census", "ts_acf", "retrieval_mmr",
    "dedup_time_horizon", "skew_report", "dedup_prefix_filter",
    "join_bloom_pruned", "phrase_search_positional", "ts_holt",
    "quality_pmi_bigrams", "event_attribution_decay", "quality_fk_audit",
    "ts_changepoint", "event_audience_overlap", "win_session_native",
    "ts_crosscorr",
    "sim_maxsim_topk",
    # upgraded from rows-only to a full oracle in round 6 — the oracle
    # itself has never been driver-run, so it re-enters the window
    "dedup_simhash",
    # --- (b2) round-6 second-session additions + the one first-session
    # key that landed after the window filled (stream_lateness_report).
    # Never driver-checked; they take window slots ahead of
    # re-verification (never-checked > re-check, the r5 rule).
    "stream_lateness_report",
    "dedup_paragraph", "curation_repeat_upsample", "retrieval_ndcg",
    "quality_benford", "event_concurrency_peak", "agg_gini",
    "event_cumulative_reach", "event_streaks", "basket_pair_lift",
    "agg_hll_portable", "ts_downsample_lttb", "ts_drift_report",
    "media_scene_cut",
    # --- (c) oldest-checked re-verification (latest check r1/r2);
    # slots 45-50 — the float/timestamp-risk window ops. Everything
    # displaced below waits for the r7 window.
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
assert len(_FRONT) == len(set(_FRONT)), (
    "duplicate keys in _FRONT: "
    f"{sorted(k for k in _FRONT if _FRONT.count(k) > 1)}"
)


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
