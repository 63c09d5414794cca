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

# Round-9 rotation: keys 1-50 are the driver window. All 289 keys have
# been driver-proven at least once (union of CORRECTNESS_r0{1..6}; the
# r7/r8 artifacts were byte-copies of r6, so r6 is the latest genuine
# run). This window covers (a) the two fixpoint keys whose oracles were
# upgraded from rows-only to full round-replaying SQL in round 9 — the
# oracles themselves have never been driver-run — then (b) the stalest
# re-verification tier: keys whose latest genuine driver hash-check is
# r1/r2 (fixtures regenerated twice since), float/timestamp-rounding
# boundaries first (win_*, agg stats family, pricing_summary, TPC-H
# shapes), then the streaming batch faces. 44 r1/r2-era keys remain for
# the r10 window (the full set is also self-checked every round by
# tools/driver_sim.py — see SELFCHECK_r09.json). Everything behind
# _FRONT keeps module order.
_FRONT: list[str] = [
    # --- (a) round-9 additions: new operators (never driver-checked)
    # and the two fixpoint keys whose oracles were upgraded ---
    "curation_split_assign", "curation_split_leakage", "udf_map_arrow",
    "graph_pagerank_converged", "cluster_kmeans_converged",
    # --- (b) oldest-checked re-verification (latest genuine check
    # r1/r2), float/timestamp-risk first ---
    "win_lag_lead", "win_pct_rank", "win_topk_per_group",
    "pricing_summary",
    "agg_percentile", "agg_stats", "agg_corr", "agg_mode", "agg_groupby",
    "agg_distinct", "agg_cube", "agg_rollup", "agg_grouping_sets",
    "agg_listagg", "agg_bitwise",
    "sql_q2_min_cost_supplier", "sql_q3_shipping_priority",
    "sql_q4_order_priority", "sql_q5_nation_volume",
    "sql_q6_forecast_revenue", "sql_q7_binat_volume",
    "sql_q8_market_share", "sql_q10_returned_items",
    "sql_q11_revenue_concentration", "sql_q12_priority_lines",
    "sql_q13_order_distribution", "sql_q14_promo_share",
    "sql_q18_large_orders", "sql_q19_disjunctive",
    "sql_recursive_cte", "sql_lateral_topk", "sql_group_by_all",
    "join_range", "sort_multi_key", "topk_nulls_last", "agg_filtered",
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_dedup", "stream_upsert_state", "stream_static_join",
    "stream_interval_join", "stream_interval_join_left",
    "stream_stateful_spend",
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
