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

# Round-5 rotation: keys 1-50 are the driver window — exactly the 48 keys
# never inside any driver window across r1-r4 (union of
# CORRECTNESS_r0{1..4}.json = 199 of 247 keys; the other 48 verified only by
# the round-4 judge's identical re-run) plus the two similarity keys whose
# oracles were upgraded from rows-only to full DuckDB replay in round 4
# (sim_cosine_lsh, sim_ivf_topk — the driver has never hash-checked them).
# After this window the entire registry has been proven by the hard signal
# at least once. Everything behind _FRONT is driver-green and keeps module
# order.
_FRONT: list[str] = [
    # --- round-5 driver window (50) ---
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
