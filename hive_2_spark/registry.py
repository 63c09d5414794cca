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

# Round-10 rotation: keys 1-50 are the driver window. All keys have
# been driver-proven at least once (union of CORRECTNESS_r0{1..6,9};
# the r7/r8 artifacts were byte-copies of r6). This window covers
# (a) the three round-10 operators — never driver-checked — then
# (b) per the r9 verdict, the stalest
# re-verification tier: keys whose latest genuine driver hash-check is
# r1/r2 (fixtures regenerated twice since), float/timestamp-rounding
# boundaries first (win_*, agg stats family, pricing_summary, TPC-H
# shapes), then the streaming batch faces. 44 r1/r2-era keys remain for
# the r10 window (the full set is also self-checked every round by
# tools/driver_sim.py — see SELFCHECK_r09.json). Everything behind
# _FRONT keeps module order.
_FRONT: list[str] = [
    # --- (a) round-10 additions: new operators, never driver-checked ---
    "agg_countmin_portable", "text_langid_profile", "sample_reservoir",
    "roundtrip_python_datasource", "graph_communities_lpa",
    # --- (b) round-10 rotation (r9 verdict item 5): the stalest
    # families the driver has not personally hashed on CURRENT
    # fixtures — TPC-H tail, catalog block, as-of family, then the
    # quality/curation families ---
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
