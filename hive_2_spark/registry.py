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

# Round-11 rotation (executes the plan recorded in NOTES.md at the end
# of round 10, computed mechanically from the union of genuine driver
# windows r1-r6, r9, r10 — the r7/r8 artifacts were byte-copies of r6).
# Keys 1-50 are the driver window:
# (a) the four round-11 operators — never driver-checked;
# (b) all 43 keys whose latest genuine driver hash-check is r1/r2
#     (fixtures regenerated twice since), float/rounding risk first:
#     Layer-A relational, joins, writes, dedup/sim, events, sketches;
# (c) event_paths (carried: sat at _FRONT slot 52 in round 10, just
#     outside the 50-key window) + the first 2 of the r3-era tier.
# Exactly 50 — asserted below so rotation accounting can't drift
# (round-11 ADVICE: r10's 52-key _FRONT silently wasted 2 slots).
_FRONT: list[str] = [
    # --- (a) round-11 additions: new operators, never driver-checked.
    # The 3 late-session ops displaced the (c) fillers (event_paths,
    # text_stats, token_count -> round-12 plan front): a never-checked
    # operator outranks any rotation filler for a window slot. ---
    "read_python_datasource_pushdown", "graph_communities_incremental",
    "agg_kmv_portable", "sim_mrl_topk",
    "graph_cc_largestar", "event_bot_regularity",
    "layout_rendezvous_shards",
    # --- (b) the 43 r1/r2-era keys ---
    # Layer-A / relational (r1)
    "scan_full_table", "project_columns", "project_alias",
    "computed_column", "filter_eq_conj", "filter_range", "filter_in",
    "filter_like", "filter_null", "topk_limit", "distinct_pair",
    "count_subquery", "exists_probe", "model_over_agg", "pivot_keys",
    "set_union",
    # join family (r1)
    "join_has_many", "join_many_to_many", "join_lookup_one",
    "join_outer", "join_semi", "join_anti", "join_full_outer",
    "join_null_safe",
    # writes / model semantics (r2)
    "insert_rows", "update_rows", "delete_rows", "upsert_rows",
    "changed_rows_diff", "validate_rules",
    # dedup / similarity (r2; dedup_minhash_lsh is rows-only)
    "dedup_exact", "dedup_minhash_portable", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "sim_cosine_topk", "sim_pairwise_label",
    "emb_normalize", "emb_quantize_int8",
    # events (r2)
    "event_sessionize", "event_funnel", "event_retention",
    # sketches (r1, rows-only by documented necessity)
    "agg_approx", "agg_sketch_merge",
]
assert len(_FRONT) == 50, f"driver window must be exactly 50, got {len(_FRONT)}"
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
