"""Round-10 operators: portable Count-Min sketch, corpus-trained n-gram
language ID, hash-priority reservoir sample. Oracle parity is covered by
the registry sweep; these tests pin the operator-specific invariants and
plan shapes."""

from __future__ import annotations

import pyspark.sql.functions as F

from hive_2_spark.core.aggregates import (
    _CMS_PROBES,
    agg_countmin_portable,
)
from hive_2_spark.llm.curation import _RESERVOIR_K, sample_reservoir
from hive_2_spark.llm.text import text_langid_profile
from tests.conftest import SF_DIR, SF_DIR_MID


def test_countmin_upper_bound_and_merge(spark):
    rows = agg_countmin_portable(spark, SF_DIR_MID).collect()
    # CMS guarantee: the min-over-rows estimate never undercounts
    assert rows and all(r["est_count"] >= r["exact_count"] for r in rows)
    # every probe appears in every shard (spine) including ALL
    shards = {r["shard"] for r in rows}
    assert "ALL" in shards and len(shards) >= 2
    per_shard = {(r["shard"], r["probe_key"]): r for r in rows}
    for k in _CMS_PROBES:
        assert ("ALL", k) in per_shard
        # exact counts are additive across shards (the merge the ALL
        # sketch replays cell-wise)
        total = sum(
            r["exact_count"] for (s, pk), r in per_shard.items()
            if pk == k and s != "ALL"
        )
        assert per_shard[("ALL", k)]["exact_count"] == total
        # merged-sketch estimate dominates the merged exact count too
        assert per_shard[("ALL", k)]["est_count"] >= total


def test_langid_confusion_covers_corpus(spark):
    conf = text_langid_profile(spark, SF_DIR_MID).collect()
    from hive_2_spark.catalog import load_table

    d = load_table(spark, SF_DIR_MID, "documents")
    n_docs = d.count()
    langs = {r["lang"] for r in d.select("lang").distinct().collect()}
    assert sum(r["n_docs"] for r in conf) == n_docs  # every doc classified
    assert {r["lang_true"] for r in conf} <= langs
    assert {r["lang_pred"] for r in conf} <= langs | {"und"}
    # the trained profiles carry real signal on this fixture: the
    # diagonal beats uniform-random assignment (1/5 per language)
    diag = sum(r["n_docs"] for r in conf if r["lang_true"] == r["lang_pred"])
    assert diag > n_docs / 5


def test_langid_deterministic(spark):
    a = sorted(map(tuple, text_langid_profile(spark, SF_DIR).collect()))
    b = sorted(map(tuple, text_langid_profile(spark, SF_DIR).collect()))
    assert a == b


def test_reservoir_exact_k_and_true_minima(spark):
    got = sample_reservoir(spark, SF_DIR).collect()
    assert len(got) == _RESERVOIR_K
    priorities = sorted(r["priority"] for r in got)
    # the sample is exactly the k smallest priorities over the corpus
    from hive_2_spark.catalog import load_table
    from hive_2_spark.llm.curation import _RESERVOIR_SEED

    d = load_table(spark, SF_DIR, "documents")
    full = sorted(
        r[0]
        for r in d.select(
            F.md5(
                F.concat(
                    F.lit(_RESERVOIR_SEED), F.col("doc_id").cast("string")
                )
            )
        ).collect()
    )
    assert priorities == full[:_RESERVOIR_K]


def test_reservoir_plan_is_take_ordered(spark):
    plan = (
        sample_reservoir(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # distributed top-k, not a global sort: per-partition k then merge
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
