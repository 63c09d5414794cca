"""Semantics of the composed pipeline keys (the oracle proves
cross-engine agreement; these prove the numbers mean what the
docstrings claim)."""

from __future__ import annotations

from hive_2_spark.llm.pipeline import curation_funnel, dedup_clusters_semantic
from tests.conftest import SF_DIR


def test_funnel_stages_shrink_monotonically(spark):
    rows = sorted(
        curation_funnel(spark, SF_DIR).collect(), key=lambda r: r["stage_idx"]
    )
    assert [r["stage"] for r in rows] == [
        "01_ingest",
        "02_lang_en",
        "03_quality",
        "04_exact_dedup",
        "05_near_dedup",
        "06_decontaminated",
        "07_train",
    ]
    counts = [r["n_docs"] for r in rows]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[0] > counts[-1] > 0  # every boundary does real work


def test_funnel_ingest_counts_corpus_with_twins(spark):
    from hive_2_spark.catalog import load_table

    n_docs = load_table(spark, SF_DIR, "documents").count()
    n_seeds = (
        load_table(spark, SF_DIR, "documents")
        .filter("doc_id % 10 = 0")
        .count()
    )
    ingest = {
        r["stage"]: r["n_docs"] for r in curation_funnel(spark, SF_DIR).collect()
    }["01_ingest"]
    assert ingest == n_docs + 2 * n_seeds


def test_semantic_clusters_pair_every_twin_with_its_seed(spark):
    """The embedding fixture's synthesized twins (+1M ids, cos ~0.995 to
    their seed) must each land in their seed's cluster, labeled by the
    seed (the min id)."""
    got = {
        r["vec_id"]: r["cluster"]
        for r in dedup_clusters_semantic(spark, SF_DIR).collect()
    }
    twins = [v for v in got if v >= 1_000_000]
    assert twins  # non-vacuous
    for t in twins:
        assert got[t] == t - 1_000_000
        assert got[t - 1_000_000] == t - 1_000_000
