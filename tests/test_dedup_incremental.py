"""Semantics of incremental (delta-vs-corpus) dedup: the synthesized
batch has known ground truth per residue class, so verdicts are
checkable exactly (the oracle proves cross-engine agreement)."""

from __future__ import annotations

from hive_2_spark.llm.dedup import (
    _NB_EXACT,
    _NB_NEAR,
    _NB_NOVEL,
    dedup_incremental,
)
from tests.conftest import SF_DIR_MID


def test_incremental_verdicts_match_ground_truth(spark):
    rows = {
        r["new_id"]: r for r in dedup_incremental(spark, SF_DIR_MID).collect()
    }
    exact = [r for r in rows.values() if r["new_id"] < _NB_NEAR]
    near = [
        r for r in rows.values() if _NB_NEAR <= r["new_id"] < _NB_NOVEL
    ]
    novel = [r for r in rows.values() if r["new_id"] >= _NB_NOVEL]
    assert exact and near and novel

    # verbatim re-arrivals: ALWAYS exact, matched to their source doc
    for r in exact:
        assert r["verdict"] == "exact"
        assert r["match_id"] == r["new_id"] - _NB_EXACT

    # appended-edit arrivals: never exact; banding recall >= 80% (the
    # 8-slot signature can miss a short doc whose min-slots shift), and
    # every hit matches the true source
    assert all(r["verdict"] != "exact" for r in near)
    hits = [r for r in near if r["verdict"] == "near"]
    assert len(hits) / len(near) >= 0.8
    for r in hits:
        # matched to the SMALLEST similar existing doc: that is the true
        # source unless the corpus itself holds an even-smaller near-dup
        # of it, so the match is bounded by the source id
        assert r["match_id"] is not None
        assert r["match_id"] <= r["new_id"] - _NB_NEAR

    # gibberish arrivals share no vocabulary: always novel, no match
    for r in novel:
        assert r["verdict"] == "novel" and r["match_id"] is None
