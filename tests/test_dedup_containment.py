"""Planted ground truth for the containment / substring-window dedup ops.

- ``dedup_containment``: every synthesized excerpt (doc_id % 10 == 5 ->
  first half of normalized words as doc_id + 30M) must be reported as
  contained in its seed with containment 1.0 — the asymmetric case
  word-shingle Jaccard misses by construction.
- ``dedup_substring_windows``: every synthesized exact twin
  (doc_id + 20M in ``corpus_with_dups``) must be flagged with
  dup_frac 1.0 (all of its 32-char windows occur in the seed too).
- ``curriculum_order``: positions are contiguous ranks per
  (bucket, shard); buckets are the quality score x10.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

_EXC = 30_000_000
_EXACT = 20_000_000


def test_containment_finds_every_excerpt(spark):
    from hive_2_spark.llm.dedup import dedup_containment
    from hive_2_spark.catalog import load_table

    from hive_2_spark.llm.dedup import _NORM

    out = dedup_containment(spark, SF_DIR)
    rows = {
        (r.a_id, r.b_id): r.containment
        for r in out.filter(F.col("a_id") >= _EXC).collect()
    }
    # Excerpts of docs shorter than ~20 normalized words have fewer
    # than 5 distinct shingles and fall below the operator's
    # minimum-evidence bar (a_grams >= 5) by design — assert only on
    # seeds long enough to clear it.
    seeds = [
        r.doc_id
        for r in load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") % 10 == 5)
        .filter(F.size(F.split(_NORM(F.col("text")), " ")) >= 20)
        .select("doc_id")
        .collect()
    ]
    assert seeds, "fixture must contain long doc_id % 10 == 5 seeds"
    for s in seeds:
        # the excerpt's grams are a strict prefix of the seed's grams
        assert rows.get((s + _EXC, s)) == 1.0, f"excerpt of {s} missed"


def test_containment_is_asymmetric(spark):
    """No seed may be reported as contained in its own half-excerpt
    (the excerpt lacks the seed's tail grams)."""
    from hive_2_spark.llm.dedup import dedup_containment

    out = dedup_containment(spark, SF_DIR)
    bad = out.filter(
        (F.col("b_id") >= _EXC) & (F.col("a_id") == F.col("b_id") - _EXC)
    ).count()
    assert bad == 0


def test_substring_windows_flags_exact_twins(spark):
    from hive_2_spark.llm.dedup import dedup_substring_windows

    out = dedup_substring_windows(spark, SF_DIR)
    twins = {
        r.doc_id: r.dup_frac
        for r in out.filter(F.col("doc_id") >= _EXACT).collect()
    }
    assert twins, "exact twins must be flagged"
    assert all(v == 1.0 for v in twins.values()), twins


def test_curriculum_positions_are_contiguous_ranks(spark):
    from hive_2_spark.llm.curation import curriculum_order

    out = curriculum_order(spark, SF_DIR).collect()
    assert len(out) > 0
    groups: dict[tuple, list[int]] = {}
    for r in out:
        assert 0 <= r.bucket <= 10
        groups.setdefault((r.bucket, r.shard), []).append(r.pos)
    for key, poss in groups.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), key
