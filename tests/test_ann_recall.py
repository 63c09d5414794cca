"""ANN quality gates: the bucketed/inverted approximate searches must
recover most of the exact brute-force top-k — correctness of an ANN op
is recall, not hash equality."""

from __future__ import annotations

from hive_2_spark.llm.advanced import sim_ivf_topk
from hive_2_spark.llm.similarity import sim_cosine_lsh, sim_cosine_topk
from tests.conftest import SF_DIR


def _topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r["vec_id"])
    return out


def test_ivf_recall_vs_brute_force(spark):
    exact = _topk_sets(sim_cosine_topk(spark, SF_DIR))
    approx = _topk_sets(sim_ivf_topk(spark, SF_DIR))
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    # 2-probe IVF over 10 lists: expect to recover >= 40% of exact top-5
    # on average (the structural guarantee; typically much higher)
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_dedup_embedding_finds_all_twins(spark):
    """Every synthesized near-twin (cos ~0.995) must survive the
    (label, sign-band) blocking — band recall at this cosine is ~99.8%
    per pair and the twins are constructed, so we demand all of them."""
    from hive_2_spark.llm.advanced import dedup_embedding

    pairs = {
        (r["a_id"], r["b_id"]) for r in dedup_embedding(spark, SF_DIR).collect()
    }
    expected = {(s, s + 1_000_000) for s in range(0, 500, 25)}
    assert expected <= pairs, expected - pairs


def test_pairwise_panel_is_bounded(spark):
    """The pairwise-label demo must stay a constant-size panel: each
    cross-join side is capped by _PANEL_ID_CAP regardless of corpus
    size, so the pair space can never grow quadratically with the data."""
    from hive_2_spark.llm.similarity import _PANEL_ID_CAP, sim_pairwise_label

    max_side = _PANEL_ID_CAP // 7 + 1
    rows = sim_pairwise_label(spark, SF_DIR).collect()
    n_pairs = sum(r["n_pairs"] for r in rows)
    assert n_pairs <= max_side * (max_side - 1) / 2


def test_lsh_candidates_subset_semantics(spark):
    """Sign-LSH returns true cosine values for whatever it retrieves —
    every returned (q, v, cos) must match the exact computation."""
    exact = {
        (r["q_id"], r["vec_id"]): r["cos"]
        for r in sim_cosine_topk(spark, SF_DIR).collect()
    }
    for r in sim_cosine_lsh(spark, SF_DIR).collect():
        key = (r["q_id"], r["vec_id"])
        if key in exact:
            assert abs(exact[key] - r["cos"]) < 1e-9
