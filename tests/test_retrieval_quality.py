"""Semantics of the repetition quality gates and lexical retrieval,
pinned on synthetic docs with KNOWN repetition structure / term stats
(the oracle proves cross-engine agreement; these prove the numbers mean
what the docstrings claim)."""

from __future__ import annotations

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hive_2_spark.llm.quality import quality_dup_ngram_corpus, quality_repetition
from hive_2_spark.llm.retrieval import bm25_topk, keyword_search_and
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    """Docs with hand-computable stats. Layout mirrors the driver's
    tables (only `documents` is populated; other tables unused here)."""
    d = str(tmp_path_factory.mktemp("sf_synth"))
    docs = [
        # doc 1: "spam spam spam spam" — top word frac 1.0, every bigram
        # identical ("spam spam" x3 -> dup_bigram_frac = 2/3)
        (1, "spam spam spam spam", "en", "s", 19),
        # doc 2: all distinct words/bigrams -> frac 1/6, dup 0.0
        (2, "alpha beta gamma delta epsilon zeta", "en", "s", 35),
        # docs 3+4: identical 6-word text -> all 5-gram shingles shared
        (3, "one two three four five six", "en", "s", 27),
        (4, "one two three four five six", "en", "s", 27),
        # doc 5: shares no 5-gram with anyone
        (5, "seven eight nine ten eleven twelve", "en", "s", 34),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in docs], pa.int64()),
            "text": [r[1] for r in docs],
            "lang": [r[2] for r in docs],
            "source": [r[3] for r in docs],
            "n_chars": pa.array([r[4] for r in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    return d


def test_repetition_metrics_exact(spark, synth_dir):
    rows = {r["doc_id"]: r for r in quality_repetition(spark, synth_dir).collect()}
    assert rows[1]["top_word_frac"] == 1.0
    assert rows[1]["dup_bigram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert rows[1]["repetitive"] is True
    assert rows[2]["top_word_frac"] == pytest.approx(1 / 6, abs=1e-6)
    assert rows[2]["dup_bigram_frac"] == 0.0
    assert rows[2]["repetitive"] is False


def test_repetition_survives_short_docs(spark, tmp_path):
    """Docs with <2 words must yield zero bigrams, not crash: unguarded
    sequence(1, size-1) evaluates sequence(1, 0) = [1, 0] (descending!)
    and the transform then calls slice(ws, 0, 2) -> INVALID_PARAMETER_VALUE."""
    d = str(tmp_path / "short")
    os.makedirs(d)
    docs = [(1, "solo"), (2, ""), (3, "two words")]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in docs], pa.int64()),
            "text": [r[1] for r in docs],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": pa.array([len(r[1]) for r in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    rows = {r["doc_id"]: r for r in quality_repetition(spark, d).collect()}
    assert rows[1]["dup_bigram_frac"] == 0.0
    assert rows[2]["dup_bigram_frac"] == 0.0
    assert rows[3]["n_words"] == 2 and rows[3]["dup_bigram_frac"] == 0.0


def test_dup_ngram_corpus_exact(spark, synth_dir):
    rows = {
        r["doc_id"]: r for r in quality_dup_ngram_corpus(spark, synth_dir).collect()
    }
    # identical docs 3/4: every one of their 2 distinct 5-grams is shared
    assert rows[3]["n_grams"] == 2 and rows[3]["dup_frac"] == 1.0
    assert rows[4]["dup_frac"] == 1.0
    # doc 5: nothing shared
    assert rows[5]["dup_frac"] == 0.0
    # doc 1 has only 4 words -> excluded entirely
    assert 1 not in rows
    # doc 2: 6 words -> 2 grams, none shared
    assert rows[2]["dup_frac"] == 0.0


def test_bm25_ranks_higher_tf_density_first(spark):
    """Within one query, a doc that matches more query terms with higher
    tf (relative to its length) must outrank a doc with a bare single
    hit — check the invariant rather than absolute scores."""
    rows = bm25_topk(spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))  # dense 1..k
        scores = [r["score"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True)  # monotone
        assert all(s > 0 for s in scores)  # idf(1 + x) > 0 always


def test_bm25_score_hand_computed(spark, synth_dir):
    """Pin one score end-to-end on the synthetic corpus: query 1 term
    'spam' appears 4x in doc 1 (dl=4, N=5, df=1, avgdl=28/5)."""
    import hive_2_spark.llm.retrieval as R

    orig = R._QUERIES
    R._QUERIES = [(1, "spam")]
    try:
        rows = bm25_topk(spark, synth_dir).collect()
    finally:
        R._QUERIES = orig
    assert len(rows) == 1
    idf = math.log(1 + (5 - 1 + 0.5) / (1 + 0.5))
    expect = idf * (4 * 2.2) / (4 + 1.2 * (1 - 0.75 + 0.75 * 4 / (28 / 5)))
    assert rows[0]["doc_id"] == 1
    assert rows[0]["score"] == pytest.approx(expect, abs=1e-6)


def test_keyword_and_requires_all_terms(spark, synth_dir):
    import hive_2_spark.llm.retrieval as R

    orig = R._QUERIES
    # 'one' AND 'six' -> docs 3,4; 'one' AND 'seven' -> nothing
    R._QUERIES = [(1, "one"), (1, "six"), (2, "one"), (2, "seven")]
    try:
        rows = {r["query_id"]: r for r in keyword_search_and(spark, synth_dir).collect()}
    finally:
        R._QUERIES = orig
    assert rows[1]["n_matching_docs"] == 2 and rows[1]["first_doc_id"] == 3
    assert 2 not in rows


def test_mmr_demotes_planted_near_duplicate():
    """A near-duplicate of the top hit must NOT be picked second by
    MMR even though pure relevance would rank it there — the diversity
    term is the point of the operator, and random fixture vectors
    exercise it only mildly."""
    from collections import namedtuple

    import numpy as np

    from hive_2_spark.llm.similarity import _MMR_K, _mmr_greedy

    Row = namedtuple("Row", ["vec_id", "rel", "vec"])
    rng = np.random.default_rng(7)
    base = rng.normal(size=8)
    twin = base + rng.normal(scale=1e-3, size=8)  # cosine ~ 1.0
    cands = [
        Row(10, 0.90, list(base)),
        Row(11, 0.89, list(twin)),  # relevance runner-up, near-dup of 10
    ]
    # distinct fillers with relevance just below the twin
    for i in range(6):
        cands.append(Row(20 + i, 0.80 - i * 0.01, list(rng.normal(size=8))))
    out = _mmr_greedy(0, cands)
    picked = [vec_id for (_q, _rk, vec_id, _s) in out]
    assert len(picked) == _MMR_K
    assert picked[0] == 10          # pure relevance wins round 1
    assert picked[1] != 11          # the near-dup is demoted...
    assert 11 not in picked[:4]     # ...well below its relevance rank


def test_mmr_differs_from_pure_topk_on_fixture(spark):
    """On the real fixture the diversity term must change at least one
    selection vs sim_cosine_topk — otherwise the op is vacuous here."""
    from tests.conftest import SF_DIR
    from hive_2_spark.llm.similarity import retrieval_mmr, sim_cosine_topk

    mmr = {
        (r.q_id, r.rk): r.vec_id for r in retrieval_mmr(spark, SF_DIR).collect()
    }
    top = {
        (r.q_id, r.rk): r.vec_id
        for r in sim_cosine_topk(spark, SF_DIR).collect()
    }
    assert any(mmr[k] != top.get(k) for k in mmr)


def test_phrase_search_matches_pure_python_scan(spark):
    """Engine-independent ground truth: a plain Python scan over the
    raw text must agree with the anchor-trick result exactly."""
    import duckdb

    from hive_2_spark.llm.retrieval import (
        _PHRASES,
        phrase_search_positional,
    )
    from tests.conftest import SF_DIR_MID

    texts = duckdb.connect().execute(
        "SELECT doc_id, text FROM "
        f"read_parquet('{SF_DIR_MID}/documents.parquet')"
    ).fetchall()
    expected = {}
    for qid, phrase in _PHRASES:
        ts = phrase.split(" ")
        docs, occ = set(), 0
        for doc_id, text in texts:
            ws = text.split(" ")
            hits = sum(
                1
                for i in range(len(ws) - len(ts) + 1)
                if ws[i : i + len(ts)] == ts
            )
            if hits:
                docs.add(doc_id)
                occ += hits
        if docs:
            expected[qid] = (len(docs), occ, min(docs))
    got = {
        r.query_id: (r.n_docs, r.n_occurrences, r.first_doc_id)
        for r in phrase_search_positional(spark, SF_DIR_MID).collect()
    }
    assert got == expected and expected
