"""Property-based gates for llm.dedup.classify_against_corpus — the
delta-vs-corpus rule the continuous-update pipeline trusts. Hypothesis
generates corpora; Spark round-trips are per-case, so examples are few
but each asserts exact semantic invariants."""

from __future__ import annotations

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hive_2_spark.llm.dedup import classify_against_corpus

_WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
          "golf", "hotel", "india", "juliet", "kilo", "lima"]

_doc = st.lists(
    st.sampled_from(_WORDS), min_size=6, max_size=14
).map(" ".join)


def _frames(spark, corpus_texts, delta_texts):
    ex = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], "doc_id long, text string"
    )
    nb = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(delta_texts)],
        "new_id long, text string",
    )
    return ex, nb


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_doc, min_size=2, max_size=6, unique=True))
def test_exact_copy_of_corpus_doc_is_always_exact(spark, docs):
    """Any verbatim copy of a corpus doc must classify 'exact' with the
    smallest matching corpus id."""
    ex, nb = _frames(spark, docs, [docs[0]])
    out = classify_against_corpus(ex, nb).collect()
    assert len(out) == 1
    r = out[0]
    assert r.verdict == "exact"
    assert r.match_id == min(
        i for i, t in enumerate(docs) if t == docs[0]
    )


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_doc, min_size=2, max_size=5, unique=True))
def test_disjoint_vocabulary_delta_is_always_novel(spark, docs):
    """A delta doc sharing NO words with the corpus can never be exact
    or near (zero Jaccard, no band can verify)."""
    foreign = " ".join(
        "".join(c.upper() for c in w) + "zz" for w in _WORDS[:8]
    )
    assert all(w not in foreign.split() for d in docs for w in d.split())
    ex, nb = _frames(spark, docs, [foreign])
    out = classify_against_corpus(ex, nb).collect()
    assert len(out) == 1
    assert out[0].verdict == "novel"
    assert out[0].match_id is None


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(st.sampled_from(_WORDS), min_size=10, max_size=12,
                  unique=True).map(" ".join),
    punct=st.sampled_from([",", ".", "!", "  "]),
)
def test_normalization_invariance(spark, base, punct):
    """Case and punctuation differences alone still classify 'exact' —
    the classifier normalizes before fingerprinting."""
    noisy = base.upper().replace(" ", punct + " ", 3)
    ex, nb = _frames(spark, [base, "unrelated " + " ".join(_WORDS[:3])],
                     [noisy])
    out = classify_against_corpus(ex, nb).collect()
    assert out[0].verdict == "exact", (base, noisy, out)


def test_verdict_partition_is_total(spark):
    """Every delta row gets exactly one verdict from {exact,near,novel}
    — no row is dropped or duplicated by the left joins."""
    docs = [" ".join(_WORDS[i:i + 8]) for i in range(4)]
    delta = [docs[0], docs[1] + " extraword", "totally different thing",
             docs[0]]  # includes a duplicate delta row
    ex, nb = _frames(spark, docs, delta)
    out = classify_against_corpus(ex, nb).collect()
    assert len(out) == len(delta)
    assert {r.verdict for r in out} <= {"exact", "near", "novel"}
