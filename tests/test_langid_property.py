"""Property-based gates for text_langid_profile's classification rule
(round 10). The operator is a pure function of the corpus: profiles =
top-K bigrams per language (count desc, bigram asc), prediction =
argmax distinct-bigram overlap (score desc, language asc), zero-overlap
-> 'und'. Hypothesis generates tiny labeled corpora; each example
re-derives the expected confusion matrix with plain Python and asserts
the Spark output matches exactly — an oracle independent of both Spark
AND DuckDB."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import hive_2_spark.llm.text as T

_WORDS = ["ga", "bo", "tu", "ne", "ki", "ra", "so", "mi"]
_LANGS = ["aa", "bb", "cc"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=9).map(" ".join)


def _reference_confusion(rows: list[tuple[int, str, str]]) -> dict:
    """Plain-Python re-derivation of the operator's spec."""

    def bigrams(text: str) -> list[str]:
        t = text.split(" ")
        return [f"{a} {b}" for a, b in zip(t, t[1:])]

    counts: Counter = Counter()
    for _, lang, text in rows:
        for bg in bigrams(text):
            counts[(lang, bg)] += 1
    profiles: dict[str, set] = {}
    for lang in {r[1] for r in rows}:
        ranked = sorted(
            ((c, bg) for (lg, bg), c in counts.items() if lg == lang),
            key=lambda t: (-t[0], t[1]),
        )[: T._LANGID_TOP_K]
        profiles[lang] = {bg for _, bg in ranked}
    conf: Counter = Counter()
    for _, lang, text in rows:
        dbg = set(bigrams(text))
        scores = {
            lg: len(dbg & prof)
            for lg, prof in profiles.items()
            if len(dbg & prof) > 0
        }
        pred = (
            min(scores, key=lambda lg: (-scores[lg], lg))
            if scores
            else "und"
        )
        conf[(lang, pred)] += 1
    return dict(conf)


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(st.sampled_from(_LANGS), _doc),
        min_size=2, max_size=10,
    )
)
def test_confusion_matrix_matches_python_reference(spark, tmp_path_factory, data):
    rows = [(i, lang, text) for i, (lang, text) in enumerate(data)]
    tmp = tmp_path_factory.mktemp("langid_prop")
    spark.createDataFrame(
        [(i, t, lg, "src0", len(t)) for i, lg, t in rows],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    got = {
        (r.lang_true, r.lang_pred): r.n_docs
        for r in T.text_langid_profile(spark, str(tmp)).collect()
    }
    assert got == _reference_confusion(rows)
