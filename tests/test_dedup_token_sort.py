"""Ground truth for token-sort dedup: planted word-order permutation
twins (reversed docs, doc_id + 30M) must collapse under the token-sort
fingerprint and must NOT collapse under the exact fingerprint."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_2_spark.llm.dedup import dedup_exact, dedup_token_sort
from tests.conftest import SF_DIR


def test_token_sort_collapses_permutations_exact_does_not(spark):
    ts = dedup_token_sort(spark, SF_DIR)
    # every seed doc (doc_id % 10 == 0) has base + exact twin (+20M) +
    # reversed twin (+30M): a token-sort group of >= 3
    n_seeds = ts.filter(
        (F.col("keep_id") % 10 == 0) & (F.col("n_copies") >= 3)
    ).count()
    assert n_seeds > 0
    # exact dedup on ITS corpus (no reversed twins) maxes at 2 copies —
    # the reversed twin would not have matched anyway: different fp
    ex_max = dedup_exact(spark, SF_DIR).agg(F.max("n_copies")).collect()[0][0]
    assert ex_max == 2
    # keep_id of a >=3 group is the BASE doc (lowest id)
    sample = ts.filter(F.col("n_copies") >= 3).limit(5).collect()
    for r in sample:
        assert r["keep_id"] < 10_000_000
