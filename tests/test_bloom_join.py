"""Bloom-filter join pruning: the prune must keep every true match
(zero false negatives — a Bloom filter's structural guarantee) and
drop the bulk of non-matching fact rows (the point of shipping it)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table
from hive_2_spark.core.joins import (
    _BLOOM_K,
    _BLOOM_BITS_PER_KEY,
    _bloom_pos,
    join_bloom_pruned,
)
from tests.conftest import SF_DIR_MID


def test_bloom_prune_no_false_negatives_and_selective(spark):
    dim = load_table(spark, SF_DIR_MID, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    keys = dim.select(F.col("c_custkey").alias("k"))
    n_keys = keys.count()
    m_words = (n_keys * _BLOOM_BITS_PER_KEY + 63) // 64
    m_bits = m_words * 64

    # build the bit set with the SAME Spark expressions the op uses
    pos_rows = keys.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("k"), i, m_bits) for i in range(_BLOOM_K)])
        ).alias("p")
    ).collect()
    bitset = {r.p for r in pos_rows}

    probe = (
        load_table(spark, SF_DIR_MID, "orders")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .select(
            "k",
            *[
                _bloom_pos(F.col("k"), i, m_bits).alias(f"p{i}")
                for i in range(_BLOOM_K)
            ],
        )
        .collect()
    )
    true_keys = {r.k for r in keys.collect()}
    passed = {
        r.k
        for r in probe
        if all(getattr(r, f"p{i}") in bitset for i in range(_BLOOM_K))
    }
    all_probed = {r.k for r in probe}

    # Bloom guarantee: every true match passes
    assert true_keys & all_probed <= passed
    # selectivity: false-positive rate among non-members under 2%
    # (theory: ~0.1% at 16 bits/key, k=3; generous margin for variance)
    non_members = all_probed - true_keys
    fps = passed - true_keys
    assert non_members, "fixture should contain non-member custkeys"
    assert len(fps) / len(non_members) < 0.02, (
        f"fpp {len(fps)}/{len(non_members)}"
    )


def test_bloom_join_result_has_expected_shape(spark):
    rows = join_bloom_pruned(spark, SF_DIR_MID).collect()
    assert rows and {len(r) for r in rows} == {3}
    assert all(r.n_orders > 0 and r.revenue > 0 for r in rows)
