"""Mergeable-sketch semantics: unioning per-group HLL sketches must give
the same answer as sketching the whole column directly, and at small
cardinality the estimate must be EXACT (HLL stores small sets exactly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table
from hive_2_spark.core.aggregates import agg_sketch_merge
from tests.conftest import SF_DIR


def test_union_of_group_sketches_equals_direct_sketch(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    unioned = (
        li.groupBy("l_returnflag")
        .agg(F.hll_sketch_agg("l_partkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()
        .est
    )
    direct = (
        li.agg(F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("est"))
        .first()
        .est
    )
    exact = li.select("l_partkey").distinct().count()
    assert unioned == direct
    # sf0.001 has ~200 distinct parts in lineitem — well inside the
    # sketch's exact (sparse) mode, so the estimate is not approximate.
    assert unioned == exact


def test_agg_sketch_merge_key(spark):
    row = agg_sketch_merge(spark, SF_DIR).first()
    li = load_table(spark, SF_DIR, "lineitem")
    assert row.total_rows == li.count()
    assert row.distinct_parts == li.select("l_partkey").distinct().count()


def test_kmv_estimates_track_exact_overlaps(spark):
    """agg_kmv_portable accuracy gate (round 11): every pairwise size /
    union / intersection estimate must sit within +-25% of the exact
    value at sf0.01 (k=256 => ~6.3% standard error; the priority sets
    share ~86% of their members so the draws are correlated — the gate
    leaves 4-sigma headroom). At sf0.001 the sets are smaller than k,
    so the sketch IS the set and the estimates must be EXACT."""
    from tests.conftest import SF_DIR_MID

    from hive_2_spark.core.aggregates import agg_kmv_portable

    m = (
        load_table(spark, SF_DIR_MID, "orders")
        .select(F.col("o_orderpriority").alias("t"), "o_custkey")
        .distinct()
    )
    sizes = {r.t: r.n for r in
             m.groupBy("t").agg(F.count(F.lit(1)).alias("n")).collect()}
    a = m.select(F.col("t").alias("t_a"), "o_custkey")
    b = m.select(F.col("t").alias("t_b"), "o_custkey")
    inter = {
        (r.t_a, r.t_b): r.n
        for r in a.join(b, "o_custkey")
        .filter(F.col("t_a") < F.col("t_b"))
        .groupBy("t_a", "t_b").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in agg_kmv_portable(spark, SF_DIR_MID).collect():
        ex_a, ex_b = sizes[r.t_a], sizes[r.t_b]
        ex_i = inter[(r.t_a, r.t_b)]
        ex_u = ex_a + ex_b - ex_i
        for est, exact in ((r.est_a, ex_a), (r.est_b, ex_b),
                           (r.est_union, ex_u), (r.est_intersection, ex_i)):
            assert abs(est - exact) <= 0.25 * exact, (r, est, exact)

    # exact regime at sf0.001: |set| < k -> estimates are exact counts
    m1 = (
        load_table(spark, SF_DIR, "orders")
        .select(F.col("o_orderpriority").alias("t"), "o_custkey")
        .distinct()
    )
    sizes1 = {r.t: r.n for r in
              m1.groupBy("t").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert max(sizes1.values()) < 256  # precondition for the claim
    for r in agg_kmv_portable(spark, SF_DIR).collect():
        assert r.est_a == sizes1[r.t_a] and r.est_b == sizes1[r.t_b]


def test_kmv_sketch_merge_is_exact(spark):
    """KMV mergeability contract — the property that makes the sketch a
    100 TB rollup primitive: sketch three disjoint slices of orders
    independently, union the sketches, cut back to the k smallest, and
    the result must equal the whole-corpus sketch EXACTLY (k-min merge
    is associative; no estimate drift from sharding)."""
    from pyspark.sql.window import Window

    from hive_2_spark.core.aggregates import _KMV_K, _kmv_sketch
    from tests.conftest import SF_DIR_MID

    whole = {
        (r.t, r.h) for r in _kmv_sketch(spark, SF_DIR_MID).collect()
    }
    orders = load_table(spark, SF_DIR_MID, "orders")
    parts = [
        _kmv_sketch(spark, SF_DIR_MID, orders.filter(
            F.col("o_orderkey") % 3 == i))
        for i in range(3)
    ]
    merged_df = parts[0].unionByName(parts[1]).unionByName(parts[2]).distinct()
    w = Window.partitionBy("t").orderBy(F.col("h").asc())
    merged = {
        (r.t, r.h)
        for r in merged_df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .select("t", "h")
        .collect()
    }
    assert merged == whole
    assert len(whole) > 0


def test_sample_quantile_estimates_track_exact_cdf(spark):
    """Accuracy gate for the bottom-k sample quantile sketch: the
    exact CDF evaluated AT each estimated quantile must sit within the
    k=512 two-sigma rank band of its target (2*sqrt(0.25/512) ~= 0.044
    for p50; tighter at the tails — use 6 rank points across the
    board)."""
    from hive_2_spark.core.aggregates import agg_sample_quantile_portable
    from tests.conftest import SF_DIR_MID

    est = {
        r.shard: r
        for r in agg_sample_quantile_portable(spark, SF_DIR_MID).collect()
    }
    li = load_table(spark, SF_DIR_MID, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint").alias("cents")
    )
    total = li.count()
    for q100, col in ((50, "p50_cents"), (90, "p90_cents"),
                      (99, "p99_cents")):
        v = est["ALL"][col]
        cdf = li.filter(F.col("cents") <= v).count() / total
        assert abs(cdf - q100 / 100) <= 0.06, (col, v, cdf)


def test_sample_quantile_merge_is_exact(spark):
    """Mergeability contract: bottom-k samples of three disjoint
    slices, unioned and cut back to the k smallest priorities, must
    equal the whole-corpus bottom-k sample EXACTLY — the closure that
    lets the ALL row be computed from shard samples alone."""
    from pyspark.sql.window import Window

    from hive_2_spark.core.aggregates import _SQ_K, _sq_sample
    from tests.conftest import SF_DIR_MID

    whole = {
        (r.shard, r.pri, r.okey, r.lineno)
        for r in _sq_sample(spark, SF_DIR_MID).collect()
    }
    li = load_table(spark, SF_DIR_MID, "lineitem")
    parts = [
        _sq_sample(spark, SF_DIR_MID, li.filter(F.col("l_orderkey") % 3 == i))
        for i in range(3)
    ]
    merged_df = parts[0].unionByName(parts[1]).unionByName(parts[2])
    w = Window.partitionBy("shard").orderBy("pri", "okey", "lineno")
    merged = {
        (r.shard, r.pri, r.okey, r.lineno)
        for r in merged_df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _SQ_K)
        .collect()
    }
    assert merged == whole
    assert len(whole) > 0
