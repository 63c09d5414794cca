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
