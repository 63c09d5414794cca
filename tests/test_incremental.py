"""Incremental aggregate maintenance == full recomputation, fold by fold."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table
from hive_2_spark.core.incremental import IncrementalAggregate
from tests.conftest import SF_DIR


def _full(df):
    return {
        r["o_custkey"]: (r["sum_v"], r["n"], r["min_v"], r["max_v"])
        for r in df.groupBy("o_custkey")
        .agg(
            F.sum("o_totalprice").alias("sum_v"),
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("min_v"),
            F.max("o_totalprice").alias("max_v"),
        )
        .collect()
    }


def _summary(agg):
    return {
        r["o_custkey"]: (r["sum_v"], r["n"], r["min_v"], r["max_v"])
        for r in agg.current().collect()
    }


def test_fold_equals_full_recompute(spark, tmp_path):
    o = load_table(spark, SF_DIR, "orders")
    batch1 = o.filter(F.col("o_orderkey") % 3 == 0)
    batch2 = o.filter(F.col("o_orderkey") % 3 == 1)
    batch3 = o.filter(F.col("o_orderkey") % 3 == 2)

    agg = IncrementalAggregate(
        spark, str(tmp_path / "summary"), "o_custkey", "o_totalprice"
    )
    agg.init(batch1)
    assert _summary(agg) == _full(batch1)

    agg.fold(batch2)
    agg.fold(batch3)
    got, want = _summary(agg), _full(o)
    assert set(got) == set(want)
    for k in want:
        gs, gn, gmin, gmax = got[k]
        ws, wn, wmin, wmax = want[k]
        assert gn == wn and gmin == wmin and gmax == wmax
        assert abs(gs - ws) < 1e-6  # sums merged in different order

    # derived avg at read time
    row = agg.read().filter(F.col("n") > 0).first()
    assert abs(row["avg_v"] - row["sum_v"] / row["n"]) < 1e-12
