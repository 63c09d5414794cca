"""Skew mitigation on DELIBERATELY skewed data: salting spreads the hot
key across salt groups while the final result stays identical to the
plain computation."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table
from hive_2_spark.core.skew import N_SALTS, salted_join
from tests.conftest import SF_DIR


def _skewed_orders(spark):
    """~80% of rows collapsed onto one hot customer key."""
    o = load_table(spark, SF_DIR, "orders")
    return o.withColumn(
        "ckey",
        F.when(F.col("o_orderkey") % 5 != 0, F.lit(7)).otherwise(
            F.col("o_custkey")
        ),
    )


def test_salted_agg_spreads_hot_key(spark):
    sk = _skewed_orders(spark)
    salted = sk.withColumn(
        "__salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(N_SALTS))
    )
    partial = salted.groupBy("ckey", "__salt").agg(
        F.sum("o_totalprice").alias("ps"), F.count(F.lit(1)).alias("pc")
    )
    # the hot key's work is split across (almost certainly all) N salts
    hot_groups = partial.filter(F.col("ckey") == 7).count()
    assert hot_groups >= N_SALTS - 1
    # and re-aggregation loses nothing
    final = partial.groupBy("ckey").agg(
        F.round(F.sum("ps"), 2).alias("s"), F.sum("pc").alias("n")
    )
    plain = sk.groupBy("ckey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    got = {r["ckey"]: (r["s"], r["n"]) for r in final.collect()}
    want = {r["ckey"]: (r["s"], r["n"]) for r in plain.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][1] == want[k][1]
        assert abs(got[k][0] - want[k][0]) < 0.02  # order-of-summation only


def test_salted_join_on_skewed_keys_matches_plain(spark):
    sk = _skewed_orders(spark).select(
        F.col("ckey").alias("okey"), "o_orderkey", "o_totalprice"
    )
    dim = (
        load_table(spark, SF_DIR, "customer")
        .select(F.col("c_custkey").alias("okey"), "c_name")
    )
    salted = salted_join(sk, dim, "okey")
    plain = sk.join(dim, on="okey", how="inner")
    assert salted.count() == plain.count()
    a = {tuple(r) for r in salted.select("okey", "o_orderkey", "c_name").collect()}
    b = {tuple(r) for r in plain.select("okey", "o_orderkey", "c_name").collect()}
    assert a == b
