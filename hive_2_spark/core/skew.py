"""Skew-mitigation operators: salting for hot keys (build-brief mandate).

The transparency contract IS the oracle: a salted join/aggregate must
produce byte-identical results to the plain form — so each query's
DuckDB oracle is simply the UNSALTED equivalent.

- ``join_salted``: big side gets a random-ish (but deterministic: pmod of
  a hash of the row) salt in [0, N); the broadcast/small side is exploded
  across all N salts; the join key becomes (key, salt). A hot key's rows
  now spread over N tasks instead of one straggler.
- ``agg_salted``: two-phase aggregation — partial agg on (key, salt),
  final agg on key. SUM/COUNT re-aggregate losslessly; AVG is carried as
  (sum, count) pairs through the first phase.

At 100 TB this is the manual fallback when AQE's skew-join splitting
cannot apply (e.g. aggregations, or broadcast-ineligible dimensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table

N_SALTS = 8


def salted_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = N_SALTS
) -> DataFrame:
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts))
    )
    exploded_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return salted_big.join(exploded_small, on=[key, "__salt"], how="inner").drop(
        "__salt"
    )


def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem x orders salted equi-join; result == plain join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_linenumber", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderstatus"
    )
    return salted_join(li, o, "okey")


def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation; result == plain groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "__salt", F.pmod(F.col("l_orderkey"), F.lit(N_SALTS))
    )
    partial = salted.groupBy("l_returnflag", "__salt").agg(
        F.sum("l_quantity").alias("ps"),
        F.count(F.lit(1)).alias("pc"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.round(F.sum("ps"), 2).alias("sum_qty"),
        F.sum("pc").alias("n"),
    )


QUERIES = {
    "join_salted": join_salted,
    "agg_salted": agg_salted,
}

ORACLES = {
    "join_salted": (
        "SELECT l_orderkey AS okey, l_linenumber, l_quantity, o_orderstatus "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ),
    "agg_salted": (
        "SELECT l_returnflag, ROUND(SUM(l_quantity), 2) AS sum_qty, "
        "COUNT(*) AS n FROM lineitem GROUP BY l_returnflag"
    ),
}
