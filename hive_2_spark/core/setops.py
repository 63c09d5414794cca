"""Set operations (SURVEY.md §2B op 39).

UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL] with the exact SQL bag/set
semantics. Scale notes: UNION ALL is a free concatenation (no shuffle);
the DISTINCT variants shuffle on the full row — keep projections narrow
before applying them (done here: key columns only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table


def _cust_nations(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
    )


def _supp_nations(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
    )


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): nations having customers or suppliers."""
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag): one row per customer/supplier, then counted."""
    u = _cust_nations(spark, sf_dir).unionAll(_supp_nations(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): nations with both customers and suppliers."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with customers but no suppliers."""
    return _cust_nations(spark, sf_dir).subtract(_supp_nations(spark, sf_dir))


def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — min multiplicity)."""
    return _cust_nations(spark, sf_dir).intersectAll(_supp_nations(spark, sf_dir))


def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION by column NAME, not position, with missing columns filled
    NULL (``unionByName(allowMissingColumns=True)`` / DuckDB
    ``UNION ALL BY NAME``) — the schema-drift-tolerant concatenation a
    multi-source ingest needs."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return c.unionByName(s, allowMissingColumns=True)


QUERIES = {
    "set_union": set_union,
    "set_union_by_name": set_union_by_name,
    "set_union_all": set_union_all,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "set_intersect_all": set_intersect_all,
}

ORACLES = {
    "set_union_by_name": (
        "SELECT c_custkey AS id, c_name AS name FROM customer "
        "UNION ALL BY NAME "
        "SELECT s_suppkey AS id, s_name AS name, s_acctbal AS acctbal "
        "FROM supplier"
    ),
    "set_union": (
        "SELECT c_nationkey AS nationkey FROM customer UNION "
        "SELECT s_nationkey FROM supplier"
    ),
    "set_union_all": (
        "SELECT nationkey, COUNT(*) AS n FROM ("
        "SELECT c_nationkey AS nationkey FROM customer UNION ALL "
        "SELECT s_nationkey FROM supplier) u GROUP BY nationkey"
    ),
    "set_intersect": (
        "SELECT c_nationkey AS nationkey FROM customer INTERSECT "
        "SELECT s_nationkey FROM supplier"
    ),
    "set_except": (
        "SELECT c_nationkey AS nationkey FROM customer EXCEPT "
        "SELECT s_nationkey FROM supplier"
    ),
    "set_intersect_all": (
        "SELECT c_nationkey AS nationkey FROM customer INTERSECT ALL "
        "SELECT s_nationkey FROM supplier"
    ),
}
