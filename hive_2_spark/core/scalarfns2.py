"""Scalar function surface, breadth extension (SURVEY.md §2B op 40).

Second tranche of the function library: padding/case/reverse/translate/
edit-distance for strings; month arithmetic and week/day-of-year for
dates; hashing. Same discipline as scalarfns.py: JVM built-ins only,
outputs in hash-stable types, libm transcendentals excluded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table


def fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lpad("c_name", 25, "*").alias("name_lpad"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_rpad"),
        F.initcap(F.lower("c_mktsegment")).alias("seg_title"),
        F.reverse("c_name").alias("name_rev"),
        F.translate("c_name", "#0", "_O").alias("name_trans"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).alias(
            "lev_building"
        ),
        F.repeat(F.lit("ab"), 3).alias("repeated"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.left(F.col("c_name"), F.lit(8)).alias("name_left8"),
    )


def fn_date2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus3mo"),
        F.weekofyear("o_orderdate").cast("long").alias("week_no"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.dayofweek("o_orderdate").cast("long").alias("dow_1sun"),
        F.date_sub(F.col("o_orderdate"), 7).cast("timestamp").alias("week_before"),
        F.make_date(
            F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)
        ).cast("timestamp").alias("month_floor"),
    )


def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-stable hashes: md5 / sha2-256 (DuckDB lacks sha1)."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.md5(F.col("n_name")).alias("h_md5"),
        F.sha2(F.col("n_name").cast("binary"), 256).alias("h_sha256"),
    )


QUERIES = {
    "fn_string2": fn_string2,
    "fn_date2": fn_date2,
    "fn_hash": fn_hash,
}

ORACLES = {
    "fn_string2": (
        "SELECT c_custkey, "
        "lpad(c_name, 25, '*') AS name_lpad, "
        "rpad(c_mktsegment, 12, '.') AS seg_rpad, "
        "list_aggregate(list_transform(string_split(lower(c_mktsegment), ' '), "
        "  x -> UPPER(x[1]) || x[2:]), 'string_agg', ' ') AS seg_title, "
        "reverse(c_name) AS name_rev, "
        "translate(c_name, '#0', '_O') AS name_trans, "
        "CAST(levenshtein(c_mktsegment, 'BUILDING') AS INT) AS lev_building, "
        "repeat('ab', 3) AS repeated, "
        "CAST(CASE WHEN strpos(c_name, '#') IS NULL THEN 0 "
        "     ELSE strpos(c_name, '#') END AS INT) AS hash_pos, "
        "left(c_name, 8) AS name_left8 "
        "FROM customer"
    ),
    "fn_date2": (
        "SELECT o_orderkey, "
        "CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS TIMESTAMP) "
        "  AS plus3mo, "
        "CAST(weekofyear(o_orderdate) AS BIGINT) AS week_no, "
        "CAST(dayofyear(o_orderdate) AS BIGINT) AS doy, "
        "CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow_1sun, "
        "CAST(CAST(o_orderdate - INTERVAL 7 DAY AS DATE) AS TIMESTAMP) "
        "  AS week_before, "
        "CAST(make_date(CAST(year(o_orderdate) AS INT), "
        "  CAST(month(o_orderdate) AS INT), 1) AS TIMESTAMP) AS month_floor "
        "FROM orders"
    ),
    "fn_hash": (
        "SELECT n_nationkey, "
        "md5(n_name) AS h_md5, "
        "sha256(n_name) AS h_sha256 "
        "FROM nation"
    ),
}
