"""Scalar function surface (SURVEY.md §2A ops 21-25, §2B op 40).

Reference parity (citations into /root/reference/):
- type-cast on ingest: classes/hive/model.php:297 + classes/hive/field/*.php
  (every __set normalizes through field->value()).
- timestamp parse/format: classes/hive/field/timestamp.php:30-45
  (strtotime on input, date($format) on output).
- number display formatting: classes/hive/field/float.php:33-43.
- boolean verbose map: classes/hive/field/boolean.php:28-33.
- row -> JSON: classes/hive/model.php:392-395, 470-473 (as_json()).
- default-value materialization: classes/hive/model.php:343-364, 612-634.

Everything is a JVM-side built-in (whole-stage codegen) — no Python in
the row path. Float-returning transcendentals (log/exp) are excluded from
oracle-hashed outputs because libm last-ulp behavior is engine-specific;
sqrt IS included (IEEE-754 requires correct rounding, so it is bit-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table


def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/trim/substring/length/concat/replace/regexp_extract."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
    )


def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/quarter/dayofweek/date_trunc/date_add/datediff/last_day."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate"), 30).cast("timestamp").alias("due_date"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
    )


def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/ceil/floor/round/sqrt/mod/sign/power — bit-exact subset only."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc_delta"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
    )


def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / greatest / least."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("(dflt)")).alias(
            "seg_or_default"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_cap1k"),
    )


def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
    )


def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split/array size/element access/contains over derived arrays."""
    p = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_type"), " ")
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.array_contains(words, "BRASS").alias("has_brass"),
    )


def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating function: one row per word of p_type (UNNEST)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.explode(F.split(F.col("p_type"), " ")).alias("word")
    )


# ---------------------------------------------------------- Layer-A ops
def cast_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op 21: field->value() typing boundary — explicit casts at ingest."""
    li = load_table(spark, sf_dir, "lineitem")
    # Final outputs stay in hash-stable types (bigint/string/double/timestamp):
    # DATE and DECIMAL round-trip through the cast but are re-widened so both
    # engines' pandas/Arrow renderings agree cell-for-cell.
    return li.select(
        F.col("l_linenumber").cast("bigint").alias("linenumber_i64"),
        F.col("l_orderkey").cast("string").alias("orderkey_str"),
        F.col("l_shipdate").cast("date").cast("timestamp").alias("ship_day"),
        F.col("l_quantity").cast("decimal(12,2)").cast("double").alias("qty_dec"),
    )


def ts_parse_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op 22: strtotime-in / date($format)-out — parse + format roundtrip."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("iso_full"),
        F.to_timestamp(F.date_format("o_orderdate", "yyyy-MM-dd")).alias(
            "reparsed"
        ),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


def num_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op 23: float decimals display formatting (Hive_Field_Float)."""
    c = load_table(spark, sf_dir, "customer")
    # printf-style (no thousands separator): DuckDB's format() refuses
    # thousand separators on floats, so both sides use %.2f. The display
    # path with separators (format_number) lives in the model layer.
    return c.select(
        "c_custkey",
        F.format_string("%.2f", F.col("c_acctbal")).alias("bal_disp"),
    )


def bool_verbose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op 24: TRUE/FALSE -> 'Yes'/'No' verbose rendering."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") >= 0, "Yes").otherwise("No").alias("in_credit"),
    )


def row_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op 25: as_json() — whole row serialized to a JSON string."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.to_json(F.struct("n_nationkey", "n_name", "n_regionkey")).alias("js"),
    )


def fill_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op 31: reset()/__unset default materialization — falsy -> default."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("(open)")).alias(
            "status_filled"
        ),
    )


QUERIES = {
    "fn_string": fn_string,
    "fn_date": fn_date,
    "fn_math": fn_math,
    "fn_cond": fn_cond,
    "fn_json": fn_json,
    "fn_array": fn_array,
    "fn_explode": fn_explode,
    "cast_ingest": cast_ingest,
    "ts_parse_format": ts_parse_format,
    "num_format": num_format,
    "bool_verbose": bool_verbose,
    "row_to_json": row_to_json,
    "fill_defaults": fill_defaults,
}

ORACLES = {
    "fn_string": (
        "SELECT p_partkey, UPPER(p_name) AS name_upper, "
        "LOWER(p_brand) AS brand_lower, SUBSTRING(p_type, 1, 5) AS type_prefix, "
        "CAST(LENGTH(p_name) AS INT) AS name_len, "
        "p_brand || '/' || p_type AS brand_type, "
        "REPLACE(p_name, ' ', '_') AS name_snake, "
        "regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num, "
        "TRIM('  pad  ') AS trimmed "
        "FROM part"
    ),
    "fn_date": (
        "SELECT o_orderkey, "
        "CAST(YEAR(o_orderdate) AS INT) AS yr, "
        "CAST(MONTH(o_orderdate) AS INT) AS mo, "
        "CAST(DAY(o_orderdate) AS INT) AS dom, "
        "CAST(QUARTER(o_orderdate) AS INT) AS qtr, "
        "DATE_TRUNC('month', o_orderdate) AS month_start, "
        "CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS TIMESTAMP) AS due_date, "
        "CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end, "
        "CAST(DATEDIFF('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT) "
        "AS days_to_2002 "
        "FROM orders"
    ),
    "fn_math": (
        "SELECT l_orderkey, l_linenumber, "
        "ABS(l_discount - 0.05) AS abs_disc_delta, "
        "CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil, "
        "CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor, "
        "SQRT(l_quantity) AS qty_sqrt, "
        "l_orderkey % 7 AS key_mod7, "
        "CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign, "
        "l_quantity * l_quantity AS qty_sq "
        "FROM lineitem"
    ),
    "fn_cond": (
        "SELECT c_custkey, "
        "CASE WHEN c_acctbal < 0 THEN 'overdrawn' "
        "WHEN c_acctbal < 5000 THEN 'standard' ELSE 'premium' END AS tier, "
        "COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(dflt)') AS seg_or_default, "
        "GREATEST(c_acctbal, 0.0) AS bal_floor0, "
        "LEAST(c_acctbal, 1000.0) AS bal_cap1k "
        "FROM customer"
    ),
    "fn_json": (
        "SELECT event_id, "
        "CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k FROM events"
    ),
    "fn_array": (
        "SELECT p_partkey, "
        "CAST(len(string_split(p_type, ' ')) AS INT) AS n_words, "
        "list_extract(string_split(p_type, ' '), 1) AS first_word, "
        "list_extract(string_split(p_type, ' '), "
        "  len(string_split(p_type, ' '))) AS last_word, "
        "list_contains(string_split(p_type, ' '), 'BRASS') AS has_brass "
        "FROM part"
    ),
    "fn_explode": (
        "SELECT p_partkey, UNNEST(string_split(p_type, ' ')) AS word FROM part"
    ),
    "cast_ingest": (
        "SELECT CAST(l_linenumber AS BIGINT) AS linenumber_i64, "
        "CAST(l_orderkey AS VARCHAR) AS orderkey_str, "
        "CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_day, "
        "CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS qty_dec "
        "FROM lineitem"
    ),
    "ts_parse_format": (
        "SELECT o_orderkey, "
        "strftime(o_orderdate, '%Y-%m-%d') AS iso_day, "
        "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS iso_full, "
        "CAST(strftime(o_orderdate, '%Y-%m-%d') AS TIMESTAMP) AS reparsed, "
        "CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s "
        "FROM orders"
    ),
    "num_format": (
        "SELECT c_custkey, printf('%.2f', c_acctbal) AS bal_disp FROM customer"
    ),
    "bool_verbose": (
        "SELECT c_custkey, "
        "CASE WHEN c_acctbal >= 0 THEN 'Yes' ELSE 'No' END AS in_credit "
        "FROM customer"
    ),
    "row_to_json": (
        "SELECT n_nationkey, to_json(struct_pack(n_nationkey := n_nationkey, "
        "n_name := n_name, n_regionkey := n_regionkey))::VARCHAR AS js "
        "FROM nation"
    ),
    "fill_defaults": (
        "SELECT o_orderkey, "
        "COALESCE(NULLIF(o_orderstatus, 'O'), '(open)') AS status_filled "
        "FROM orders"
    ),
}
