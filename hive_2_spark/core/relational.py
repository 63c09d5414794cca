"""Read-surface relational operators (SURVEY.md §2A ops 1-11, 32-33).

Each operator is a function ``(spark, sf_dir) -> DataFrame`` registered in
``QUERIES``; ``ORACLES`` holds the equivalent DuckDB SQL over the same
parquet tables so the driver can hash-match results.

Reference parity (all citations into /root/reference/):
- table scan + projection of declared fields: classes/hive/model.php:723-758,
  1138-1173 (never ``SELECT *`` — op 1/2)
- column aliasing (physical != logical): classes/hive/meta.php:150-177
- computed columns via aliases closures: classes/hive/meta.php:29-31,
  README.md:159-170
- conjunctive equality WHERE: classes/hive/model.php:1269-1287
- arbitrary predicates passed through the query param: model.php:723, 831
- multi-key sorting: classes/hive/meta.php:36, model.php:1158-1161
- limit / top-k: model.php:1163-1167
- distinct key->value projection: model.php:1038-1083
- COUNT(*) over a conditioned subquery: model.php:896-921
- uniqueness/existence probe: classes/hive/meta.php:97-117
- aggregate-query modeling (goal 4): README.md:8, model.php:723/896/1138

Scale notes: every query here is a single scan with filters/projection
pushed to parquet (verify via ``.explain`` → PushedFilters/ReadSchema);
no shuffle except where an aggregate/distinct requires one, and those use
partial (map-side) aggregation automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table


# ---------------------------------------------------------------- op 1: scan
def scan_full_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of a declared table — ``read($query, $limit=FALSE)``."""
    return load_table(spark, sf_dir, "nation")


# ---------------------------------------------------- op 2: column projection
def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection to the declared field list (column pruning at the scan)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


# ------------------------------------------------------- op 3: column alias
def project_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logical name != physical column (``table.col AS name``)."""
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("balance"),
    )


# ---------------------------------------------------- op 4: computed column
def computed_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alias-closure equivalent: derived scalar column from row fields.

    Reference example builds ``full_name = trim(first.' '.last)``; here:
    a display name + a computed net price, all JVM-side built-ins.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.concat_ws("-", F.col("l_returnflag"), F.col("l_linestatus")).alias(
            "flag_status"
        ),
        # No ROUND here: per-row IEEE products are bit-deterministic across
        # engines (same left-assoc order), while ROUND at exact .005
        # boundaries is engine-dependent. Round only order-dependent sums.
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
    )


# ------------------------------------------- op 5: conjunctive equality WHERE
def filter_eq_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``WHERE col = v AND col = v`` from the model's unique/changed fields."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F")
    ).select("l_orderkey", "l_linenumber", "l_quantity")


# --------------------------------------------------- op 6: predicate surface
def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicates (<, BETWEEN) — the ``last_login < strtotime(...)`` shape."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_totalprice") > 100000.0)
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_totalprice", "o_orderdate")


def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_orderpriority")


def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Infix LIKE over the live p_type vocabulary: %ROM% hits PROMO only,
    so the match set is non-empty AND a strict subset (a vacuous or
    match-everything pattern would prove nothing about LIKE semantics)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_type").like("%ROM%")).select(
        "p_partkey", "p_name", "p_type"
    )


def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL surface (testdata has no NULLs — derive some).

    NULLIF creates genuine NULLs so the predicate is exercised end-to-end.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("status_o", F.nullif(F.col("o_orderstatus"), F.lit("O")))
        .filter(F.col("status_o").isNotNull())
        .select("o_orderkey", "status_o")
    )


# ----------------------------------------------------------- op 7: sorting
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """meta->sorting multi-key ORDER BY (asc + desc)."""
    c = load_table(spark, sf_dir, "customer")
    return c.orderBy(
        F.col("c_mktsegment").asc(), F.col("c_acctbal").desc()
    ).select("c_custkey", "c_mktsegment", "c_acctbal")


# ------------------------------------------------------ op 8: limit / top-k
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """limit-after-sort = top-k. Order is total (unique tiebreaker) so the
    selected row SET is deterministic across engines. Spark plans this as
    TakeOrderedAndProject — no global sort, O(k) per partition."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(25)
    )


# ------------------------------------------- op 9: distinct pair projection
def distinct_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``select_list(key, value)``: SELECT DISTINCT k, v (+conditions)."""
    n = load_table(spark, sf_dir, "nation")
    return n.select("n_regionkey", "n_name").distinct()


# ------------------------------------------- op 10: count over a subquery
def count_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``total()``: COUNT(*) over the conditioned SELECT as derived table."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") >= 30.0)
        .select("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("total"))
    )


# ------------------------------------------------- op 11: existence probe
def exists_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``is_unique()`` set-level: which customers have >=1 open order.

    Left-semi join — at scale this is the shuffle-free (broadcastable)
    form of EXISTS; no row duplication, no post-dedup needed.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


# -------------------------------------------- op 33: model over an aggregate
def model_over_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goal 4: a model wrapping an arbitrary aggregate query — per-customer
    order stats exposed as a (virtual) table, then filtered like any model."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("spend"),
    )
    return per_cust.filter(F.col("n_orders") >= 5)


QUERIES = {
    "scan_full_table": scan_full_table,
    "project_columns": project_columns,
    "project_alias": project_alias,
    "computed_column": computed_column,
    "filter_eq_conj": filter_eq_conj,
    "filter_range": filter_range,
    "filter_in": filter_in,
    "filter_like": filter_like,
    "filter_null": filter_null,
    "sort_multi_key": sort_multi_key,
    "topk_limit": topk_limit,
    "distinct_pair": distinct_pair,
    "count_subquery": count_subquery,
    "exists_probe": exists_probe,
    "model_over_agg": model_over_agg,
}

ORACLES = {
    "scan_full_table": "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "project_columns": "SELECT o_orderkey, o_custkey, o_totalprice FROM orders",
    "project_alias": (
        "SELECT c_custkey AS id, c_name AS name, c_acctbal AS balance FROM customer"
    ),
    "computed_column": (
        "SELECT l_orderkey, l_linenumber, "
        "l_returnflag || '-' || l_linestatus AS flag_status, "
        "l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge "
        "FROM lineitem"
    ),
    "filter_eq_conj": (
        "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
        "WHERE l_returnflag = 'R' AND l_linestatus = 'F'"
    ),
    "filter_range": (
        "SELECT o_orderkey, o_totalprice, o_orderdate FROM orders "
        "WHERE o_totalprice > 100000.0 "
        "AND o_orderdate >= TIMESTAMP '1997-01-01' "
        "AND o_orderdate < TIMESTAMP '1999-01-01'"
    ),
    "filter_in": (
        "SELECT o_orderkey, o_orderpriority FROM orders "
        "WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')"
    ),
    "filter_like": (
        "SELECT p_partkey, p_name, p_type FROM part WHERE p_type LIKE '%ROM%'"
    ),
    "filter_null": (
        "SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_o FROM orders "
        "WHERE NULLIF(o_orderstatus, 'O') IS NOT NULL"
    ),
    "sort_multi_key": (
        "SELECT c_custkey, c_mktsegment, c_acctbal FROM customer "
        "ORDER BY c_mktsegment ASC, c_acctbal DESC"
    ),
    "topk_limit": (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25"
    ),
    "distinct_pair": "SELECT DISTINCT n_regionkey, n_name FROM nation",
    "count_subquery": (
        "SELECT COUNT(*) AS total FROM "
        "(SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity >= 30.0) "
        "AS results"
    ),
    "exists_probe": (
        "SELECT c_custkey, c_name FROM customer WHERE EXISTS ("
        "SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')"
    ),
    "model_over_agg": (
        "SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS spend "
        "FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5"
    ),
}
