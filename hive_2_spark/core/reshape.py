"""Pivot / unpivot reshaping operators (Layer-B surface).

Pivot = groupBy().pivot() with an EXPLICIT value list — at scale the
implicit variant triggers a distinct-values pre-query over the whole
table; always enumerate the spine. Unpivot = DataFrame.unpivot (melt),
a zero-shuffle row-expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table


def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity totals pivoted: one row per returnflag, one column per
    linestatus (explicit spine ['O','F'])."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return p.select(
        "l_returnflag",
        F.col("O").alias("qty_open"),
        F.col("F").alias("qty_filled"),
    )


def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt part metrics to (p_partkey, metric, value) long form."""
    p = load_table(spark, sf_dir, "part").withColumn(
        "p_size_d", F.col("p_size").cast("double")
    )
    return p.unpivot(
        ids=["p_partkey"],
        values=["p_retailprice", "p_size_d"],
        variableColumnName="metric",
        valueColumnName="value",
    )


def pivot_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an INFERRED value spine (no explicit list).

    The convenience form: Spark runs a distinct pre-query on the pivot
    column to discover the spine, then compiles the same plan as the
    explicit pivot. Kept alongside ``pivot_wide`` to document the cost:
    at 100 TB that pre-query is a full extra scan+shuffle — enumerate
    the spine when you know it. Inferred values are sorted, so the
    output schema is deterministic.
    """
    o = load_table(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus")  # inferred: sorted distinct statuses
        .agg(F.count(F.lit(1)))
    )
    # statuses in the fixture: F, O, P (sorted inference). On empty input
    # the inferred spine is empty and the pivoted columns don't exist —
    # substitute 0 so the operator stays empty-input-safe.
    cols = set(p.columns)
    def n(c: str):  # noqa: E306
        return (
            F.coalesce(F.col(c), F.lit(0)).cast("long")
            if c in cols
            else F.lit(0).cast("long")
        )
    return p.select(
        "o_orderpriority",
        n("F").alias("n_f"),
        n("O").alias("n_o"),
        n("P").alias("n_p"),
    )


QUERIES = {
    "pivot_wide": pivot_wide,
    "unpivot_long": unpivot_long,
    "pivot_dynamic": pivot_dynamic,
}

ORACLES = {
    "pivot_dynamic": (
        "SELECT o_orderpriority, "
        "COUNT(*) FILTER (o_orderstatus = 'F') AS n_f, "
        "COUNT(*) FILTER (o_orderstatus = 'O') AS n_o, "
        "COUNT(*) FILTER (o_orderstatus = 'P') AS n_p "
        "FROM orders GROUP BY o_orderpriority"
    ),
    "pivot_wide": (
        "SELECT l_returnflag, "
        "ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) "
        "  AS qty_open, "
        "ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) "
        "  AS qty_filled "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "unpivot_long": (
        "SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value "
        "FROM part "
        "UNION ALL "
        "SELECT p_partkey, 'p_size_d', CAST(p_size AS DOUBLE) FROM part"
    ),
}
