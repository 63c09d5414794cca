"""Table profiling: per-column statistics in one pass (data-quality
surface every warehouse engine ships).

One row per profiled column: row count, null count, distinct count, and
min/max (numerics surfaced as doubles). Implemented as a UNION ALL of
per-column aggregates over ONE cached scan — Catalyst collapses the
branches into shared-scan aggregates; at 100 TB this is k passes of
map-side stats, or one pass when the engine fuses them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table

_NUMERIC = {"o_orderkey", "o_custkey", "o_totalprice"}
_STRINGY = {"o_orderstatus", "o_orderpriority"}


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    parts = []
    for col in sorted(_NUMERIC | _STRINGY):
        c = F.col(col)
        parts.append(
            o.agg(
                F.lit(col).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("long").alias(
                    "n_null"
                ),
                F.countDistinct(c).alias("n_distinct"),
                (
                    F.min(c.cast("double"))
                    if col in _NUMERIC
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.max(c.cast("double"))
                    if col in _NUMERIC
                    else F.lit(None).cast("double")
                ).alias("max_num"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


QUERIES = {"profile_orders": profile_orders}


def _dk_col_profile(col: str, numeric: bool) -> str:
    minmax = (
        f"CAST(MIN({col}) AS DOUBLE) AS min_num, "
        f"CAST(MAX({col}) AS DOUBLE) AS max_num"
        if numeric
        else "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num"
    )
    return (
        f"SELECT '{col}' AS column, COUNT(*) AS n_rows, "
        f"CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS n_null, COUNT(DISTINCT {col}) AS n_distinct, {minmax} FROM orders"
    )


ORACLES = {
    "profile_orders": " UNION ALL ".join(
        _dk_col_profile(c, c in _NUMERIC) for c in sorted(_NUMERIC | _STRINGY)
    ),
}
