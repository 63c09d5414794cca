"""Sources & sinks beyond parquet (SURVEY.md §2B op 41).

CSV and JSON round-trips (write -> re-read with EXPLICIT schema — never
inferSchema in production paths) and a hive-style partitioned parquet
write whose re-read demonstrates partition pruning. Round-trip outputs
are oracle-checked against the original table: the check proves the
format boundary preserves values exactly.

Scale notes: partitioned writes use ``partitionBy`` on a low-cardinality
column (one dir per value — never partition on a high-card key);
re-reads prune partitions at planning time (shown in
tests/test_plans.py::test_partition_pruning).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table

_SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", tempfile.gettempdir())


def _scratch(name: str, sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(_SCRATCH, f"hive2spark_io_{tag}_{name}")


def roundtrip_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders subset -> CSV -> re-read with explicit schema."""
    out = _scratch("orders_csv", sf_dir)
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    src.write.mode("overwrite").option("header", True).csv(out)
    return (
        spark.read.schema(
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double"
        )
        .option("header", True)
        .csv(out)
    )


def roundtrip_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation -> JSON lines -> re-read with explicit schema."""
    out = _scratch("nation_json", sf_dir)
    load_table(spark, sf_dir, "nation").write.mode("overwrite").json(out)
    return spark.read.schema(
        "n_nationkey int, n_name string, n_regionkey int"
    ).json(out)


def partitioned_write_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders partitioned by status -> read ONE partition (pruned scan)."""
    out = _scratch("orders_by_status", sf_dir)
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    return (
        spark.read.parquet(out)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )


def roundtrip_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier -> ORC -> re-read (columnar alternative to parquet;
    oracle compares against the original table, proving the format
    boundary preserves values)."""
    out = _scratch("supplier_orc", sf_dir)
    load_table(spark, sf_dir, "supplier").write.mode("overwrite").orc(out)
    return spark.read.orc(out)


QUERIES = {
    "roundtrip_csv": roundtrip_csv,
    "roundtrip_json": roundtrip_json,
    "roundtrip_orc": roundtrip_orc,
    "partitioned_write_read": partitioned_write_read,
}

ORACLES = {
    "roundtrip_csv": (
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders"
    ),
    "roundtrip_json": "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "roundtrip_orc": (
        "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"
    ),
    "partitioned_write_read": (
        "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders "
        "WHERE o_orderstatus = 'F'"
    ),
}
