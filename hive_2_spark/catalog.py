"""Table catalog: load the driver's parquet tables and register views.

Mirrors the reference's Meta registry (``classes/hive/meta.php:70-86``,
``classes/hive/model.php:48-80`` — lazy one-time schema init + singleton
cache): here the "schema" is the parquet footer and the cache is a
per-(session, sf_dir) dict of DataFrames.

At 100 TB each of these would be a partitioned parquet/iceberg table in a
real metastore; ``spark.read.parquet`` on a directory transparently scales
— nothing here assumes single-file input.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every driver table as a DataFrame (lazy — no IO until action)."""
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register all tables as temp views (for the SQL API surface)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(prefix + t)
