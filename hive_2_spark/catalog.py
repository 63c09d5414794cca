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


def load_table(
    spark: SparkSession, sf_dir: str, name: str, prefer_managed: bool = False
) -> DataFrame:
    """Resolve a table to a DataFrame.

    With ``prefer_managed=True`` the session catalog is consulted first:
    if the table was materialized as a managed warehouse table
    (``core.metastore.create_managed``) the catalog copy serves the scan;
    otherwise the driver's parquet files do. Models can thereby be backed
    by managed tables without any change at the call site.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if prefer_managed:
        from hive_2_spark.core.metastore import DB

        if spark.catalog.tableExists(f"{DB}.{name}"):
            return spark.table(f"{DB}.{name}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events with ``ts`` normalized to TimestampType (epoch micros,
    naive values interpreted as UTC) under ANY SparkSession/timezone.

    The generator's physical encoding of ``ts`` has varied across rounds:
    parquet TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
    read as raw nanos via ``nanosAsLong`` and divide) and naive
    TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Branch on what the footer
    actually says so either vintage of testdata works unchanged."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    return df.withColumn("ts", _normalize_ts(df.schema["ts"].dataType, F))


def _normalize_ts(dtype, F):
    """Column expr converting a raw ``ts`` to TimestampType, epoch=naive-UTC."""
    from pyspark.sql.types import LongType, TimestampNTZType

    if isinstance(dtype, LongType):
        # Raw epoch nanos. Integer division, NOT `/1000` — epoch nanos
        # (~1.7e18) exceed double's 53-bit mantissa, so float division
        # drifts by ±1 microsecond.
        return F.timestamp_micros(F.expr("ts div 1000"))
    if isinstance(dtype, TimestampNTZType):
        # Naive micros: interpret the wall-clock value as UTC. A plain
        # cast to TimestampType applies the SESSION timezone offset (and
        # to_utc_timestamp(x, 'UTC') is then a no-op), so the epoch would
        # shift per deployment timezone; from_utc_timestamp(cast, tz) can
        # still be off by an hour across DST transitions. Rebuild the
        # epoch arithmetically from the timezone-free date/time fields
        # instead — exact under any session timezone.
        day = F.unix_date(F.col("ts").cast("date")).cast("long")
        secs = F.hour("ts").cast("long") * 3600 + F.minute("ts").cast("long") * 60
        micros = (F.expr("extract(SECOND FROM ts)") * 1000000).cast("long")
        return F.timestamp_micros((day * 86400 + secs) * 1000000 + micros)
    return F.col("ts")  # already TimestampType


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every driver table as a DataFrame (lazy — no IO until action)."""
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register all tables as temp views (for the SQL API surface)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(prefix + t)
