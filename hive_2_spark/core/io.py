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


def avro_supported(spark: SparkSession) -> bool:
    """Whether the external spark-avro module is deployed. Probes the
    data-source REGISTRY (not Class.forName — stray avro classes on the
    classpath make that a false positive): a reader resolve that fails
    with 'Failed to find data source' means the module is absent; any
    other failure (e.g. path) means the source resolved."""
    try:
        spark.read.format("avro").schema("x int").load(
            "/nonexistent_avro_probe_path"
        )
        return True
    except Exception as ex:
        return "Failed to find data source" not in str(ex)


def roundtrip_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation -> Avro -> re-read. GATED: raises with deploy guidance when
    the spark-avro jar is absent (it is not bundled in the default
    distribution), so callers get a actionable error instead of an
    opaque ClassNotFoundException. Not registered as a query key — the
    driver environment has no spark-avro jar."""
    if not avro_supported(spark):
        raise NotImplementedError(
            "Avro source requires the external spark-avro module; submit "
            "with --packages org.apache.spark:spark-avro_2.13:<spark-version>"
        )
    out = _scratch("nation_avro", sf_dir)
    load_table(spark, sf_dir, "nation").write.mode("overwrite").format(
        "avro"
    ).save(out)
    return spark.read.format("avro").load(out)


def jdbc_driver_present(spark: SparkSession, driver_class: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(driver_class)
        return True
    except Exception:
        return False


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    driver_class: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """JDBC source. GATED on the driver jar being present. At scale,
    ALWAYS pass partition_column + bounds: without them Spark reads the
    whole table through ONE connection on one task; with them it issues
    ``num_partitions`` bounded range queries in parallel."""
    if not jdbc_driver_present(spark, driver_class):
        raise NotImplementedError(
            f"JDBC driver {driver_class!r} not on the classpath; add the "
            "vendor jar via spark.jars before using the jdbc source"
        )
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver_class)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    return reader.load()


_TABLE_FORMAT_PACKAGES = {
    "delta": "io.delta:delta-spark_2.13:<version> "
    "(+ spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension)",
    "iceberg": "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<version> "
    "(+ a spark.sql.catalog.<name> Iceberg catalog config)",
}


def table_format_supported(spark: SparkSession, fmt: str) -> bool:
    """Whether an ACID table format ('delta' | 'iceberg') is deployed.

    Same registry probe as :func:`avro_supported`: resolving the reader
    against a bogus path fails with 'Failed to find data source' iff the
    format's runtime jar is absent; any other error means it resolved.
    """
    if fmt not in _TABLE_FORMAT_PACKAGES:
        raise ValueError(f"unknown table format {fmt!r}")
    try:
        spark.read.format(fmt).load(f"/nonexistent_{fmt}_probe_path")
        return True
    except Exception as ex:
        # Spark <4: 'Failed to find data source'; Spark 4
        # (DATA_SOURCE_NOT_FOUND): 'Failed to find the data source'.
        msg = str(ex)
        return not ("Failed to find" in msg and "data source" in msg)


def write_table_format(
    df: DataFrame, fmt: str, path: str, *, mode: str = "overwrite"
) -> None:
    """Write ``df`` as a Delta/Iceberg table. GATED: raises with deploy
    guidance when the format runtime is absent (neither is bundled in
    stock Spark). When present, these formats give the engine real ACID
    upserts/deletes — the parquet merge-rewrite in ``model/store.py`` is
    the dependency-free fallback with the same API semantics."""
    spark = df.sparkSession
    if not table_format_supported(spark, fmt):
        raise NotImplementedError(
            f"{fmt} requires its runtime jar; submit with --packages "
            f"{_TABLE_FORMAT_PACKAGES[fmt]}"
        )
    df.write.format(fmt).mode(mode).save(path)


def read_table_format(spark: SparkSession, fmt: str, path: str) -> DataFrame:
    """Read a Delta/Iceberg table. GATED like :func:`write_table_format`."""
    if not table_format_supported(spark, fmt):
        raise NotImplementedError(
            f"{fmt} requires its runtime jar; submit with --packages "
            f"{_TABLE_FORMAT_PACKAGES[fmt]}"
        )
    return spark.read.format(fmt).load(path)


def read_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` source: whole-file binary ingestion (the multimodal
    ingest path — image/audio files land as (path, length, content)).

    Fixture materialization is driver-side by necessity (one FILE per
    blob is the point of the source) but metadata-sized: the 25 nation
    names as .txt files. The read itself is a distributed scan; content
    round-trips byte-exact, proven by decoding it back and hash-matching
    the source table. At 100 TB the same reader fans files out across
    executors; pair it with `spark.sql.files.maxPartitionBytes` and the
    multimodal mapInPandas kernels (`llm/multimodal.py`).
    """
    out = _scratch("nation_binfiles", sf_dir)
    os.makedirs(out, exist_ok=True)
    rows = (
        load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name")
        .collect()  # 25 rows — fixture setup, not a query path
    )
    for r in rows:
        with open(os.path.join(out, f"{r.n_nationkey}.txt"), "wb") as f:
            f.write(r.n_name.encode("utf-8"))
    df = spark.read.format("binaryFile").load(out)
    return df.select(
        F.col("content").cast("string").alias("n_name"),
        F.col("length").alias("n_bytes"),
    )


def read_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution ON READ (the mergeSchema face) — the lakehouse
    reality the roundtrip keys skip: a dataset written over time gains
    columns, and the reader must union the per-file schemas instead of
    failing or silently truncating to the first footer. An OLD batch
    of documents lands with (doc_id, lang); a NEW batch adds n_chars;
    ``mergeSchema`` reads both generations as one frame where the old
    rows carry NULL n_chars.

    The aggregate proves both directions: every row from both
    generations survives (counts), and n_chars is summed ONLY where
    the column physically exists (nulls from the old generation are
    absent from the sum, not zero-filled) — exactly the DuckDB
    oracle's CASE-gated replay over the same doc_id split.

    Scale note: mergeSchema costs one footer read per FILE at plan
    time (driver-side, metadata-bound) — on a 100 TB table you scope
    it to the partitions being read or pin the merged schema in the
    catalog; the per-row decode cost is unchanged (parquet is
    columnar, missing columns materialize as null vectors).

    Output: (lang, generation, n_docs, sum_ids, sum_chars).
    """
    out = _scratch("docs_evolve", sf_dir)
    d = load_table(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "lang", F.lit("v1").alias("generation")
    )
    new = d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", F.lit("v2").alias("generation"), "n_chars"
    )
    old.write.mode("overwrite").parquet(os.path.join(out, "gen=old"))
    new.write.mode("overwrite").parquet(os.path.join(out, "gen=new"))
    back = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out, "gen=old"), os.path.join(out, "gen=new")
    )
    return back.groupBy("lang", "generation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("sum_ids"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("bigint").alias(
            "sum_chars"
        ),
    )


QUERIES = {
    "read_schema_evolution": read_schema_evolution,
    "roundtrip_csv": roundtrip_csv,
    "roundtrip_json": roundtrip_json,
    "roundtrip_orc": roundtrip_orc,
    "partitioned_write_read": partitioned_write_read,
    "read_binaryfile": read_binaryfile,
}

ORACLES = {
    # old generation (even doc_id) has no n_chars column on disk —
    # its sum contributes nothing, gated by the generation CASE
    "read_schema_evolution": (
        "SELECT lang, "
        "CASE WHEN doc_id % 2 = 0 THEN 'v1' ELSE 'v2' END AS generation, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(doc_id) AS BIGINT) AS sum_ids, "
        "CAST(COALESCE(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars END), 0) "
        "AS BIGINT) AS sum_chars "
        "FROM documents GROUP BY 1, 2"
    ),
    # names are ASCII so char length == byte length
    "read_binaryfile": (
        "SELECT n_name, CAST(LENGTH(n_name) AS BIGINT) AS n_bytes FROM nation"
    ),
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
