"""Schema evolution on parquet directories: widened batches coexist with
old files; mergeSchema unifies; missing columns read as NULL."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table
from tests.conftest import SF_DIR


def test_merge_schema_widening(spark, tmp_path):
    out = str(tmp_path / "evolving")
    v1 = load_table(spark, SF_DIR, "nation").select("n_nationkey", "n_name")
    v1.write.mode("overwrite").parquet(out)
    v2 = (
        load_table(spark, SF_DIR, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .withColumn("n_nationkey", F.col("n_nationkey") + 100)
    )
    v2.write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", True).parquet(out)
    assert set(merged.columns) == {"n_nationkey", "n_name", "n_regionkey"}
    assert merged.count() == 50
    # old rows surface the new column as NULL
    nulls = merged.filter(F.col("n_regionkey").isNull()).count()
    assert nulls == 25
    # and an explicit-schema read gives a stable contract regardless of
    # which files a task touches
    stable = spark.read.schema(
        "n_nationkey int, n_name string, n_regionkey int"
    ).parquet(out)
    assert stable.count() == 50
