"""Time-series operators: gap-filled resampling (hypertable-rollup shape)
and value histograms.

- ``ts_resample``: events rolled up to a 30-minute grid per event_type,
  with EMPTY buckets materialized (the time spine) — the "hypertable
  rollup + gap fill" pattern. The spine is generated from the observed
  min/max with ``sequence`` + ``explode``; at scale the spine is a
  metadata-sized cross join (buckets x types), never a fact-table blowup.
- ``agg_histogram``: fixed-bin value histogram via ``width_bucket`` —
  bin edges shared with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table

BUCKET = "30 minutes"
BUCKET_S = 1800


def ts_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min rollup per event_type with gap-filled empty buckets."""
    e = load_table(spark, sf_dir, "events")
    bucketed = e.groupBy(
        F.window("ts", BUCKET).alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    ).select(F.col("w.start").alias("bucket"), "event_type", "n", "sum_value")

    bounds = e.agg(
        F.min(F.date_trunc("hour", "ts")).alias("lo"),
        F.max("ts").alias("hi"),
    )
    spine = (
        bounds.select(
            F.explode(
                F.sequence(
                    F.col("lo"),
                    F.col("hi"),
                    F.expr(f"INTERVAL {BUCKET}"),
                )
            ).alias("bucket")
        )
        .crossJoin(e.select("event_type").distinct())
    )
    return (
        spine.join(bucketed, on=["bucket", "event_type"], how="left")
        .select(
            "bucket",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
        )
    )


def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bin histogram of order totals via width_bucket."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "bin",
            F.width_bucket(
                F.col("o_totalprice"), F.lit(0.0), F.lit(500000.0), F.lit(20)
            ),
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


QUERIES = {
    "ts_resample": ts_resample,
    "agg_histogram": agg_histogram,
}

ORACLES = {
    "ts_resample": (
        "WITH b AS (SELECT time_bucket(INTERVAL '30 minutes', ts) AS bucket, "
        "  event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value "
        "  FROM events GROUP BY 1, 2), "
        "spine AS (SELECT UNNEST(generate_series("
        "  (SELECT date_trunc('hour', MIN(ts)) FROM events), "
        "  (SELECT MAX(ts) FROM events), INTERVAL '30 minutes')) AS bucket), "
        "types AS (SELECT DISTINCT event_type FROM events) "
        "SELECT s.bucket, t.event_type, "
        "COALESCE(b.n, 0) AS n, COALESCE(b.sum_value, 0.0) AS sum_value "
        "FROM spine s CROSS JOIN types t "
        "LEFT JOIN b ON b.bucket = s.bucket AND b.event_type = t.event_type"
    ),
    # DuckDB has no width_bucket; same binning arithmetically
    "agg_histogram": (
        "SELECT CASE WHEN o_totalprice < 0.0 THEN 0 "
        "WHEN o_totalprice >= 500000.0 THEN 21 "
        "ELSE CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) + 1 END AS bin, "
        "COUNT(*) AS n FROM orders GROUP BY bin"
    ),
}
