"""Streaming joins (SURVEY.md §2B op 42 extension): stream-static and
watermarked stream-stream interval joins — both faces (batch-equivalent
query for the oracle, readStream plan for the smoke test).

Scale notes: a stream-static join broadcasts the static dim per
micro-batch (no stream state). A stream-stream interval join keeps both
sides' rows in state ONLY within the watermark+interval horizon — the
interval bound is what makes state finite; an unbounded-condition
stream-stream join would grow state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table
from hive_2_spark.streaming.windows import _read_stream_events

INTERVAL_S = 3600  # clicks within the hour preceding a purchase


def _user_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static user dimension derived from customer (user_id 0-14)."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") <= 15).select(
        (F.col("c_custkey") - 1).alias("user_id"),
        F.col("c_name").alias("user_name"),
        F.col("c_mktsegment").alias("segment"),
    )


# ----------------------------------------------------- stream-static join
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face: events enriched with the static user dimension."""
    e = load_table(spark, sf_dir, "events")
    return e.join(F.broadcast(_user_dim(spark, sf_dir)), on="user_id", how="inner").select(
        "event_id", "user_id", "event_type", "user_name", "segment"
    )


def stream_static_join_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming face: the same enrichment as a readStream plan."""
    events = _read_stream_events(spark, sf_dir)
    return events.join(
        F.broadcast(_user_dim(spark, sf_dir)), on="user_id", how="inner"
    ).select("event_id", "user_id", "event_type", "user_name", "segment")


# ---------------------------------------------- stream-stream interval join
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face: purchase x click pairs for the same user with the
    click in the preceding hour (inclusive bounds, equi-key + interval)."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
    )
    cond = (
        (c.c_ts <= p.p_ts)
        & (c.c_ts >= p.p_ts - F.expr(f"INTERVAL {INTERVAL_S} SECONDS"))
    )
    return p.join(c, on=[p.user_id == c.user_id, cond], how="inner").select(
        "p_id", p.user_id.alias("user_id"), "p_ts", "c_id", "c_ts"
    )


def stream_interval_join_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming face: watermarked stream-stream join (state bounded by
    watermark + interval)."""
    p = (
        _read_stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    c = (
        _read_stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    return p.join(
        c,
        F.expr(
            "user_id = c_user_id AND "
            "c_ts <= p_ts AND c_ts >= p_ts - INTERVAL 1 HOUR"
        ),
        "inner",
    ).select("p_id", "user_id", "p_ts", "c_id", "c_ts")


# -------------------------------------- LEFT OUTER stream-stream join
def stream_interval_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face: every purchase, with its preceding-hour clicks or
    NULLs — the conversion-attribution shape where unmatched purchases
    matter as much as matched ones."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    )
    cond = (
        (p.user_id == c.c_user_id)
        & (c.c_ts <= p.p_ts)
        & (c.c_ts >= p.p_ts - F.expr(f"INTERVAL {INTERVAL_S} SECONDS"))
    )
    return p.join(c, cond, "left").select(
        "p_id", "user_id", "p_ts", "c_id", "c_ts"
    )


def stream_interval_join_left_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming face: watermarked LEFT OUTER stream-stream join. Spark
    buffers each purchase in state until the watermark passes its join
    horizon, THEN emits the NULL row if no click arrived — so on a
    bounded input, tail-of-stream unmatched rows are withheld (the
    watermark never advances past the final batch). That is watermark
    semantics, not a bug; the batch face above is the oracle for the
    complete answer."""
    p = (
        _read_stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    c = (
        _read_stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    return p.join(
        c,
        F.expr(
            "user_id = c_user_id AND "
            "c_ts <= p_ts AND c_ts >= p_ts - INTERVAL 1 HOUR"
        ),
        "leftOuter",
    ).select("p_id", "user_id", "p_ts", "c_id", "c_ts")


QUERIES = {
    "stream_static_join": stream_static_join,
    "stream_interval_join": stream_interval_join,
    "stream_interval_join_left": stream_interval_join_left,
}

ORACLES = {
    "stream_static_join": (
        "SELECT event_id, user_id, event_type, c_name AS user_name, "
        "c_mktsegment AS segment "
        "FROM events JOIN customer ON user_id = c_custkey - 1 "
        "WHERE c_custkey <= 15"
    ),
    "stream_interval_join": (
        "SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts, "
        "c.event_id AS c_id, c.ts AS c_ts "
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
        "JOIN (SELECT * FROM events WHERE event_type = 'click') c "
        "ON p.user_id = c.user_id AND c.ts <= p.ts "
        "AND c.ts >= p.ts - INTERVAL 3600 SECONDS"
    ),
    "stream_interval_join_left": (
        "SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts, "
        "c.event_id AS c_id, c.ts AS c_ts "
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
        "LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c "
        "ON p.user_id = c.user_id AND c.ts <= p.ts "
        "AND c.ts >= p.ts - INTERVAL 3600 SECONDS"
    ),
}
