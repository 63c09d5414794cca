#!/usr/bin/env python
"""Traffic-quality gate: the composed pre-training sweep over an
event log, built from the round-11 event/graph operators.

    events parquet
      -> bot filter          (core.events.event_bot_regularity —
                              inter-arrival cv^2; timer-regular users
                              with enough volume are excluded)
      -> conversion patterns (core.events.event_pattern_match —
                              CEP-style v..c..p sequence census over
                              the surviving users)
      -> audience structure  (core.graph.graph_cc_largestar over the
                              document near-dup graph: the content
                              families the surviving engagement
                              signals will train against)

The gate's verdict is ONE long (check, subject, metric, value) frame:
per-user keep/drop with the reason, pattern conversion totals on the
kept slice, and the content-family size census. Every section reuses
the EXACT registry operator — covered by the same DuckDB oracles the
driver runs — and the composition only ever joins user-sized /
component-sized report frames, never the raw event log twice.

Scale: bot detection and pattern matching each ride one user-keyed
exchange over the log; the join between them is user-sized; the CC
census is pair-set-sized. On a cluster this is three independent jobs
plus a metadata-sized union.

    python examples/traffic_quality_gate.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def traffic_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(check, subject, metric, value) — one row per finding."""
    from hive_2_spark.core.events import (
        event_bot_regularity,
        event_pattern_match,
    )
    from hive_2_spark.core.graph import graph_cc_largestar

    bots = event_bot_regularity(spark, sf_dir)
    patterns = event_pattern_match(spark, sf_dir)

    # 1) per-user verdict: drop flagged bots, keep the rest
    verdict = bots.select(
        F.lit("bot_gate").alias("check"),
        F.concat(F.lit("user:"), F.col("user_id").cast("string"))
        .alias("subject"),
        F.when(F.col("is_bot") == 1, F.lit("drop_timer_regular"))
        .otherwise(F.lit("keep")).alias("metric"),
        F.col("cv2_e6").cast("double").alias("value"),
    )

    # 2) conversion structure on the KEPT slice only (user-sized join)
    kept = bots.filter(F.col("is_bot") == 0).select("user_id")
    kept_patterns = patterns.join(kept, "user_id")
    conversions = kept_patterns.agg(
        F.sum("n_hits").alias("hits"),
        F.sum("n_matched").alias("matched"),
        F.count(F.lit(1)).alias("users"),
    ).select(
        F.lit("conversion").alias("check"),
        F.lit("kept_users").alias("subject"),
        F.lit("pattern_hits_per_100_users").alias("metric"),
        (F.col("hits") * 100.0 / F.col("users")).alias("value"),
    )

    # 3) content-family census: how concentrated is the near-dup graph
    fams = graph_cc_largestar(spark, sf_dir)
    family_census = fams.groupBy("n_docs").agg(
        F.count(F.lit(1)).alias("n_components")
    ).select(
        F.lit("content_families").alias("check"),
        F.concat(F.lit("size:"), F.col("n_docs").cast("string"))
        .alias("subject"),
        F.lit("n_components").alias("metric"),
        F.col("n_components").cast("double").alias("value"),
    )

    return verdict.unionByName(conversions).unionByName(family_census)


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("traffic_quality_gate")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    report = traffic_quality_gate(spark, sf_dir)
    for row in report.orderBy("check", "subject").collect()[:20]:
        print(f"{row.check:18s} {row.subject:14s} {row.metric:28s} "
              f"{row.value:12.2f}")
    n = report.count()
    print(f"... {n} report rows")
    spark.stop()
