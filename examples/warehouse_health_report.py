#!/usr/bin/env python
"""Warehouse health report: the composed nightly data-quality sweep.

    fact/dim parquet tables
      -> referential integrity   (core.profile.quality_fk_audit —
                                  FK-graph orphan counts per edge)
      -> expectation rules       (core.profile.quality_expectations —
                                  scan-local constraints + uniqueness)
      -> shuffle-key skew        (core.skew.skew_report — per-key
                                  distribution percentiles + hot keys)
      -> table profiles          (core.profile.profile_orders /
                                  profile_documents)

One narrow UNION of per-check report frames -> a single
(check, subject, metric, value, ok) long table — the artifact a
scheduler emails or lands next to the data. Every section reuses the
EXACT registry operator (not a reimplementation), so everything in
this report is covered by the same DuckDB oracles the driver runs.

Scale: each section is one scan-shaped pass (anti-joins, hash aggs,
count-of-count skew histograms); nothing collects beyond the
report's own rows. Checks are independent — on a cluster they run as
one job each and the union is metadata-sized.

    python examples/warehouse_health_report.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(check, subject, metric, value, ok) — one row per finding."""
    from hive_2_spark.core.profile import (
        profile_documents,
        profile_orders,
        quality_expectations,
        quality_fk_audit,
    )
    from hive_2_spark.core.skew import skew_report

    def long(df, check, subject_col, metric_cols, ok_expr):
        rows = df.select(
            F.lit(check).alias("check"),
            F.col(subject_col).cast("string").alias("subject"),
            F.stack(
                F.lit(len(metric_cols)),
                *[
                    x
                    for c in metric_cols
                    for x in (F.lit(c), F.col(c).cast("double"))
                ],
            ).alias("metric", "value"),
            ok_expr.alias("ok"),
        )
        return rows

    fk = long(
        quality_fk_audit(spark, sf_dir),
        "fk_integrity",
        "fk",
        ["n_rows", "n_orphans", "n_orphan_keys"],
        F.col("n_orphans") == 0,
    )
    exp = long(
        quality_expectations(spark, sf_dir),
        "expectations",
        "rule",
        ["n_violations"],
        F.col("passed"),
    )
    skew = long(
        skew_report(spark, sf_dir),
        "shuffle_skew",
        "rel",
        ["n_rows", "n_keys", "max_per_key", "p99", "skew_x100"],
        F.col("max_per_key") < F.col("n_rows"),  # degenerate single-key
    )
    orders = long(
        profile_orders(spark, sf_dir),
        "profile_orders",
        "column",
        ["n_null", "n_distinct"],
        F.col("n_null") == 0,
    )
    docs = long(
        profile_documents(spark, sf_dir),
        "profile_documents",
        "source",
        ["n_docs", "n_unique_texts"],
        F.col("n_docs") > 0,
    )
    out = fk
    for part in (exp, skew, orders, docs):
        out = out.unionByName(part)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from hive_2_spark.session import get_spark

    spark = get_spark("warehouse_health_report")
    spark.sparkContext.setLogLevel("ERROR")
    rep = health_report(spark, sf_dir)
    rows = rep.collect()
    n_fail = sum(1 for r in rows if not r.ok)
    for r in sorted(rows, key=lambda r: (r.check, r.subject, r.metric)):
        flag = "ok " if r.ok else "FAIL"
        print(f"[{flag}] {r.check:18s} {r.subject:32s} "
              f"{r.metric:16s} {r.value:>14.2f}")
    print(f"\n{len(rows)} findings, {n_fail} failing")
    spark.stop()


if __name__ == "__main__":
    main()
