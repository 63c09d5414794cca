"""Change-data-capture and dimension-versioning operators.

The reference tracks changes per loaded row (``classes/hive/model.php``
``__changed`` map, 131-136/308-329); these are the set-level, warehouse-
scale faces of the same idea (complementing ``core/writes.py``'s
``changed_rows_diff`` EXCEPT ALL form):

- ``cdc_changes``: row-level change feed between two snapshots — one
  FULL OUTER join on the key classifies every row as insert / update /
  delete, emitting old and new values side by side. This is the diff an
  incremental downstream consumer (or a MERGE) applies; at scale it is
  one shuffle on the key, and with both snapshots bucketed on the key it
  is shuffle-free (see ``catalog_bucketed_join``).
- ``scd2_dimension``: slowly-changing-dimension type 2 — an incoming
  change batch closes the current version of each changed key
  (valid_to = batch ts) and appends the new version (valid_from = batch
  ts, open-ended). Unchanged keys pass through untouched. The plan is a
  broadcast-or-shuffle join of dim x batch plus a union — no windows
  over the full dimension, so history depth never inflates the update
  cost.

Both synthesize their "after" state deterministically from the fixture
(no RNG, fixed literal batch timestamp) so the DuckDB oracle mirrors
them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table

_BATCH_TS = "2024-06-01 00:00:00"
_EPOCH_TS = "1970-01-01 00:00:00"


def _snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """prev = orders key/status/price; curr = deterministic mutation:
    P-status rows get +10% price (updates), keys % 97 == 0 are dropped
    (deletes), and 50 fresh keys above the max are appended (inserts)."""
    prev = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    # raw IEEE product, no per-row ROUND (round halves differ across
    # engines; the unrounded double is bit-identical in both)
    updated = prev.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderstatus") == "P", F.col("o_totalprice") * 1.1
        ).otherwise(F.col("o_totalprice")),
    )
    survivors = updated.filter(F.col("o_orderkey") % 97 != 0)
    mx = prev.agg(F.max("o_orderkey").alias("mx"))
    inserts = (
        spark.range(1, 51)
        .crossJoin(mx)
        .select(
            (F.col("mx") + F.col("id")).alias("o_orderkey"),
            F.lit("O").alias("o_orderstatus"),
            F.lit(1000.0).alias("o_totalprice"),
        )
    )
    return prev, survivors.unionByName(inserts)


def cdc_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level CDC feed: FULL OUTER key join -> I/U/D classification."""
    prev, curr = _snapshots(spark, sf_dir)
    p = prev.select(
        F.col("o_orderkey").alias("pk"),
        F.col("o_orderstatus").alias("old_status"),
        F.col("o_totalprice").alias("old_price"),
    )
    c = curr.select(
        F.col("o_orderkey").alias("ck"),
        F.col("o_orderstatus").alias("new_status"),
        F.col("o_totalprice").alias("new_price"),
    )
    j = p.join(c, p.pk == c.ck, "full_outer")
    op = (
        F.when(F.col("pk").isNull(), F.lit("I"))
        .when(F.col("ck").isNull(), F.lit("D"))
        .when(
            (F.col("old_price") != F.col("new_price"))
            | (F.col("old_status") != F.col("new_status")),
            F.lit("U"),
        )
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            F.coalesce(F.col("pk"), F.col("ck")).alias("o_orderkey"),
            "op",
            "old_price",
            "new_price",
        )
    )


def scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type 2: close current versions of changed keys, append new.

    Dimension = customer (key, mktsegment, acctbal) with an initial
    open-ended version (valid_from = epoch). Change batch: every 20th
    customer moves to segment 'MIGRATED' with balance reset to 0 at the
    fixed batch timestamp.
    """
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.lit(_EPOCH_TS).cast("timestamp").alias("valid_from"),
    )
    batch = (
        dim.filter(F.col("c_custkey") % 20 == 0)
        .select(
            "c_custkey",
            F.lit("MIGRATED").alias("c_mktsegment"),
            F.lit(0.0).alias("c_acctbal"),
            F.lit(_BATCH_TS).cast("timestamp").alias("valid_from"),
        )
    )
    changed_keys = batch.select("c_custkey")
    closed = (
        dim.join(changed_keys, "c_custkey", "left_semi")
        .withColumn("valid_to", F.lit(_BATCH_TS).cast("timestamp"))
        .withColumn("is_current", F.lit(False))
    )
    untouched = (
        dim.join(changed_keys, "c_custkey", "left_anti")
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    opened = batch.withColumn(
        "valid_to", F.lit(None).cast("timestamp")
    ).withColumn("is_current", F.lit(True))
    return untouched.unionByName(closed).unionByName(opened)


QUERIES = {
    "cdc_changes": cdc_changes,
    "scd2_dimension": scd2_dimension,
}

ORACLES = {
    "cdc_changes": (
        "WITH prev AS (SELECT o_orderkey, o_orderstatus, o_totalprice "
        "  FROM orders), "
        "upd AS (SELECT o_orderkey, o_orderstatus, "
        "  CASE WHEN o_orderstatus = 'P' THEN o_totalprice * 1.1 "
        "       ELSE o_totalprice END AS o_totalprice FROM prev), "
        "curr AS (SELECT * FROM upd WHERE o_orderkey % 97 != 0 "
        "  UNION ALL "
        "  SELECT (SELECT MAX(o_orderkey) FROM prev) + i, 'O', 1000.0 "
        "  FROM UNNEST(range(1, 51)) t(i)) "
        "SELECT COALESCE(p.o_orderkey, c.o_orderkey) AS o_orderkey, "
        "CASE WHEN p.o_orderkey IS NULL THEN 'I' "
        "     WHEN c.o_orderkey IS NULL THEN 'D' "
        "     WHEN p.o_totalprice != c.o_totalprice "
        "          OR p.o_orderstatus != c.o_orderstatus THEN 'U' END AS op, "
        "p.o_totalprice AS old_price, c.o_totalprice AS new_price "
        "FROM prev p FULL OUTER JOIN curr c ON p.o_orderkey = c.o_orderkey "
        "WHERE (CASE WHEN p.o_orderkey IS NULL THEN 'I' "
        "       WHEN c.o_orderkey IS NULL THEN 'D' "
        "       WHEN p.o_totalprice != c.o_totalprice "
        "            OR p.o_orderstatus != c.o_orderstatus THEN 'U' END) "
        "      IS NOT NULL"
    ),
    "scd2_dimension": (
        "WITH dim AS (SELECT c_custkey, c_mktsegment, c_acctbal, "
        "  TIMESTAMP '1970-01-01 00:00:00' AS valid_from FROM customer), "
        "chg AS (SELECT c_custkey FROM dim WHERE c_custkey % 20 = 0) "
        "SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal, d.valid_from, "
        "  NULL::TIMESTAMP AS valid_to, TRUE AS is_current "
        "FROM dim d WHERE d.c_custkey NOT IN (SELECT c_custkey FROM chg) "
        "UNION ALL "
        "SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal, d.valid_from, "
        "  TIMESTAMP '2024-06-01 00:00:00', FALSE "
        "FROM dim d WHERE d.c_custkey IN (SELECT c_custkey FROM chg) "
        "UNION ALL "
        "SELECT c_custkey, 'MIGRATED', 0.0, "
        "  TIMESTAMP '2024-06-01 00:00:00', NULL::TIMESTAMP, TRUE "
        "FROM chg"
    ),
}
