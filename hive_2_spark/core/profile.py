"""Table profiling: per-column statistics in one pass (data-quality
surface every warehouse engine ships).

One row per profiled column: row count, null count, distinct count, and
min/max (numerics surfaced as doubles). Implemented as a UNION ALL of
per-column aggregates over ONE cached scan — Catalyst collapses the
branches into shared-scan aggregates; at 100 TB this is k passes of
map-side stats, or one pass when the engine fuses them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table

_NUMERIC = {"o_orderkey", "o_custkey", "o_totalprice"}
_STRINGY = {"o_orderstatus", "o_orderpriority"}


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    parts = []
    for col in sorted(_NUMERIC | _STRINGY):
        c = F.col(col)
        parts.append(
            o.agg(
                F.lit(col).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("long").alias(
                    "n_null"
                ),
                F.countDistinct(c).alias("n_distinct"),
                (
                    F.min(c.cast("double"))
                    if col in _NUMERIC
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.max(c.cast("double"))
                    if col in _NUMERIC
                    else F.lit(None).cast("double")
                ).alias("max_num"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# Declarative expectations over lineitem (the dbt-test / Great
# Expectations shape): each rule -> one violation count. The five
# scan-local rules share ONE pass (conditional sums); uniqueness and
# referential integrity need their own aggregate/anti-join. The
# ``drift_quantity_le_30`` rule is deliberately tight so the report
# carries a non-zero row — an expectations engine must prove it can
# FAIL, not just pass. (The uniqueness rule also fails organically:
# the driver's synthetic generator does NOT enforce the TPC-H
# (l_orderkey, l_linenumber) primary key — a real data-quality finding
# about the fixture, hash-verified against the oracle.)
_SCAN_RULES: list[tuple[str, str]] = [
    ("not_null_l_orderkey", "l_orderkey IS NULL"),
    ("range_l_quantity_1_50", "l_quantity < 1 OR l_quantity > 50"),
    ("range_l_discount_0_1", "l_discount < 0.0 OR l_discount > 1.0"),
    ("accepted_l_returnflag", "l_returnflag NOT IN ('A', 'N', 'R')"),
    ("drift_quantity_le_30", "l_quantity > 30"),
]


def quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-violation report: one row per expectation with its
    violation count and pass flag. At 100 TB the scan-local rules cost
    one map-side pass; uniqueness is a hash agg on the key; referential
    integrity is an anti-join that broadcasts or shuffles like any join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    parts = [
        li.agg(
            F.lit(rule).alias("rule"),
            F.sum(F.when(F.expr(cond), 1).otherwise(0))
            .cast("bigint")
            .alias("n_violations"),
        )
        for rule, cond in _SCAN_RULES
    ]
    parts.append(
        li.agg(
            F.lit("unique_orderkey_linenumber").alias("rule"),
            (
                F.count(F.lit(1))
                - F.count_distinct("l_orderkey", "l_linenumber")
            )
            .cast("bigint")
            .alias("n_violations"),
        )
    )
    parts.append(
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").agg(
            F.lit("ref_orderkey_in_orders").alias("rule"),
            F.count(F.lit(1)).cast("bigint").alias("n_violations"),
        )
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("n_violations") == 0)


def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile per source: doc counts, length stats, language
    spread, and text-content distincts — `profile_orders`' shape turned
    on the training corpus (the first report a curation run prints).
    One groupBy(source) pass; lengths/distincts are map-side partials."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
    )


# planted-orphan corruption: deterministic residue classes negated to
# -(key+1) so the audit is non-vacuous (the raw fixtures are referentially
# intact). Negation — not a fixed additive offset — makes a planted key an
# orphan BY CONSTRUCTION at every scale factor: dim keys are non-negative,
# so -(k+1) < 0 can never collide with a real dim key, where a +900M
# offset silently stops planting once dim domains pass 900M rows.


def quality_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-relationship referential-integrity audit: one row per FK
    with row/orphan/distinct-orphan-key counts and the smallest
    offending key — the cross-table health report a warehouse runs
    nightly (quality_expectations checks ONE edge; this walks the
    schema's FK graph).

    Orphans are PLANTED by deterministic in-place key corruption
    (residue classes negated to -(key+1), orphans by construction at
    any scale since dim keys are non-negative), so every fact edge reports
    real violations while customer→nation stays clean as the passing
    control row. Each edge is a left-anti join: dims broadcast or
    shuffle per optimizer choice (at 100 TB customer is no longer
    broadcastable — the plan is the same anti-join either way). All
    aggregates are scalar (min/count), never a collected key list, so
    a pathological orphan flood cannot blow driver memory.
    """
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_custkey",
        F.when(
            F.col("o_orderkey") % 500 == 0,
            -(F.col("o_custkey") + 1),
        ).otherwise(F.col("o_custkey")),
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .withColumn(
            "l_partkey",
            F.when(
                F.col("l_orderkey") % 777 == 0,
                -(F.col("l_partkey") + 1),
            ).otherwise(F.col("l_partkey")),
        )
        .withColumn(
            "l_suppkey",
            F.when(
                F.col("l_orderkey") % 555 == 0,
                -(F.col("l_suppkey") + 1),
            ).otherwise(F.col("l_suppkey")),
        )
    )
    c = load_table(spark, sf_dir, "customer")
    edges = [
        ("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"),
        (
            "lineitem.l_partkey->part",
            li,
            "l_partkey",
            load_table(spark, sf_dir, "part"),
            "p_partkey",
        ),
        (
            "lineitem.l_suppkey->supplier",
            li,
            "l_suppkey",
            load_table(spark, sf_dir, "supplier"),
            "s_suppkey",
        ),
        (
            "customer.c_nationkey->nation",
            c,
            "c_nationkey",
            load_table(spark, sf_dir, "nation"),
            "n_nationkey",
        ),
    ]
    parts = []
    for name, fact, fk, dim, pk in edges:
        orphans = fact.join(
            dim.select(pk), fact[fk] == dim[pk], "left_anti"
        )
        parts.append(
            fact.agg(
                F.lit(name).alias("fk"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            ).crossJoin(
                orphans.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_orphans"),
                    F.count_distinct(fk).alias("n_orphan_keys"),
                    F.min(fk).alias("min_orphan_key"),
                )
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


QUERIES = {
    "quality_fk_audit": quality_fk_audit,
    "profile_orders": profile_orders,
    "quality_expectations": quality_expectations,
    "profile_documents": profile_documents,
}


def _dk_col_profile(col: str, numeric: bool) -> str:
    minmax = (
        f"CAST(MIN({col}) AS DOUBLE) AS min_num, "
        f"CAST(MAX({col}) AS DOUBLE) AS max_num"
        if numeric
        else "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num"
    )
    return (
        f"SELECT '{col}' AS column, COUNT(*) AS n_rows, "
        f"CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS n_null, COUNT(DISTINCT {col}) AS n_distinct, {minmax} FROM orders"
    )


_FK_EDGE_SQL = """
SELECT '{name}' AS fk,
       (SELECT COUNT(*) FROM {fact}) AS n_rows,
       COUNT(*) AS n_orphans,
       COUNT(DISTINCT {fk}) AS n_orphan_keys,
       MIN({fk}) AS min_orphan_key
FROM {fact} f WHERE NOT EXISTS (SELECT 1 FROM {dim} d WHERE d.{pk} = f.{fk})
"""

_FK_AUDIT_ORACLE = (
    "WITH o AS (SELECT o_orderkey, CASE WHEN o_orderkey % 500 = 0 "
    "THEN -(o_custkey + 1) ELSE o_custkey END AS o_custkey "
    "FROM orders), "
    "li AS (SELECT l_orderkey, "
    "CASE WHEN l_orderkey % 777 = 0 "
    "THEN -(l_partkey + 1) ELSE l_partkey END AS l_partkey, "
    "CASE WHEN l_orderkey % 555 = 0 "
    "THEN -(l_suppkey + 1) ELSE l_suppkey END AS l_suppkey "
    "FROM lineitem) "
    + " UNION ALL ".join(
        _FK_EDGE_SQL.format(name=n, fact=f, fk=k, dim=d, pk=p)
        for n, f, k, d, p in [
            ("orders.o_custkey->customer", "o", "o_custkey",
             "customer", "c_custkey"),
            ("lineitem.l_partkey->part", "li", "l_partkey",
             "part", "p_partkey"),
            ("lineitem.l_suppkey->supplier", "li", "l_suppkey",
             "supplier", "s_suppkey"),
            ("customer.c_nationkey->nation", "customer", "c_nationkey",
             "nation", "n_nationkey"),
        ]
    )
)

ORACLES = {
    "quality_fk_audit": _FK_AUDIT_ORACLE,
    "profile_documents": (
        "SELECT source, COUNT(*) AS n_docs, "
        "COUNT(DISTINCT lang) AS n_langs, "
        "CAST(MIN(n_chars) AS BIGINT) AS min_chars, "
        "CAST(MAX(n_chars) AS BIGINT) AS max_chars, "
        "CAST(SUM(n_chars) AS BIGINT) AS total_chars, "
        "COUNT(DISTINCT md5(text)) AS n_unique_texts "
        "FROM documents GROUP BY source"
    ),
    "profile_orders": " UNION ALL ".join(
        _dk_col_profile(c, c in _NUMERIC) for c in sorted(_NUMERIC | _STRINGY)
    ),
    "quality_expectations": (
        " UNION ALL ".join(
            f"SELECT '{rule}' AS rule, "
            f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_violations, "
            f"SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) = 0 AS passed "
            "FROM lineitem"
            for rule, cond in _SCAN_RULES
        )
        + " UNION ALL "
        "SELECT 'unique_orderkey_linenumber', "
        "CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT), "
        "COUNT(*) = COUNT(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem"
        " UNION ALL "
        "SELECT 'ref_orderkey_in_orders', CAST(COUNT(*) AS BIGINT), "
        "COUNT(*) = 0 FROM lineitem "
        "WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)"
    ),
}
