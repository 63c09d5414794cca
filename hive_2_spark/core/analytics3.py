"""TPC-H Q9/Q16/Q20/Q21 shapes — the four hardest subquery/decorrelation
forms the suite was missing (Layer-B op 33/34/37/45; VERDICT r1 item 6).

The driver's schema has no ``partsupp``, ``l_commitdate`` or
``l_receiptdate`` (FIXTURES.md §A), so each query is adapted to the same
*structural* challenge over available columns:

- Q9  — profit by (nation, year): 5-way star join whose measure combines
  columns of two joined tables (``l_extendedprice``/``l_discount`` with a
  ``p_retailprice``-derived unit cost standing in for ``ps_supplycost``).
- Q16 — supplier-diversity count: multi-predicate dimension filter +
  ``NOT IN`` uncorrelated subquery + ``COUNT(DISTINCT)`` over a 3-key group
  (lineitem stands in for ``partsupp`` as the part↔supplier pair source).
- Q20 — nested ``IN`` over an aggregated-HAVING subquery that itself
  contains an ``IN`` subquery — the two-level semi-join reduction.
- Q21 — the double-correlated self-join: ``EXISTS`` (another supplier in
  the same order) **and** ``NOT EXISTS`` (another supplier also late) over
  the same fact table, with lateness = shipped >90 days after order date
  (standing in for ``l_receiptdate > l_commitdate``).

Determinism (NOTES.md invariants): money sums accumulate in DECIMAL and
are ROUNDed once at the end, CAST to DOUBLE for hash-stable output;
counts CAST to BIGINT. Q21's LIMIT rides a total order (``numwait DESC,
s_name`` — s_name is unique), so the top-100 is engine-stable.

At scale: Q9/Q16/Q20 are star joins — part/supplier are broadcast-sized
at TPC-H ratios (dimension:fact ≈ 1:30), so the only shuffles are the
final group-bys. Q21's two correlated subqueries decorrelate to
aggregates/semi-joins on ``l_orderkey`` — three scans of lineitem that
AQE plans as shuffle joins on the same key, not O(n²) nested loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_2_spark.catalog import register_views


def _sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)


# Q9-shaped: profit per (supplier nation, order year) for one part family.
# ps_supplycost does not exist; unit cost is modeled as 60% of the part's
# retail price — the measure still spans lineitem x part columns, which is
# what forces the join before the aggregate.
_Q9 = """
SELECT n_name AS nation,
       CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      CAST(1 - l_discount  AS DECIMAL(18,2)) -
                      CAST(0.6 AS DECIMAL(2,1)) *
                      CAST(p_retailprice AS DECIMAL(18,2)) *
                      CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS sum_profit
FROM lineitem
JOIN part     ON p_partkey  = l_partkey
JOIN supplier ON s_suppkey  = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, YEAR(o_orderdate)
"""

# Q16-shaped: how many distinct suppliers serve each (brand, type, size)
# bucket, excluding one brand, one type family, and "complained-about"
# suppliers (negative balance stands in for the comment scan). The NOT IN
# subquery is uncorrelated -> broadcast anti-join.
_Q16 = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
  )
GROUP BY p_brand, p_type, p_size
"""

# Q20-shaped: suppliers who moved real volume of 'small%' parts in 1997 —
# IN over (GROUP BY ... HAVING) which itself contains an IN over part.
# Catalyst reduces both levels to (broadcast) semi-joins; the aggregate
# runs once, not per-supplier.
_Q20 = """
SELECT s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  WHERE l_partkey IN (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
    )
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(l_quantity) > 45.0
)
"""

# Q21-shaped: for finished orders, count per supplier the lineitems that
# shipped >90 days late where at least one OTHER supplier participated in
# the order (EXISTS) and NO other supplier was also late (NOT EXISTS) —
# i.e. this supplier alone kept the order waiting. Both subqueries are
# correlated on l_orderkey against the same fact table.
_Q21 = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders      ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def sql_q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q9)


def sql_q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q16)


def sql_q20_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q20)


def sql_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q21)


QUERIES = {
    "sql_q9_profit_by_nation": sql_q9_profit_by_nation,
    "sql_q16_supplier_diversity": sql_q16_supplier_diversity,
    "sql_q20_volume_suppliers": sql_q20_volume_suppliers,
    "sql_q21_waiting_suppliers": sql_q21_waiting_suppliers,
}

ORACLES = {
    "sql_q9_profit_by_nation": _Q9,
    "sql_q16_supplier_diversity": _Q16,
    "sql_q20_volume_suppliers": _Q20,
    "sql_q21_waiting_suppliers": _Q21,
}
