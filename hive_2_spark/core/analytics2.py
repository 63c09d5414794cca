"""TPC-H remainder adapted to the driver's star schema (Layer-B op 33/34/37).

Completes the TPC-H-shaped coverage begun in ``core/analytics.py`` with the
queries whose canonical forms need columns/tables the driver's schema lacks
(``partsupp``, ``l_commitdate``, ``c_phone``) — each is adapted to the same
analytical *shape* over the available columns (FIXTURES.md §A):

- Q6  — single-table predicate-pushdown aggregate (forecast revenue change).
- Q8  — national market share: ratio-of-conditional-sums per year.
- Q11 — revenue concentration: HAVING against a scalar subquery over the
  same fact table (partsupp value share in canonical form).
- Q13 — customer order-count distribution: LEFT OUTER join with an ON-clause
  extra predicate, then a second aggregation over the first's result.
- Q15 — top supplier by revenue: aggregate CTE reused twice (join + scalar
  MAX subquery) — the canonical VIEW formulation.
- Q17 — small-quantity revenue: correlated scalar subquery per part.
- Q22 — idle high-balance customers: anti-join (NOT EXISTS) + scalar AVG
  subquery (phone-prefix filter replaced by nationkey, which the schema has).

Determinism rules (NOTES.md invariants): revenue sums that feed comparisons
or equality accumulate in DECIMAL (double ulp drift across engines flips
boundary rows); plain reported sums are ROUNDed at the end only; counts are
CAST to BIGINT (DuckDB SUM(int) yields HUGEINT).

At scale every query here is a star join over one fact table: dimensions
(part/supplier/customer/nation/region) are broadcast-sized at TPC-H ratios,
so Catalyst picks broadcast-hash joins and the only shuffles are the final
group-bys — verified by the plan gates in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_2_spark.catalog import register_views


def _sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)


# Q6: the classic "would revenue have changed" filter-aggregate. The whole
# query is one scan + partial/final agg; all three predicates reach the
# parquet reader as PushedFilters.
_Q6 = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.04 AND 0.08
  AND l_quantity < 24.0
"""

# Q8: market share of NATION_1 suppliers among ASIA-region customers for
# STANDARD parts, per order year. Ratio of conditional sums; DECIMAL
# accumulation so numerator/denominator are exact before the division.
_Q8 = """
SELECT yr,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_1'
                           THEN volume ELSE CAST(0.00 AS DECIMAL(18,2)) END)
                  AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
         CAST(l_extendedprice AS DECIMAL(18,2)) *
         CAST(1 - l_discount  AS DECIMAL(18,2)) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part      ON p_partkey  = l_partkey
  JOIN supplier  ON s_suppkey  = l_suppkey
  JOIN orders    ON o_orderkey = l_orderkey
  JOIN customer  ON c_custkey  = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region    ON r_regionkey = cn.n_regionkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
) all_nations
GROUP BY yr
"""

# Q11-shaped: parts whose revenue exceeds 0.1% of global revenue. The HAVING
# threshold is a scalar subquery; DECIMAL keeps the > comparison exact so no
# boundary part flips between engines.
_Q11 = """
SELECT l_partkey,
       ROUND(CAST(part_rev AS DOUBLE), 2) AS part_rev
FROM (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             CAST(1 - l_discount  AS DECIMAL(18,2))) AS part_rev
  FROM lineitem
  GROUP BY l_partkey
) per_part
WHERE part_rev > (
  SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             CAST(1 - l_discount  AS DECIMAL(18,2))) * 0.001
  FROM lineitem
)
"""

# Q13: distribution of per-customer order counts, keeping zero-order
# customers via LEFT JOIN with the filter in the ON clause (moving it to
# WHERE would silently drop them — the classic outer-join pitfall Q13 pins).
_Q13 = """
SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) per_customer
GROUP BY n_orders
"""

# Q15: the revenue "view" is used twice — joined to supplier and reduced to
# its MAX. DECIMAL accumulation makes the equality comparison exact; with
# doubles two engines can disagree on which supplier is the argmax when sums
# differ by one ulp.
_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             CAST(1 - l_discount  AS DECIMAL(18,2))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-07-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       ROUND(CAST(total_rev AS DOUBLE), 2) AS total_rev
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
"""

# Q17: revenue from small-quantity orders of one brand; the per-part average
# is a correlated scalar subquery (Catalyst decorrelates it to an aggregate
# + join — same shape DuckDB plans).
_Q17 = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p_partkey
  )
"""

# Q22-shaped: customers with above-average positive balance and no orders at
# all — scalar AVG subquery + NOT EXISTS anti-join, grouped by nation.
# DECIMAL accumulation on both the AVG threshold and the reported SUM (the
# module's determinism rule): the boundary comparison and the .005 rounding
# boundary then depend on one exact sum, not on double summation order.
_Q22 = """
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT AVG(CAST(c_acctbal AS DECIMAL(18,2)))
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
"""


def sql_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q6)


def sql_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q8)


def sql_q11_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q11)


def sql_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q13)


def sql_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q15)


def sql_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q17)


def sql_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q22)


QUERIES = {
    "sql_q6_forecast_revenue": sql_q6_forecast_revenue,
    "sql_q8_market_share": sql_q8_market_share,
    "sql_q11_revenue_concentration": sql_q11_revenue_concentration,
    "sql_q13_order_distribution": sql_q13_order_distribution,
    "sql_q15_top_supplier": sql_q15_top_supplier,
    "sql_q17_small_qty_revenue": sql_q17_small_qty_revenue,
    "sql_q22_idle_customers": sql_q22_idle_customers,
}

ORACLES = {
    "sql_q6_forecast_revenue": _Q6,
    "sql_q8_market_share": _Q8,
    "sql_q11_revenue_concentration": _Q11,
    "sql_q13_order_distribution": _Q13,
    "sql_q15_top_supplier": _Q15,
    "sql_q17_small_qty_revenue": _Q17,
    "sql_q22_idle_customers": _Q22,
}
