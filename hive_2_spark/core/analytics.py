"""Multi-join analytical queries through the SQL API (Layer-B showcase).

TPC-H-shaped queries adapted to the driver's star schema, expressed as
``spark.sql`` over registered temp views — demonstrating that the SQL
surface and the DataFrame surface share one Catalyst pipeline. Join
graphs: customer -> orders -> lineitem (+ supplier/nation/region dims,
all broadcast-sized at TPC-H ratios).

Determinism: every top-k ORDER BY carries a unique tiebreaker; every
accumulation-order-sensitive aggregate is rounded on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_2_spark.catalog import register_views


def _sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)


_Q3 = """
SELECT o_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""

_Q5 = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1999-01-01'
GROUP BY n_name
"""

_Q10 = """
SELECT c_custkey, c_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       n_name
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

_Q12 = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(SUM(CASE WHEN l_quantity <  25 THEN 1 ELSE 0 END) AS BIGINT)
         AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate <  TIMESTAMP '1999-01-01'
GROUP BY o_orderpriority
"""


_Q7 = """
SELECT supp_nation, cust_nation, yr,
       ROUND(SUM(volume), 2) AS revenue
FROM (
  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         CAST(YEAR(l_shipdate) AS INT) AS yr,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  WHERE sn.n_name IN ('NATION_1', 'NATION_2')
    AND cn.n_name IN ('NATION_1', 'NATION_2')
    AND sn.n_name <> cn.n_name
) shipping
GROUP BY supp_nation, cust_nation, yr
"""

_Q18 = """
SELECT c_custkey, c_name, o_orderkey,
       ROUND(SUM(l_quantity), 2) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
)
GROUP BY c_custkey, c_name, o_orderkey
"""


_FILTERED_AGG = """
SELECT o_orderstatus,
       COUNT(*) FILTER (WHERE o_totalprice > 200000.0) AS n_large,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
       BOOL_OR(o_totalprice > 400000.0)  AS any_huge,
       BOOL_AND(o_totalprice > 1000.0)   AS all_above_1k,
       ROUND(AVG(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 4)
         AS avg_urgent_price
FROM orders
GROUP BY o_orderstatus
"""


_Q2ISH = """
SELECT p.p_partkey, s.s_name, l.l_extendedprice AS best_price
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE p.p_size <= 5
  AND l.l_extendedprice = (
    SELECT MIN(l2.l_extendedprice) FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey
  )
"""

_Q4ISH = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""

_Q14ISH = """
SELECT ROUND(
  100.0 * SUM(CASE WHEN p_type = 'PROMO'
                   THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
        / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate <  TIMESTAMP '1999-01-01'
"""

_Q19ISH = """
-- revenue accumulates in exact DECIMAL: double sums differ by ulps across
-- engines and this aggregate lands exactly on a ROUND .005 boundary
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS revenue,
       COUNT(*) AS n
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 25)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 15
       AND l_quantity BETWEEN 10 AND 40)
   OR (p_type = 'PROMO' AND l_quantity >= 30)
"""


def sql_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: cheapest line per small part."""
    return _sql(spark, sf_dir, _Q2ISH)


def sql_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with an inequality on the outer column."""
    return _sql(spark, sf_dir, _Q4ISH)


def sql_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate ratio (single-row result)."""
    return _sql(spark, sf_dir, _Q14ISH)


def sql_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive multi-predicate join filter (OR across brand/size/qty
    bands) — the optimizer must keep the equi-key and treat the
    disjunction as a residual."""
    return _sql(spark, sf_dir, _Q19ISH)


def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause conditional aggregation + BOOL_OR/BOOL_AND."""
    return _sql(spark, sf_dir, _FILTERED_AGG)


def sql_q7_binat_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q7)


def sql_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q18)


def sql_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q3)


def sql_q5_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q5)


def sql_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q10)


def sql_q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q12)


_RECURSIVE_CTE = """
WITH RECURSIVE thresholds(n) AS (
  SELECT 5 UNION ALL SELECT n + 5 FROM thresholds WHERE n < 50
)
SELECT CAST(n AS BIGINT) AS qty_threshold,
       COUNT(l_orderkey) AS n_lines
FROM thresholds LEFT JOIN lineitem ON l_quantity >= n
GROUP BY n
"""

_LATERAL_TOPK = """
SELECT c_custkey, o_orderkey, o_totalprice
FROM customer,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c_custkey
  ORDER BY o_totalprice DESC, o_orderkey ASC
  LIMIT 2
)
WHERE c_custkey <= 50
"""


_GROUP_BY_ALL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY ALL
"""


def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL: every non-aggregate select item becomes a group key
    — identical syntax in Spark 4 and DuckDB."""
    return _sql(spark, sf_dir, _GROUP_BY_ALL)


def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.x): generated threshold series joined
    against the fact table. The recursion happens at PLAN time on 10
    rows; the fact side stays a single scan."""
    return _sql(spark, sf_dir, _RECURSIVE_CTE)


def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT — per-customer
    top-2 orders. Catalyst decorrelates this into a ranked window over
    one shuffle, not N point queries."""
    return _sql(spark, sf_dir, _LATERAL_TOPK)


QUERIES = {
    "agg_filtered": agg_filtered,
    "sql_recursive_cte": sql_recursive_cte,
    "sql_lateral_topk": sql_lateral_topk,
    "sql_group_by_all": sql_group_by_all,
    "sql_q2_min_cost_supplier": sql_q2_min_cost_supplier,
    "sql_q4_order_priority": sql_q4_order_priority,
    "sql_q14_promo_share": sql_q14_promo_share,
    "sql_q19_disjunctive": sql_q19_disjunctive,
    "sql_q3_shipping_priority": sql_q3_shipping_priority,
    "sql_q5_nation_volume": sql_q5_nation_volume,
    "sql_q7_binat_volume": sql_q7_binat_volume,
    "sql_q10_returned_items": sql_q10_returned_items,
    "sql_q12_priority_lines": sql_q12_priority_lines,
    "sql_q18_large_orders": sql_q18_large_orders,
}

ORACLES = {
    "agg_filtered": _FILTERED_AGG,
    "sql_recursive_cte": _RECURSIVE_CTE,
    "sql_lateral_topk": _LATERAL_TOPK,
    "sql_group_by_all": _GROUP_BY_ALL,
    "sql_q2_min_cost_supplier": _Q2ISH,
    "sql_q4_order_priority": _Q4ISH,
    "sql_q14_promo_share": _Q14ISH,
    "sql_q19_disjunctive": _Q19ISH,
    "sql_q3_shipping_priority": _Q3,
    "sql_q5_nation_volume": _Q5,
    "sql_q7_binat_volume": _Q7,
    "sql_q10_returned_items": _Q10,
    "sql_q12_priority_lines": _Q12,
    "sql_q18_large_orders": _Q18,
}
