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


QUERIES = {
    "agg_filtered": agg_filtered,
    "sql_q3_shipping_priority": sql_q3_shipping_priority,
    "sql_q5_nation_volume": sql_q5_nation_volume,
    "sql_q7_binat_volume": sql_q7_binat_volume,
    "sql_q10_returned_items": sql_q10_returned_items,
    "sql_q12_priority_lines": sql_q12_priority_lines,
    "sql_q18_large_orders": sql_q18_large_orders,
}

ORACLES = {
    "agg_filtered": _FILTERED_AGG,
    "sql_q3_shipping_priority": _Q3,
    "sql_q5_nation_volume": _Q5,
    "sql_q7_binat_volume": _Q7,
    "sql_q10_returned_items": _Q10,
    "sql_q12_priority_lines": _Q12,
    "sql_q18_large_orders": _Q18,
}
