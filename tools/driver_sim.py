# Simulates the driver: fresh process, its own SparkSession, calls the
# public contract (entry / queries / oracle_sql) and hash-compares vs DuckDB
# at sf0.01 (the real t2 scale).
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
df = e.entry(spark)
rows = df.collect()
print("entry rows:", len(rows))
print("entry first row:", rows[0])
q, o = e.queries(), e.oracle_sql()
print("queries:", len(q), "oracles:", len(o))
from hive_2_spark.parity import compare, duckdb_connect
con = duckdb_connect("/root/testdata/sf0.01")
bad = 0
for key in sorted(q):
    if key not in o:
        print(key, "ROWS-ONLY count=", q[key](spark, "/root/testdata/sf0.01").count()); continue
    problems = compare(q[key](spark, "/root/testdata/sf0.01"), con, o[key])
    status = "OK" if not problems else "MISMATCH: " + "; ".join(problems)
    if problems: bad += 1
    print(f"{key}: {status}")
print("BAD:", bad)
