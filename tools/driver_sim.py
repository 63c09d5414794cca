# Simulates the driver: fresh process, its own SparkSession, calls the
# public contract (entry / queries / oracle_sql) and hash-compares vs DuckDB
# at sf0.01 (the real t2 scale).
# Usage: python tools/driver_sim.py [--json OUT.json]  — the JSON report
# mirrors the driver's CORRECTNESS_r{N}.json shape (per-key status).
import json
import secrets
import subprocess
import sys
import time
sys.path.insert(0, "/root/repo")
_json_out = None
if "--json" in sys.argv:
    _json_out = sys.argv[sys.argv.index("--json") + 1]
# Freshness stamp: every emitted artifact carries the commit it was run
# against, a wall-clock timestamp, and a random nonce so two runs are never
# byte-identical (guards against stale-copy artifacts).
_stamp = {
    "commit": subprocess.run(
        ["git", "-C", "/root/repo", "rev-parse", "HEAD"],
        capture_output=True, text=True).stdout.strip(),
    "timestamp_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    "nonce": secrets.token_hex(8),
}
_t0 = time.time()
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
report = {}
for key in sorted(q):
    if key not in o:
        # Mirror the driver's canonicalizer, not just count(): it collects
        # to pandas and sort_values over ALL columns, which crashes on
        # list/dict/ndarray cells (the CORRECTNESS_r03 media_features err).
        out = q[key](spark, "/root/testdata/sf0.01").toPandas()
        n = len(out)
        try:
            out.sort_values(list(out.columns))
        except Exception as exc:  # unhashable column type etc.
            bad += 1
            report[key] = {"check": "rows_only", "rows": n, "ok": False,
                           "problems": [f"canon: {type(exc).__name__}: {exc}"]}
            print(key, "ROWS-ONLY CANON-FAIL:", exc); continue
        report[key] = {"check": "rows_only", "rows": n, "ok": True}
        print(key, "ROWS-ONLY count=", n); continue
    problems = compare(q[key](spark, "/root/testdata/sf0.01"), con, o[key])
    status = "OK" if not problems else "MISMATCH: " + "; ".join(problems)
    if problems: bad += 1
    report[key] = {"check": "oracle_hash", "ok": not problems,
                   "problems": problems}
    print(f"{key}: {status}")
print("BAD:", bad)
if _json_out:
    with open(_json_out, "w") as f:
        json.dump({"sf": 0.01, "n_queries": len(q), "n_oracles": len(o),
                   "n_bad": bad, "stamp": _stamp,
                   "wall_sec": round(time.time() - _t0, 1),
                   "keys": report}, f, indent=1)
    print("wrote", _json_out)
