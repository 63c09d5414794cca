"""Local oracle-parity checker — mirrors the driver's t2 gate.

Runs a Spark query and its DuckDB oracle SQL over the same parquet
tables, then compares row-count, column names (sorted), and values
order-insensitively. Used by tests/test_oracle_parity.py at sf0.001 so
every operator is verified locally before the driver's sf0.01 run.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from hive_2_spark.catalog import TABLES, table_path


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None) if v.tzinfo is not None else v
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    return v


def _canon_frame(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple(str(x) for x in r))
    return rows


def _canon_dtype(dt) -> str:
    """Canonical dtype label so int32-vs-int64 (etc.) mismatches surface —
    the driver compares schemas, so width differences are real failures."""
    s = str(dt)
    if s.startswith("datetime64"):
        return "timestamp"
    if s in ("object", "string"):
        return "object"
    return s


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    spdf = spark_df.toPandas()
    # Spark timestamps may come back tz-aware under Arrow; strip to naive UTC.
    for c in spdf.columns:
        if pd.api.types.is_datetime64_any_dtype(spdf[c]) and getattr(
            spdf[c].dt, "tz", None
        ) is not None:
            spdf[c] = spdf[c].dt.tz_convert("UTC").dt.tz_localize(None)
    dkdf = con.execute(sql).fetchdf()

    if sorted(spdf.columns) != sorted(dkdf.columns):
        problems.append(
            f"schema: spark={sorted(spdf.columns)} duckdb={sorted(dkdf.columns)}"
        )
        return problems
    if len(spdf) != len(dkdf):
        problems.append(f"rowcount: spark={len(spdf)} duckdb={len(dkdf)}")

    for c in sorted(spdf.columns):
        a, b = _canon_dtype(spdf[c].dtype), _canon_dtype(dkdf[c].dtype)
        # all-NULL columns degrade to object/float on either side — only
        # flag when both sides have concrete, different dtypes
        if a != b and "object" not in (a, b):
            problems.append(f"dtype[{c}]: spark={a} duckdb={b}")

    a, b = _canon_frame(spdf), _canon_frame(dkdf)
    n_bad = 0
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            ok = len(ra) == len(rb) and all(_cell_eq(x, y) for x, y in zip(ra, rb))
            if not ok:
                n_bad += 1
                if n_bad <= 3:
                    problems.append(f"row {i}: spark={ra!r} duckdb={rb!r}")
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatched rows total")
    return problems


def _cell_eq(x: Any, y: Any) -> bool:
    if x == y:
        return True
    if isinstance(x, float) and isinstance(y, float):
        return math.isclose(x, y, rel_tol=1e-12, abs_tol=1e-12)
    if isinstance(x, tuple) and isinstance(y, tuple) and len(x) == len(y):
        return all(_cell_eq(a, b) for a, b in zip(x, y))
    return False
