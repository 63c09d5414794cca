"""Round-7 hardening gates (the five round-6 ADVICE findings).

1. ts_drift_report: an event_type entirely absent from one window must
   report tvd_pm=1000 / drifted=true (not NULL from a 0-division) — in
   BOTH engines.
2. dedup_prefix_filter: the quadratic-tail guardrail raises (never
   silently drops) when a prefix gram's df exceeds _PF_MAX_POSTING_DF,
   and exactness below the cap is untouched (oracle parity elsewhere).
3. ts_downsample_lttb: triangle areas survive y-magnitudes whose cross
   products pass 2^63 (decimal(38,0)/HUGEINT, no silent BIGINT wrap).
4. quality_fk_audit: planted orphans are orphans BY CONSTRUCTION
   (negative keys) — the audit can never go vacuous at scale.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from tests.conftest import SF_DIR


def _write_events(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["props"] = '{"k": 1}'
    # micros precision — the TIMESTAMP_NTZ vintage the loader handles
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    p = tmp_path / "events.parquet"
    df.to_parquet(p, index=False)
    return str(tmp_path)


def test_drift_report_empty_window_flags_max_drift(spark, tmp_path):
    """A type with zero rows in the reference window (first 15 days)
    is max drift (tvd_pm=1000, drifted=true), not a NULL report."""
    from hive_2_spark.core.timeseries import ts_drift_report
    from hive_2_spark.parity import compare

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 'steady' spans both windows; 'newborn' only appears on day 20+
    for d in range(30):
        rows.append((eid, t0 + dt.timedelta(days=d), 1, "steady", 100.0))
        eid += 1
        if d >= 20:
            rows.append(
                (eid, t0 + dt.timedelta(days=d, hours=2), 2, "newborn", 50.0)
            )
            eid += 1
    sf = _write_events(tmp_path, rows)
    out = {r["event_type"]: r.asDict() for r in ts_drift_report(spark, sf).collect()}
    nb = out["newborn"]
    assert nb["n_ref"] == 0 and nb["n_cur"] == 10
    assert nb["tvd_pm"] == 1000 and nb["drifted"] is True
    st = out["steady"]
    assert st["n_ref"] == 15 and st["n_cur"] == 15
    assert st["tvd_pm"] == 0 and st["drifted"] is False
    # both engines agree on the guarded semantics
    import duckdb

    from hive_2_spark.core.timeseries import _DRIFT_ORACLE

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    assert compare(ts_drift_report(spark, sf), con, _DRIFT_ORACLE) == []


def test_prefix_filter_cap_raises_not_drops(spark, monkeypatch):
    """Above the posting-df cap the operator refuses loudly: dropping the
    gram would break the zero-false-negative exactness claim."""
    from hive_2_spark.llm import dedup

    # fixture prefix grams exceed df=2 (each planted twin trio shares
    # its grams 3 ways), so a tiny cap must trip the raise_error path
    monkeypatch.setattr(dedup, "_PF_MAX_POSTING_DF", 2)
    with pytest.raises(Exception, match="max_posting_df"):
        dedup.dedup_prefix_filter(spark, SF_DIR).collect()


def test_prefix_filter_cache_bounded_to_two_corpora(spark):
    """The shingle cache is a 2-slot per-app LRU (the round-13 upgrade
    of the round-6 one-corpus rule): the two scales one session
    alternates between BOTH stay live — switching sf_dir no longer
    thrashes — while the bound still caps persisted state."""
    from tests.conftest import SF_DIR_MID

    from hive_2_spark.llm import dedup

    app = spark.sparkContext.applicationId
    dedup._PF_CACHE.clear()
    dedup.dedup_prefix_filter(spark, SF_DIR).count()
    assert list(dedup._PF_CACHE) == [(app, SF_DIR)]
    dedup.dedup_prefix_filter(spark, SF_DIR_MID).count()
    assert set(dedup._PF_CACHE) == {(app, SF_DIR), (app, SF_DIR_MID)}
    # repeat call on the same corpus must REUSE, not evict-and-rebuild
    cached = dedup._PF_CACHE[(app, SF_DIR_MID)]
    dedup.dedup_prefix_filter(spark, SF_DIR_MID).count()
    assert dedup._PF_CACHE[(app, SF_DIR_MID)] is cached
    # ...and the alternation partner survived (the round-12 nit)
    assert (app, SF_DIR) in dedup._PF_CACHE


def test_prefix_filter_fixture_headroom(spark):
    """The default cap has real headroom on the fixtures (the docstring
    claim), so the guard is dormant in every green path."""
    from pyspark.sql import functions as F

    from hive_2_spark.llm import dedup

    words = F.split(dedup._NORM(F.col("text")), " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (dedup._MH_SHINGLE - 1)),
            lambda i: F.array_join(F.slice(words, i, dedup._MH_SHINGLE), " "),
        )
    )
    docs = (
        dedup._pf_corpus(spark, SF_DIR)
        .filter(F.size(words) >= dedup._MH_SHINGLE)
        .select("doc_id", grams.alias("sh"))
    )
    max_df = (
        docs.select(F.explode("sh").alias("g"))
        .groupBy("g")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    # global df bounds prefix-posting length; stay well under the cap
    assert max_df < dedup._PF_MAX_POSTING_DF / 10


def test_lttb_exact_at_2e63_y_magnitudes(spark, tmp_path):
    """Hourly cent sums ~1e13 with >12 points: the cross products pass
    2^63; decimal/HUGEINT keeps Spark == DuckDB (which would raise on a
    BIGINT overflow rather than wrap)."""
    import duckdb

    from hive_2_spark.core.timeseries import _lttb_oracle, ts_downsample_lttb
    from hive_2_spark.parity import compare

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # 48 hourly points, values ~1e11 (cents ~1e13), jagged shape
    for h in range(48):
        v = 1.0e11 + (h % 7) * 3.3e10 + (h % 13) * 1.7e10
        rows.append((h, t0 + dt.timedelta(hours=h), 1, "big", v))
    sf = _write_events(tmp_path, rows)
    out = ts_downsample_lttb(spark, sf)
    assert out.count() == 12
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    assert compare(ts_downsample_lttb(spark, sf), con, _lttb_oracle()) == []


def test_fk_audit_orphans_by_construction(spark):
    """Planted keys are negative -> can never collide with a real dim
    key at any scale; the clean control edge still passes."""
    from hive_2_spark.core.profile import quality_fk_audit

    out = {r["fk"]: r.asDict() for r in quality_fk_audit(spark, SF_DIR).collect()}
    for edge in (
        "orders.o_custkey->customer",
        "lineitem.l_partkey->part",
        "lineitem.l_suppkey->supplier",
    ):
        assert out[edge]["n_orphans"] > 0, edge
        assert out[edge]["min_orphan_key"] < 0, edge
    clean = out["customer.c_nationkey->nation"]
    assert clean["n_orphans"] == 0 and clean["min_orphan_key"] is None
