"""Ground-truth tests for ts_ewma (pure-Python fold replay) and
graph_triangles (brute-force triangle census over the collected edge
list — exact, the graph is tiny at sf0.001)."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

from tests.conftest import SF_DIR


def test_ewma_matches_python_fold(spark):
    import pyarrow.parquet as pq

    from hive_2_spark.core.timeseries import _EWMA_A, _EWMA_B, ts_ewma

    got = {r.user_id: r for r in ts_ewma(spark, SF_DIR).collect()}
    t = pq.read_table(
        SF_DIR + "/events.parquet", columns=["user_id", "ts", "event_id", "value"]
    ).to_pylist()
    by_user: dict[int, list] = {}
    for r in t:
        by_user.setdefault(r["user_id"], []).append(r)
    assert set(got) == set(by_user)
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        acc = rows[0]["value"]
        for r in rows[1:]:
            acc = _EWMA_A * r["value"] + _EWMA_B * acc
        assert got[uid].n_events == len(rows)
        assert abs(got[uid].ewma - round(acc, 4)) < 1e-9, uid


def test_triangles_match_bruteforce(spark):
    from hive_2_spark.core.graph import graph_triangles
    from hive_2_spark.llm.dedup import dedup_ngram_jaccard

    edges = {
        (r.a_id, r.b_id)
        for r in dedup_ngram_jaccard(spark, SF_DIR)
        .select("a_id", "b_id")
        .distinct()
        .collect()
    }
    nodes = sorted({n for e in edges for n in e})
    expect: Counter = Counter()
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    for n in nodes:
        for u, v in combinations(sorted(adj[n]), 2):
            if v in adj[u]:
                expect[n] += 1  # counted once per participating node
    got = {r.doc_id: r.n_triangles for r in graph_triangles(spark, SF_DIR).collect()}
    assert got == {n: c for n, c in expect.items() if c > 0}
    # the synthesized twin triples guarantee a non-vacuous census
    assert got, "fixture must produce at least one triangle"


def test_transition_matrix_is_row_stochastic(spark):
    from collections import defaultdict

    from hive_2_spark.core.events import event_transitions

    rows = event_transitions(spark, SF_DIR).collect()
    assert rows
    by_src = defaultdict(float)
    for r in rows:
        assert r.n > 0
        by_src[r.src_type] += r.p
    for src, total in by_src.items():
        assert abs(total - 1.0) < 1e-3, (src, total)  # rounded-4 p's


def test_zscore_outliers_are_actually_extreme(spark):
    import statistics

    import pyarrow.parquet as pq

    from hive_2_spark.core.timeseries import ts_anomaly_zscore

    got = {r.event_id: r for r in ts_anomaly_zscore(spark, SF_DIR).collect()}
    t = pq.read_table(
        SF_DIR + "/events.parquet", columns=["event_id", "event_type", "value"]
    ).to_pylist()
    by_type: dict[str, list] = {}
    for r in t:
        by_type.setdefault(r["event_type"], []).append(r)
    expect = set()
    for rows in by_type.values():
        vals = [r["value"] for r in rows]
        mu = statistics.fmean(vals)
        sigma = statistics.pstdev(vals)
        for r in rows:
            if sigma > 0 and abs((r["value"] - mu) / sigma) >= 3.0:
                expect.add(r["event_id"])
    assert set(got) == expect


def test_holt_matches_pure_python_fold(spark):
    """Engine-independent ground truth for ts_holt: replay the Holt
    recurrence in plain Python over the same cents-rounded hourly
    series and compare all outputs at 4 decimals."""
    import duckdb

    from hive_2_spark.core.timeseries import _HOLT_A, _HOLT_B, ts_holt
    from tests.conftest import SF_DIR_MID

    rows = duckdb.connect().execute(
        "SELECT event_type, CAST(CAST(ROUND(SUM(value) * 100) AS BIGINT) "
        "AS DOUBLE) AS x FROM read_parquet("
        f"'{SF_DIR_MID}/events.parquet') "
        "GROUP BY event_type, date_trunc('hour', ts) "
        "ORDER BY event_type, date_trunc('hour', ts)"
    ).fetchall()
    series: dict[str, list[float]] = {}
    for et, x in rows:
        series.setdefault(et, []).append(x)
    expected = {}
    for et, vals in series.items():
        if len(vals) < 2:
            continue
        lv, b = vals[1], vals[1] - vals[0]
        for x in vals[2:]:
            ln = _HOLT_A * x + (1 - _HOLT_A) * (lv + b)
            b = _HOLT_B * (ln - lv) + (1 - _HOLT_B) * b
            lv = ln
        expected[et] = (
            len(vals),
            round(lv / 100, 4),
            round(b / 100, 4),
            round((lv + b) / 100, 4),
        )
    got = {
        r.event_type: (r.n_pts, r.level, r.trend, r.forecast_next)
        for r in ts_holt(spark, SF_DIR_MID).collect()
    }
    assert got == expected and expected
