"""Round-11 operators: the pushdown-capable Python DataSource reader
(`read_python_datasource_pushdown`) and incremental community
maintenance (`graph_communities_incremental`). The oracles prove the
aggregates; these pin the mechanics — planning-time partition pruning,
the pushFilters accept/reject contract, the two-phase-commit fixes from
round-11 ADVICE, and a pure-Python ground-truth replay of the
incremental labeling (independent of both engines)."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
)

from hive_2_spark.core.pysource import SynthPushdownReader
from tests.conftest import SF_DIR


def _reader(parts=8, rows=10) -> SynthPushdownReader:
    return SynthPushdownReader(
        {"numpartitions": str(parts), "rowsperpartition": str(rows)}
    )


def test_pushfilters_prunes_partitions_at_planning_time():
    r = _reader()
    rejected = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("part",), 5),
                GreaterThan(("score",), 4.5),  # wrong column: rejected
                IsNotNull(("part",)),  # unsupported type: rejected
            ]
        )
    )
    assert len(rejected) == 2  # score + IsNotNull go back to Spark
    assert {type(f) for f in rejected} == {GreaterThan, IsNotNull}
    parts = [p.value for p in r.partitions()]
    assert parts == [5, 6, 7]  # 3 of 8 survive — pruned driver-side


def test_pushfilters_eq_and_in():
    r = _reader()
    assert list(r.pushFilters([EqualTo(("part",), 2)])) == []
    assert [p.value for p in r.partitions()] == [2]
    r2 = _reader()
    assert list(r2.pushFilters([In(("part",), (1, 6, 99))])) == []
    assert [p.value for p in r2.partitions()] == [1, 6]


def test_pushfilters_conjunction_can_prune_to_zero():
    r = _reader()
    list(r.pushFilters([GreaterThan(("part",), 5), EqualTo(("part",), 1)]))
    assert r.partitions() == []  # contradictory AND: nothing to scan


def test_pushdown_e2e_plan_and_values(spark):
    """The full query: the part predicate must reach the BatchScan as a
    PushedFilter (planning-time pruning), the score predicate must stay
    a post-scan Spark Filter, and the values must match a pure-Python
    replay of the generator arithmetic."""
    from hive_2_spark.core.pysource import (
        _PD_MIN_PART,
        _PD_PARTS,
        _PD_SCORE_GT,
        _ROWS,
        read_python_datasource_pushdown,
    )

    df = read_python_datasource_pushdown(spark, SF_DIR)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [GreaterThanOrEqual(part,5)]" in plan
    assert "Filter" in plan  # residual score predicate stays Spark-side

    expect: dict[int, list[int]] = defaultdict(list)
    for part in range(_PD_PARTS):
        for r in range(_ROWS):
            rid = part * _ROWS + r
            if part >= _PD_MIN_PART and (rid % 97) / 10.0 > _PD_SCORE_GT:
                expect[part].append(rid)
    got = {r.part: r for r in df.collect()}
    assert set(got) == set(expect)
    for part, ids in expect.items():
        assert got[part].n_rows == len(ids)
        assert got[part].min_id == min(ids)
        assert got[part].max_id == max(ids)


def test_batch_sink_manifest_is_staged_then_renamed(tmp_path):
    """Round-11 ADVICE: batch commit must publish _MANIFEST via
    tmp+rename (crash mid-write leaves no truncated manifest) and abort
    must survive None commit messages from unfinished tasks."""
    import json
    import os

    from hive_2_spark.core.pysource import JsonlWriter, _Staged

    target = str(tmp_path / "sink")
    w = JsonlWriter({"path": target}, overwrite=False)

    class _Row:
        def __init__(self, i):
            self.i = i

        def asDict(self):
            return {"i": self.i}

    msgs = [w.write(iter([_Row(1), _Row(2)])), w.write(iter([_Row(3)]))]
    w.commit(msgs)
    names = sorted(os.listdir(target))
    assert "_MANIFEST" in names
    assert not any(n.endswith(".tmp") for n in names)  # all renamed
    manifest = json.load(open(os.path.join(target, "_MANIFEST")))
    assert manifest["rows"] == 3
    assert sorted(manifest["files"]) == [
        n for n in names if n.endswith(".jsonl")
    ]

    # abort with a None entry (unfinished task) must not raise and must
    # still clean the finished task's staged file
    staged = w.write(iter([_Row(9)]))
    assert os.path.exists(staged.path)
    w.abort([None, staged, None])
    assert not os.path.exists(staged.path)
    # double-abort (file already gone) is also safe
    w.abort([staged])
    # and a stale path that never existed
    w.abort([_Staged(path=str(tmp_path / "ghost.jsonl.tmp"), rows=0)])


def _replay_incremental(pairs, mod, rounds):
    """Pure-Python ground truth: base-restricted semi-synchronous LPA
    + one delta vote round + isolated-base singletons -> census."""
    edges = defaultdict(set)
    for a, b in pairs:
        edges[a].add(b)
        edges[b].add(a)
    is_delta = lambda n: n % mod == 0  # noqa: E731
    base_adj = {
        n: sorted(d for d in nbrs if not is_delta(d))
        for n, nbrs in edges.items()
        if not is_delta(n)
    }
    labeled = {n for n, nbrs in base_adj.items() if nbrs}
    lbl = {n: n for n in labeled}
    for _ in range(rounds):
        nxt = {}
        for n in labeled:
            votes = Counter(lbl[d] for d in base_adj[n])
            top = max(votes.values())
            # ties: count desc, label asc
            nxt[n] = min(l for l, c in votes.items() if c == top)
        lbl = nxt
    out = []
    for n in labeled:
        out.append((lbl[n], 0))
    for n in base_adj:
        if n not in labeled:
            out.append((n, 0))  # isolated in the base graph: singleton
    for n, nbrs in edges.items():
        if not is_delta(n):
            continue
        votes = Counter(
            lbl[d] for d in nbrs if not is_delta(d) and d in lbl
        )
        if votes:
            top = max(votes.values())
            out.append((min(l for l, c in votes.items() if c == top), 1))
        else:
            out.append((n, 1))
    census: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for label, is_d in out:
        census[label][0] += 1
        census[label][1] += is_d
    return {k: tuple(v) for k, v in census.items()}


def test_incremental_communities_match_python_ground_truth(spark):
    from hive_2_spark.core.graph import (
        _INC_DELTA_MOD,
        _LPA_ROUNDS,
        graph_communities_incremental,
    )
    from hive_2_spark.llm.dedup import dedup_ngram_jaccard

    pairs = {
        (r.a_id, r.b_id)
        for r in dedup_ngram_jaccard(spark, SF_DIR)
        .select("a_id", "b_id")
        .collect()
    }
    expect = _replay_incremental(pairs, _INC_DELTA_MOD, _LPA_ROUNDS)
    got = {
        r.community: (r.n_docs, r.n_delta)
        for r in graph_communities_incremental(spark, SF_DIR).collect()
    }
    assert got == expect
    # and the delta really is delta-sized: some arrivals attached to
    # existing communities, none re-labeled the base
    assert sum(d for _, d in got.values()) > 0


def test_incremental_work_is_delta_shaped(spark):
    """Cost contract: the incremental step's inputs are the delta's
    incident edges only — at sf0.001 the delta slice is a small
    fraction of the corpus, and every delta label is either an
    existing base community or the node's own id (no new multi-node
    communities can be founded by a one-shot attach)."""
    from hive_2_spark.core.graph import (
        _INC_DELTA_MOD,
        graph_communities_incremental,
    )

    rows = graph_communities_incremental(spark, SF_DIR).collect()
    n_nodes = sum(r.n_docs for r in rows)
    n_delta = sum(r.n_delta for r in rows)
    assert 0 < n_delta < n_nodes / 2  # the delta is the minority slice
    for r in rows:
        if r.community % _INC_DELTA_MOD == 0:
            # a delta-labeled community can only be a self-founded
            # singleton (base labels are never delta ids)
            assert r.n_docs == 1 and r.n_delta == 1
