"""Gates for the rows-only `graph_pagerank_converged` key (round-4
verdict item 6): fixpoint property, agreement with the fixed-unroll
oracle key, and the per-iteration checkpoint-reuse plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import hive_2_spark.core.graph as G
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def converged(spark):
    return G.graph_pagerank_converged(spark, SF_DIR).collect()


def test_converged_is_a_fixpoint(spark, converged):
    """One more power-iteration step on the converged ranks must move
    no rank by >= eps — re-derived independently here: rebuild the
    weighted edges, run rounds until the SAME stop rule fires, then a
    final extra round, and assert the extra round's max delta < eps."""
    edges_w, _ = G._weighted_edges(spark, SF_DIR)
    ranks = (
        edges_w.select("src").distinct()
        .withColumn("rank", F.lit(1.0)).localCheckpoint()
    )

    def step(r):
        return (
            edges_w.join(F.broadcast(r), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("mass"))
            .select(
                F.col("dst").alias("src"),
                (F.lit(1.0 - G._DAMPING) + F.lit(G._DAMPING) * F.col("mass"))
                .alias("rank"),
            )
            .localCheckpoint()
        )

    def probe(new, old):
        """(max |Δrank|, max rank) — the relative-stop ingredients."""
        r = (
            new.join(F.broadcast(old.withColumnRenamed("rank", "prev")), "src")
            .agg(
                F.max(F.abs(F.col("rank") - F.col("prev"))).alias("d"),
                F.max("rank").alias("m"),
            )
            .first()
        )
        return r["d"], r["m"]

    for _ in range(G._CONV_MAX_ROUNDS):
        new = step(ranks)
        d, m = probe(new, ranks)
        ranks = new
        if G._conv_stopped(d, m):
            break
    else:
        pytest.fail("no convergence in the reference loop")
    extra = step(ranks)
    d, m = probe(extra, ranks)
    assert G._conv_stopped(d, m)  # fixpoint holds (relative max-norm)
    # at the fixpoint sum(rank) = N (column-stochastic weights):
    # sum rank_t = (1-d)*N + d*sum(rank_{t-1})  ->  fixpoint N
    n_nodes = edges_w.select("src").distinct().count()
    total = ranks.agg(F.sum("rank").alias("s")).first()["s"]
    assert abs(total - n_nodes) / n_nodes < 1e-4, (total, n_nodes)


def test_converged_output_shape(converged):
    """Top-20, rank-descending, one uniform data-dependent round count
    (> the fixed key's 3 unrolled steps on this fixture)."""
    assert len(converged) == 20
    rks = [r["rank"] for r in converged]
    assert rks == sorted(rks, reverse=True)
    rounds = {r["rounds"] for r in converged}
    assert len(rounds) == 1 and rounds.pop() >= 3


def test_converged_agrees_with_fixed_unroll_topk(spark, converged):
    """The 3-iteration oracle key is an early snapshot of the same
    iteration: its top-20 node set should already substantially overlap
    the converged top-20 (the fixture graph mixes fast: most mass
    settles by round 3)."""
    fixed = {r["node"] for r in G.graph_pagerank(spark, SF_DIR).collect()}
    conv = {r["node"] for r in converged}
    assert len(fixed & conv) >= 10, (fixed, conv)


def test_stop_rule_quantization_drift_proof():
    """Spark and DuckDB sum doubles in different orders, so delta/m
    carries ~1e-15 relative drift between the engines. The quantized
    stop rule (floor(ratio*1e9) < 1000) must be drift-stable: perturb
    ratios around the eps threshold and around grid lines by +-1e-13
    (100x the worst observed drift) and assert the verdict only flips
    when the TRUE ratio sits essentially on a grid line."""
    import math

    for base in (9.994e-7, 9.996e-7, 1.0004e-6, 1.0006e-6, 4.9963e-7, 2.0005e-6):
        verdicts = {
            G._conv_stopped(base * (1 + e), 1.0)
            for e in (-1e-13, 0.0, 1e-13)
        }
        # distance of base*1e9 from the nearest integer grid line,
        # in grid units — all chosen bases sit >= 0.4 grid units away
        frac = abs(base * 1e9 - round(base * 1e9))
        assert frac > 0.3, base
        assert len(verdicts) == 1, (base, verdicts)
    # sanity: rule matches the un-quantized semantics away from eps
    assert G._conv_stopped(1e-8, 1.0)
    assert not G._conv_stopped(1e-5, 1.0)
    # and the DuckDB expression is literally the same arithmetic
    import duckdb

    for ratio in (9.994e-7, 1.0006e-6, 3.7e-7, 1.5e-6):
        sql = duckdb.sql(
            f"SELECT FLOOR({ratio} * {G._CONV_QUANT}) < {G._CONV_EPS_Q}"
        ).fetchone()[0]
        assert sql == G._conv_stopped(ratio, 1.0), ratio


def test_crossing_round_margin_above_drift(spark):
    """ADVICE r9: assert the fixture's actual crossing-round ratio sits
    far from both eps and the quantization grid relative to cross-engine
    float drift (~1e-15 relative), so the two engines provably pick the
    same stop round on this fixture."""
    edges_w, _ = G._weighted_edges(spark, SF_DIR)
    ranks = (
        edges_w.select("src").distinct()
        .withColumn("rank", F.lit(1.0)).localCheckpoint()
    )
    ratios = []
    for _ in range(G._CONV_MAX_ROUNDS):
        new = (
            edges_w.join(F.broadcast(ranks), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("mass"))
            .select(
                F.col("dst").alias("src"),
                (F.lit(1.0 - G._DAMPING) + F.lit(G._DAMPING) * F.col("mass"))
                .alias("rank"),
            )
            .localCheckpoint()
        )
        r = (
            new.join(
                F.broadcast(ranks.withColumnRenamed("rank", "prev")), "src"
            )
            .agg(
                F.max(F.abs(F.col("rank") - F.col("prev"))).alias("d"),
                F.max("rank").alias("m"),
            )
            .first()
        )
        ranks = new
        ratios.append(r["d"] / r["m"])
        if G._conv_stopped(r["d"], r["m"]):
            break
    # The stop verdict (floor(g) < 1000 with g = ratio*1e9) can only
    # flip across engines when some round's g sits within drift of the
    # single boundary integer 1000. Near-crossing g ~ 1000 carries
    # absolute cross-engine drift ~1000 * 1e-15 = 1e-12; require every
    # round to clear the boundary by > 1e-6 (a million times drift).
    margins = [abs(r * 1e9 - G._CONV_EPS_Q) for r in ratios]
    assert min(margins) > 1e-6, (ratios, margins)


def test_converged_loop_reads_cached_edges(spark):
    """The returned plan must read materialized checkpoints (lineage
    truncated every round) — no parquet rescans of lineitem/orders and
    no sort-merge join in the loop (ranks ride a broadcast)."""
    df = G.graph_pagerank_converged(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan
    assert "lineitem" not in plan and "orders" not in plan


def test_cc_star_unroll_is_converged_on_oracle_fixture(spark):
    """Round-11 ADVICE: the fixed _CC_STAR_ROUNDS unroll must reach a
    fixed point on the oracle fixture — one extra large/small-star
    pair leaves the edge set unchanged. tools/scale10.py runs the same
    guard on the 10x/100x fixtures, where there's no oracle to catch a
    non-converged (wrong-but-hash-matching) census."""
    assert G.cc_star_converged(spark, SF_DIR)
