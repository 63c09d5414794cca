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
        if d < G._CONV_EPS * m:
            break
    else:
        pytest.fail("no convergence in the reference loop")
    extra = step(ranks)
    d, m = probe(extra, ranks)
    assert d < G._CONV_EPS * m  # fixpoint holds (relative max-norm)
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


def test_converged_loop_reads_cached_edges(spark):
    """The returned plan must read materialized checkpoints (lineage
    truncated every round) — no parquet rescans of lineitem/orders and
    no sort-merge join in the loop (ranks ride a broadcast)."""
    df = G.graph_pagerank_converged(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan
    assert "lineitem" not in plan and "orders" not in plan
