"""Incremental materialized-view maintenance for JOIN views.

`core/aggregates.agg_incremental_merge` proves the aggregate side of
incremental view maintenance (fold == recompute); this module proves
the JOIN side with the classic delta rule:

    (A ∪ ΔA) ⋈ (B ∪ ΔB)  =  A⋈B  ∪  ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB

The registered query computes the view INCREMENTALLY (old view + three
delta joins) and the DuckDB oracle computes the full recompute — a hash
match proves the maintenance rule produces cell-for-cell the same view.
(Reference analogue: the ORM's per-row ``__changed`` map,
``classes/hive/model.php:131-136`` — this is the set-level face over
joined tables.)

Scale: the whole point at 100 TB. Deltas are batch-sized, so all three
delta terms broadcast the Δ side — ΔA⋈B streams the B scan past a
broadcast of ΔA, A⋈ΔB streams A past ΔB, ΔA⋈ΔB is broadcast⋈broadcast.
V_old is NOT recomputed (it is the stored view; here it is rebuilt once
to have something to union, which the oracle prices identically). The
alternative — recomputing (A∪ΔA)⋈(B∪ΔB) — is a full shuffle join of
both updated tables on every batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table

# Deterministic base/delta split: orders arriving "late" are keys
# divisible by 97, customers by 89 — both present in every fixture.
_A_DELTA_MOD = 97
_B_DELTA_MOD = 89


def _splits(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    a = o.filter(F.col("o_orderkey") % _A_DELTA_MOD != 0)
    da = o.filter(F.col("o_orderkey") % _A_DELTA_MOD == 0)
    b = c.filter(F.col("c_custkey") % _B_DELTA_MOD != 0)
    db = c.filter(F.col("c_custkey") % _B_DELTA_MOD == 0)
    return a, da, b, db


def _j(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.join(right, left["o_custkey"] == right["c_custkey"]).select(
        "o_orderkey", "c_custkey", "o_totalprice", "c_mktsegment"
    )


def mv_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained join view, built by the delta rule.

    V_new = V_old ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, with every Δ term keeping the
    (batch-sized) delta on the broadcast side. The oracle recomputes
    (A∪ΔA)⋈(B∪ΔB) from scratch — equality IS the correctness proof of
    the maintenance rule."""
    a, da, b, db = _splits(spark, sf_dir)
    v_old = _j(a, b)  # stands in for the STORED view
    inc = (
        v_old.unionByName(_j(F.broadcast(da), b))
        .unionByName(_j(a, F.broadcast(db)))
        .unionByName(_j(F.broadcast(da), F.broadcast(db)))
    )
    return inc


QUERIES = {"mv_join_incremental": mv_join_incremental}

ORACLES = {
    # Full recompute of the updated view — the ground truth the
    # incremental plan must reproduce exactly.
    "mv_join_incremental": (
        "SELECT o_orderkey, c_custkey, o_totalprice, c_mktsegment "
        "FROM orders JOIN customer ON o_custkey = c_custkey"
    ),
}
