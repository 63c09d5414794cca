"""Accuracy regression gate for the approximate aggregates (VERDICT r1 #7).

``agg_approx`` and ``agg_sketch_merge`` are rows-only for the driver (a
sketch estimate has no DuckDB oracle), so THIS test is their correctness
story: at sf0.01 — where cardinalities exceed the sketches' exact/sparse
modes and real estimation happens — every estimate must sit within ±5% of
the exact answer. approx_count_distinct's default rsd is 5% (1 sigma), and
HLL_4 at default lgK=12 is ~1.6%, so 5% is a real regression tripwire, not
a tautology.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table
from hive_2_spark.core.aggregates import agg_approx, agg_sketch_merge
from tests.conftest import SF_DIR_MID

TOL = 0.05


def _assert_close(approx: float, exact: float, what: str) -> None:
    assert exact > 0, what
    rel = abs(approx - exact) / exact
    assert rel <= TOL, f"{what}: approx={approx} exact={exact} rel={rel:.4f}"


def test_approx_count_distinct_within_5pct(spark):
    li = load_table(spark, SF_DIR_MID, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_orderkey").alias("n"))
        .collect()
    }
    # sanity: estimation mode, not exact-small-set mode
    assert max(exact.values()) > 4096
    for row in agg_approx(spark, SF_DIR_MID).collect():
        _assert_close(
            row.approx_orders,
            exact[row.l_returnflag],
            f"approx_count_distinct[{row.l_returnflag}]",
        )


def test_approx_percentile_within_5pct(spark):
    li = load_table(spark, SF_DIR_MID, "lineitem")
    exact = {
        r.l_returnflag: r.p50
        for r in li.groupBy("l_returnflag")
        .agg(F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"))
        .collect()
    }
    for row in agg_approx(spark, SF_DIR_MID).collect():
        _assert_close(
            row.approx_median_price,
            exact[row.l_returnflag],
            f"percentile_approx[{row.l_returnflag}]",
        )


def test_hll_sketch_merge_within_5pct(spark):
    li = load_table(spark, SF_DIR_MID, "lineitem")
    exact = li.select("l_partkey").distinct().count()
    row = agg_sketch_merge(spark, SF_DIR_MID).first()
    _assert_close(row.distinct_parts, exact, "hll_union distinct_parts")
    assert row.total_rows == li.count()


def test_hll_portable_accuracy(spark):
    """The PORTABLE HLL uses m=256 registers => ~6.5% rsd (wider than
    the lgK=12 engine sketches), and the monthly shards sit in the
    linear-counting regime (~5-7% rsd) — so the per-shard gate is 3
    sigma (±20%, ~37 shards make one 3-sigma outlier likely) and the
    merged ALL row, where HLL proper operates, gets the tight ±10%."""
    from hive_2_spark.core.aggregates import agg_hll_portable

    rows = agg_hll_portable(spark, SF_DIR_MID).collect()
    all_row = next(r for r in rows if r.shard == "ALL")
    rel_all = abs(all_row.est_corrected - all_row.n_exact) / all_row.n_exact
    assert rel_all <= 0.10, f"ALL: {all_row}"
    for r in rows:
        rel = abs(r.est_corrected - r.n_exact) / r.n_exact
        assert rel <= 0.20, (
            f"hll_portable[{r.shard}]: est={r.est_corrected} "
            f"exact={r.n_exact} rel={rel:.4f}"
        )
