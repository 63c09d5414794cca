"""Z-order layout: the Morton key must actually cluster BOTH dimensions
(so a 2-D box predicate skips files), and the rewrite must preserve data.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table
from hive_2_spark.core.io import _scratch
from hive_2_spark.core.layout import morton_key, zorder_layout, zorder_write
from tests.conftest import SF_DIR


def test_morton_key_interleaves_bits(spark):
    # z(1, 0) = ...a0 at bit 0 = 1 ; z(0, 1) = ...b0 at bit 1 = 2
    df = spark.createDataFrame(
        [(1, 0), (0, 1), (3, 3), (2, 1)], "a long, b long"
    ).select(morton_key(F.col("a"), F.col("b")).alias("z"))
    assert [r.z for r in df.collect()] == [1, 2, 15, 6]


def test_zorder_parity_and_file_stats(spark):
    out = _scratch("orders_zorder_t", SF_DIR)
    src = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zorder_write(src, out, "o_custkey", "o_orderkey", files=8)

    back = spark.read.parquet(out)
    # value-preserving rewrite
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0

    # multiple files, and the box query reads fewer files than exist:
    # per-file custkey min/max ranges must be narrower than the global
    # range for most files (that's the whole point of the clustering).
    files = glob.glob(out + "/part-*.parquet")
    assert len(files) > 1
    lo, hi = src.agg(F.min("o_custkey"), F.max("o_custkey")).first()
    narrow = 0
    for f in files:
        fl, fh = (
            spark.read.parquet(f).agg(F.min("o_custkey"), F.max("o_custkey")).first()
        )
        if (fh - fl) < (hi - lo) * 0.8:
            narrow += 1
    assert narrow >= len(files) // 2, (
        f"z-order produced no per-file clustering: {narrow}/{len(files)} narrow"
    )


def test_zorder_query_key_filters(spark):
    df = zorder_layout(spark, SF_DIR)
    rows = df.collect()
    assert all(r.o_custkey < 100 and r.o_orderkey < 10000 for r in rows)


def _morton_py(a: int, b: int, nbits: int = 16) -> int:
    z = 0
    for i in range(nbits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_morton_spark_matches_python_mirror(spark):
    """The Column expression computes exactly the reference interleave."""
    import random

    rng = random.Random(7)
    pairs = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(200)]
    df = spark.createDataFrame(pairs, "a long, b long").select(
        "a", "b", morton_key(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r.z == _morton_py(r.a, r.b)


def test_morton_monotone_per_dimension():
    """For a fixed value of one dimension, the key is strictly monotone
    in the other — the property that makes min/max range pruning on the
    Morton key sound for each dimension separately."""
    from hypothesis import given, strategies as st

    u16 = st.integers(0, 65535)

    @given(u16, u16, u16)
    def check(a1, a2, b):
        if a1 < a2:
            assert _morton_py(a1, b) < _morton_py(a2, b)
            assert _morton_py(b, a1) < _morton_py(b, a2)

    check()


def test_compact_small_files_reduces_file_count(spark):
    """64 fragment files -> size-targeted handful, rows preserved."""
    import os

    from hive_2_spark.core.io import _scratch
    from hive_2_spark.core.layout import compact_small_files

    compact_small_files(spark, SF_DIR).collect()
    frag = _scratch("orders_fragmented", SF_DIR)
    out = _scratch("orders_compacted", SF_DIR)
    n_frag = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    n_out = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_frag == 64
    assert n_out < n_frag / 4
    assert (
        spark.read.parquet(out).count() == spark.read.parquet(frag).count()
    )


def test_hilbert_curve_is_bijective_and_unit_adjacent(spark):
    """The curve-defining properties over the FULL 256x256 domain:
    (a) xy2d is a bijection (65536 distinct indices); (b) consecutive
    Hilbert indices are ALWAYS manhattan-adjacent (distance exactly
    1) — the locality guarantee z-order lacks; (c) the Morton curve on
    the same domain has thousands of multi-cell jumps, which is the
    reason to pay for the Hilbert rotation arithmetic at all."""
    from pyspark.sql.window import Window

    from hive_2_spark.core.layout import _HILB_N, hilbert_index

    dom = spark.range(_HILB_N * _HILB_N).select(
        (F.col("id") % _HILB_N).alias("x"),
        (F.col("id") / F.lit(_HILB_N)).cast("bigint").alias("y"),
    )
    h = hilbert_index(
        dom.select("x", "y", F.col("x").alias("ox"), F.col("y").alias("oy"))
    ).localCheckpoint()
    assert h.select("hd").distinct().count() == _HILB_N * _HILB_N
    w = Window.orderBy("hd")
    adj = (
        h.select("hd", "ox", "oy")
        .withColumn("dx", F.abs(F.col("ox") - F.lag("ox").over(w)))
        .withColumn("dy", F.abs(F.col("oy") - F.lag("oy").over(w)))
        .filter(F.col("dx").isNotNull())
    )
    assert adj.filter(F.col("dx") + F.col("dy") != 1).count() == 0
    # Morton on the same domain: count consecutive-index jumps > 1
    m = dom.select(
        "x", "y", morton_key(F.col("x"), F.col("y"), 8).alias("zd")
    )
    wz = Window.orderBy("zd")
    zadj = (
        m.withColumn("dx", F.abs(F.col("x") - F.lag("x").over(wz)))
        .withColumn("dy", F.abs(F.col("y") - F.lag("y").over(wz)))
        .filter(F.col("dx").isNotNull())
    )
    z_jumps = zadj.filter(F.col("dx") + F.col("dy") != 1).count()
    assert z_jumps > 1000  # z-order seam jumps: the locality gap
