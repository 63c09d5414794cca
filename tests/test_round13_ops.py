"""Round-13 additions: cache-eviction regression (round-12 verdict
item 3) plus the new operators' planted-truth gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_pair_index_cache_survives_sf_alternation(spark):
    """Alternating scales in one session (exactly the driver_sim →
    bench sequence) must NOT thrash the persisted near-dup pair
    index: one build per sf_dir, both entries live at once (2-slot
    per-app LRU), cache hits return the SAME persisted frame."""
    from hive_2_spark.llm import dedup

    dedup._PAIR_INDEX_CACHE.clear()
    a1 = dedup.neardup_pair_index(spark, "/root/testdata/sf0.001")
    b1 = dedup.neardup_pair_index(spark, "/root/testdata/sf0.01")
    a2 = dedup.neardup_pair_index(spark, "/root/testdata/sf0.001")
    b2 = dedup.neardup_pair_index(spark, "/root/testdata/sf0.01")
    assert a2 is a1, "sf0.001 entry was evicted by the sf0.01 build"
    assert b2 is b1, "sf0.01 entry was evicted by the sf0.001 probe"
    assert a1.storageLevel.useMemory and b1.storageLevel.useMemory
    assert len(dedup._PAIR_INDEX_CACHE) == 2


def test_pair_index_cache_lru_bound_unpersists(spark):
    """A third same-app sf_dir evicts the least-recently-used entry
    (with a real unpersist) and keeps the two hottest."""
    from hive_2_spark.llm import dedup

    dedup._PAIR_INDEX_CACHE.clear()
    a = dedup.neardup_pair_index(spark, "/root/testdata/sf0.001")
    dedup.neardup_pair_index(spark, "/root/testdata/sf0.01")
    # re-touch sf0.001 so sf0.01 is now the LRU entry
    assert dedup.neardup_pair_index(spark, "/root/testdata/sf0.001") is a
    app = spark.sparkContext.applicationId
    # synthesize a third scale without paying a third pair build
    dedup._cache_get_or_put(
        dedup._PAIR_INDEX_CACHE, spark, "/root/testdata/sf_x",
        lambda: a.limit(1),
    )
    keys = {k[1] for k in dedup._PAIR_INDEX_CACHE if k[0] == app}
    assert keys == {"/root/testdata/sf0.001", "/root/testdata/sf_x"}
    dedup._PAIR_INDEX_CACHE.clear()


def test_vocab_zipf_head_probe_adaptive_below_10_terms(spark, tmp_path):
    """A language with fewer than 10 distinct terms must still get a
    non-NULL head ratio — the probe rank is LEAST(10, n_terms), not a
    fixed 10 (round-12 ADVICE). With 3 terms at counts 4/2/1 the head
    probe lands on rank 3: f1_f10_e3 = 1000*4 DIV 1 = 4000."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_2_spark.llm.quality import quality_vocab_zipf

    text = "aa aa aa aa bb bb cc"
    tbl = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([text]),
        "lang": pa.array(["xx"]),
        "source": pa.array(["t"]),
        "n_chars": pa.array([len(text)], pa.int64()),
    })
    d = str(tmp_path / "sf_tiny")
    os.makedirs(d)
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    row = quality_vocab_zipf(spark, d).collect()[0]
    assert row["n_terms"] == 3
    assert row["f1_f10_e3"] == 4000
    assert row["f1_fmid_e3"] == 2000  # mid rank = 2, count 2


def test_hilbert_index_rejects_d_column(spark):
    """A caller frame already carrying a column named 'd' collides
    with the accumulator and must be rejected, not clobbered
    (round-12 ADVICE)."""
    from hive_2_spark.core.layout import hilbert_index

    df = spark.range(1).select(
        (F.col("id") % 256).alias("x"),
        (F.col("id") % 256).alias("y"),
        F.lit(7).alias("d"),
    )
    with pytest.raises(AssertionError, match="accumulator"):
        hilbert_index(df)


def test_foreign_app_entries_dropped_without_unpersist(spark):
    """Entries keyed to a dead/foreign application are dropped on the
    next miss without touching their (gone) blocks."""
    from hive_2_spark.llm import dedup

    dedup._PAIR_INDEX_CACHE.clear()

    class _Boom:
        def unpersist(self):  # pragma: no cover - must never run
            raise AssertionError("unpersisted a foreign-app frame")

    dedup._PAIR_INDEX_CACHE[("dead-app", "/root/testdata/sf0.001")] = _Boom()
    df = dedup.neardup_pair_index(spark, "/root/testdata/sf0.001")
    assert df.storageLevel.useMemory
    assert ("dead-app", "/root/testdata/sf0.001") not in (
        dedup._PAIR_INDEX_CACHE
    )
    dedup._PAIR_INDEX_CACHE.clear()
