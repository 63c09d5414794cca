"""Custom Python DataSource: the partition contract and row generation
(the oracle proves the aggregate; these pin the API mechanics)."""

from __future__ import annotations

from hive_2_spark.core.pysource import _FORMAT, _register, read_python_datasource
from tests.conftest import SF_DIR


def test_partition_contract_drives_task_fanout(spark):
    _register(spark)
    raw = (
        spark.read.format(_FORMAT)
        .option("numPartitions", 7)
        .option("rowsPerPartition", 10)
        .load()
    )
    assert raw.rdd.getNumPartitions() == 7  # one task per InputPartition
    assert raw.count() == 70
    rows = {r.id: r for r in raw.collect()}
    assert rows[13].part == 1 and rows[13].payload == "row-000013"


def test_reregister_is_idempotent(spark):
    _register(spark)
    _register(spark)  # replacing the same name must not raise
    assert read_python_datasource(spark, SF_DIR).count() == 4


def test_streaming_reader_offsets_and_content(spark, tmp_path):
    """The streaming half of the source: micro-batches advance the
    offset, rows are the same deterministic generator output, and a
    restart from checkpoint resumes without duplicating ids."""
    import time

    _register(spark)
    out = str(tmp_path / "out")

    def run_until(min_rows):
        q = (
            spark.readStream.format(_FORMAT)
            .option("batchSize", 40)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 300  # generous: box may be under load
            while time.time() < deadline:
                if q.exception() is not None:
                    # fail loudly, not via a 300 s stall + count mismatch
                    raise AssertionError(f"query died: {q.exception()}")
                try:
                    if spark.read.parquet(out).count() >= min_rows:
                        break
                except Exception:
                    pass  # sink dir not created yet
                time.sleep(0.3)
        finally:
            q.stop()

    run_until(80)
    first = sorted(r.id for r in spark.read.parquet(out).select("id").collect())
    assert len(first) >= 80
    assert first == list(range(len(first)))  # contiguous from 0, no dupes
    row41 = spark.read.parquet(out).filter("id = 41").first()
    assert row41.payload == "row-000041" and row41.part == 41 % 4

    # restart from the same checkpoint: resumes AFTER the last offset —
    # ids stay contiguous and unique across the restart (exactly-once)
    run_until(len(first) + 40)
    both = sorted(r.id for r in spark.read.parquet(out).select("id").collect())
    assert len(both) >= len(first) + 40
    assert both == list(range(len(both)))
