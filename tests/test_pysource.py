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


def test_sink_commit_writes_manifest_and_data(spark, tmp_path):
    """The writer half (round 10): staged *.tmp files are renamed on
    commit and the _MANIFEST names exactly the committed files."""
    import json
    import os

    from hive_2_spark.core.pysource import (
        _SINK_FORMAT,
        _register_sink,
        sink_manifest_files,
    )

    _register_sink(spark)
    target = str(tmp_path / "sink")
    df = spark.range(100).selectExpr(
        "id AS doc_id", "CAST(id % 3 AS STRING) AS lang", "CAST(id AS INT) AS n_chars"
    )
    df.repartition(5).write.format(_SINK_FORMAT).option("path", target).mode(
        "append"
    ).save()
    manifest = json.load(open(os.path.join(target, "_MANIFEST")))
    assert manifest["rows"] == 100
    files = sink_manifest_files(target)
    assert len(files) == 5 and all(os.path.exists(f) for f in files)
    assert not [f for f in os.listdir(target) if f.endswith(".tmp")]
    back = spark.read.schema("doc_id bigint, lang string, n_chars int").json(files)
    ids = sorted(r.doc_id for r in back.collect())
    assert ids == list(range(100))  # no dupes, no losses


def test_sink_abort_leaves_no_manifest(spark, tmp_path):
    """A failing job must abort: staged files removed, no _MANIFEST —
    a reader that trusts only the manifest sees nothing."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from hive_2_spark.core.pysource import _SINK_FORMAT, _register_sink

    _register_sink(spark)
    target = str(tmp_path / "sink_abort")
    poisoned = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 49, F.lit("en"))
        .otherwise(F.raise_error("boom"))
        .alias("lang"),
    )
    with _pytest.raises(Exception):
        poisoned.coalesce(1).write.format(_SINK_FORMAT).option(
            "path", target
        ).mode("append").save()
    assert not os.path.exists(os.path.join(target, "_MANIFEST"))
    leftovers = (
        [f for f in os.listdir(target) if not f.startswith("_")]
        if os.path.exists(target)
        else []
    )
    assert leftovers == [], leftovers


def test_stream_writer_exactly_once_across_restart(spark, tmp_path):
    """Full custom-source round trip IN STREAMING: hive2_synth stream
    reader -> hive2_jsonl_sink stream writer. Per-epoch manifests must
    cover every id exactly once, including across a graceful restart
    from the same checkpoint (the offset log replays deterministically,
    the sink's epoch manifests dedupe any partially-published batch)."""
    import json
    import time

    from hive_2_spark.core.pysource import (
        _FORMAT,
        _SINK_FORMAT,
        _register,
        _register_sink,
        stream_sink_manifest_files,
    )

    _register(spark)
    _register_sink(spark)
    target = str(tmp_path / "stream_sink")

    def run_until(min_rows):
        q = (
            spark.readStream.format(_FORMAT)
            .option("batchSize", 30)
            .load()
            .writeStream.format(_SINK_FORMAT)
            .option("path", target)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="150 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 300
            while time.time() < deadline:
                if q.exception() is not None:
                    raise AssertionError(f"query died: {q.exception()}")
                try:
                    files = stream_sink_manifest_files(target)
                except FileNotFoundError:
                    files = []
                n = 0
                for p in files:
                    with open(p) as f:
                        n += sum(1 for _ in f)
                if n >= min_rows:
                    return
                time.sleep(0.3)
            raise AssertionError("timed out waiting for rows")
        finally:
            q.stop()

    run_until(90)
    ids = []
    for p in stream_sink_manifest_files(target):
        with open(p) as f:
            ids.extend(json.loads(ln)["id"] for ln in f)
    first_n = len(ids)
    assert first_n >= 90
    assert sorted(ids) == list(range(first_n))  # exactly-once, in-order ids

    # graceful restart from the same checkpoint: no dupes, resumes after
    run_until(first_n + 30)
    ids = []
    for p in stream_sink_manifest_files(target):
        with open(p) as f:
            ids.extend(json.loads(ln)["id"] for ln in f)
    assert len(ids) >= first_n + 30
    assert sorted(ids) == list(range(len(ids)))
