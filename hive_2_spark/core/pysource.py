"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource`) — the
extensibility face.

The reference ORM abstracts storage behind pluggable database configs
(`classes/hive/meta.php:21-27` `$_db` group selection); Spark's analogue
for "a table that isn't a built-in format" is the DataSource V2 Python
API: schema + partition planning on the driver, per-partition row
generation on executors. The demo source synthesizes deterministic rows
(seeded per partition, no RNG), so a DuckDB `generate_series` oracle can
replay it exactly.

Scale notes: `partitions()` is the parallelism contract — each
`InputPartition` becomes one Spark task, so a production source (REST
pages, kafka ranges, object-store listings) returns one partition per
independently fetchable unit and the cluster fans out. The row path IS
Python (that is the point of the API); everything after the scan is
JVM codegen, and the aggregation here reduces each partition map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FORMAT = "hive2_synth"
_PARTS = 4
_ROWS = 250


def _register(spark: SparkSession) -> None:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class SynthReader(DataSourceReader):
        def __init__(self, options):
            self.rows = int(options.get("rowsperpartition", _ROWS))
            self.parts = int(options.get("numpartitions", _PARTS))

        def partitions(self):
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, partition):
            part = partition.value
            for r in range(self.rows):
                rid = part * self.rows + r
                # deterministic payload: verifiable cross-engine
                yield (rid, part, f"row-{rid:06d}", float(rid % 97) / 10.0)

    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class SynthStreamReader(SimpleDataSourceStreamReader):
        """Offset-tracked micro-batches of the SAME deterministic rows.

        `read(start)` advances the offset by batchSize; `readBetweenOffsets`
        replays any [start, end) range bit-identically — which is what
        gives the source exactly-once semantics under checkpoint recovery.
        """

        def __init__(self, options):
            self.batch = int(options.get("batchsize", 50))

        def initialOffset(self):
            return {"offset": 0}

        def _rows(self, lo, hi):
            # a LIST, not a generator: the runner pickles the prefetched
            # batch so it can replay it on failure
            return [
                (rid, rid % _PARTS, f"row-{rid:06d}", float(rid % 97) / 10.0)
                for rid in range(lo, hi)
            ]

        def read(self, start):
            lo = start["offset"]
            hi = lo + self.batch
            return self._rows(lo, hi), {"offset": hi}

        def readBetweenOffsets(self, start, end):
            # MUST be an iterator (unlike read()'s pickled LIST): this
            # path runs executor-side on checkpoint-recovery replay and
            # pyspark's plan_data_source_read rejects a bare list with
            # DATA_SOURCE_INVALID_RETURN_TYPE. Only triggers when the
            # previous run stopped between the offset write and the
            # commit write, so a clean-shutdown test never sees it.
            return iter(self._rows(start["offset"], end["offset"]))

    class SynthDataSource(DataSource):
        @classmethod
        def name(cls):
            return _FORMAT

        def schema(self):
            return "id bigint, part int, payload string, score double"

        def reader(self, schema):
            return SynthReader(dict(self.options))

        def simpleStreamReader(self, schema):
            return SynthStreamReader(dict(self.options))

    # idempotent: re-registering the same name just replaces it
    spark.dataSource.register(SynthDataSource)


def read_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query key: scan the registered Python source and aggregate per
    partition — proves schema, partition fan-out, and row generation
    end-to-end (the oracle replays the generator arithmetic with
    generate_series)."""
    _register(spark)
    df = (
        spark.read.format(_FORMAT)
        .option("numPartitions", _PARTS)
        .option("rowsPerPartition", _ROWS)
        .load()
    )
    return df.groupBy("part").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
        F.sum(F.length("payload")).cast("bigint").alias("payload_chars"),
        F.round(F.sum("score"), 6).alias("sum_score"),
    )


_SINK_FORMAT = "hive2_jsonl_sink"


def _register_sink(spark: SparkSession) -> None:
    """Custom Python DataSource WRITER — the sink half of the V2 API
    (the reader half is `hive2_synth` above): JSONL files with real
    two-phase commit. Each task streams its partition to a staging
    `*.jsonl.tmp` file and returns a WriterCommitMessage (path, rows);
    the DRIVER's `commit` publishes the staged files with one atomic
    rename each and writes a `_MANIFEST` naming exactly the committed
    files; `abort` deletes the orphans. Readers trust ONLY the
    manifest, so a killed job is invisible (same discipline as Spark's
    own file-sink `_spark_metadata`).

    Scale notes: staging + target must be SHARED storage on a real
    cluster (object store / DFS — here /tmp on local[32]); the commit
    step is metadata-sized (one rename per task + one manifest write),
    so the driver never touches row data.
    """
    import json as _json
    import os
    import uuid as _uuid
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    @dataclass
    class _Staged(WriterCommitMessage):
        path: str
        rows: int

    class JsonlWriter(DataSourceWriter):
        def __init__(self, options, overwrite):
            self.target = options["path"]
            self.overwrite = overwrite

        def write(self, iterator):
            os.makedirs(self.target, exist_ok=True)
            tmp = os.path.join(
                self.target, f"stage-{_uuid.uuid4().hex}.jsonl.tmp"
            )
            n = 0
            try:
                with open(tmp, "w") as f:
                    for row in iterator:
                        f.write(
                            _json.dumps(row.asDict(), sort_keys=True) + "\n"
                        )
                        n += 1
            except BaseException:
                # a task that fails mid-write cleans its OWN staging
                # file — abort() only ever sees commit messages from
                # tasks that finished, so nobody else can
                try:
                    os.remove(tmp)
                except OSError:
                    pass
                raise
            return _Staged(path=tmp, rows=n)

        def commit(self, messages):
            files = []
            total = 0
            for m in messages:
                final = m.path[: -len(".tmp")]
                os.rename(m.path, final)  # atomic publish per task
                files.append(os.path.basename(final))
                total += m.rows
            manifest = {"files": sorted(files), "rows": total}
            with open(os.path.join(self.target, "_MANIFEST"), "w") as f:
                _json.dump(manifest, f)

        def abort(self, messages):
            for m in messages:
                try:
                    os.remove(m.path)
                except OSError:
                    pass

    from pyspark.sql.datasource import DataSourceStreamWriter

    class JsonlStreamWriter(DataSourceStreamWriter):
        """Streaming half of the sink: same staged-file discipline, one
        `_MANIFEST-<batchId>` per committed epoch. A batch REPLAYED
        after a crash stages fresh uuid files and its manifest write
        replaces the previous attempt's atomically — readers union the
        per-batch manifests, so files from an uncommitted attempt are
        invisible and delivery is exactly-once end-to-end when the
        upstream reader replays offsets deterministically."""

        def __init__(self, options):
            self.target = options["path"]

        def write(self, iterator):
            os.makedirs(self.target, exist_ok=True)
            tmp = os.path.join(
                self.target, f"stage-{_uuid.uuid4().hex}.jsonl.tmp"
            )
            n = 0
            try:
                with open(tmp, "w") as f:
                    for row in iterator:
                        f.write(
                            _json.dumps(row.asDict(), sort_keys=True) + "\n"
                        )
                        n += 1
            except BaseException:
                try:
                    os.remove(tmp)
                except OSError:
                    pass
                raise
            return _Staged(path=tmp, rows=n)

        def commit(self, messages, batchId):
            files = []
            total = 0
            for m in messages:
                if m is None:
                    continue
                final = m.path[: -len(".tmp")]
                os.rename(m.path, final)
                files.append(os.path.basename(final))
                total += m.rows
            manifest = {"batch": batchId, "files": sorted(files),
                        "rows": total}
            mpath = os.path.join(self.target, f"_MANIFEST-{batchId}")
            tmp_m = mpath + ".tmp"
            with open(tmp_m, "w") as f:
                _json.dump(manifest, f)
            os.rename(tmp_m, mpath)  # atomic replace on epoch replay

        def abort(self, messages, batchId):
            for m in messages:
                if m is None:
                    continue
                try:
                    os.remove(m.path)
                except OSError:
                    pass

    class JsonlSinkDataSource(DataSource):
        @classmethod
        def name(cls):
            return _SINK_FORMAT

        def writer(self, schema, overwrite):
            return JsonlWriter(dict(self.options), overwrite)

        def streamWriter(self, schema, overwrite):
            return JsonlStreamWriter(dict(self.options))

    spark.dataSource.register(JsonlSinkDataSource)


def stream_sink_manifest_files(target: str) -> list[str]:
    """Absolute paths of files committed by ANY epoch's manifest."""
    import json as _json
    import os

    files: list[str] = []
    for name in sorted(os.listdir(target)):
        if name.startswith("_MANIFEST-") and not name.endswith(".tmp"):
            with open(os.path.join(target, name)) as f:
                files.extend(
                    os.path.join(target, b) for b in _json.load(f)["files"]
                )
    return files


def sink_manifest_files(target: str) -> list[str]:
    """Absolute paths of the files the sink's manifest committed."""
    import json as _json
    import os

    with open(os.path.join(target, "_MANIFEST")) as f:
        manifest = _json.load(f)
    return [os.path.join(target, name) for name in manifest["files"]]


def roundtrip_python_datasource(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Query key: push documents through the custom Python WRITER
    (two-phase commit), read back ONLY the manifest-committed JSONL,
    and aggregate — proves write/commit/read end-to-end. The oracle is
    the same aggregate straight off the source table: equality holds
    iff the sink wrote exactly the input, no dupes, no losses."""
    import os
    import tempfile
    import uuid as _uuid

    from hive_2_spark.catalog import load_table

    _register_sink(spark)
    target = os.path.join(
        tempfile.gettempdir(),
        "hive2_pysink",
        spark.sparkContext.applicationId,
        _uuid.uuid4().hex,
    )
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    d.write.format(_SINK_FORMAT).option("path", target).mode(
        "append"
    ).save()
    back = spark.read.schema("doc_id bigint, lang string, n_chars int").json(
        sink_manifest_files(target)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("sum_ids"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


QUERIES = {
    "read_python_datasource": read_python_datasource,
    "roundtrip_python_datasource": roundtrip_python_datasource,
}

ORACLES = {
    "read_python_datasource": f"""
WITH rows AS (
  SELECT i AS id,
         CAST(i // {_ROWS} AS INT) AS part,
         'row-' || lpad(CAST(i AS VARCHAR), 6, '0') AS payload,
         CAST(i % 97 AS DOUBLE) / 10.0 AS score
  FROM (SELECT unnest(range(0, {_PARTS * _ROWS})) AS i)
)
SELECT part,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(id) AS min_id,
       MAX(id) AS max_id,
       CAST(SUM(length(payload)) AS BIGINT) AS payload_chars,
       ROUND(SUM(score), 6) AS sum_score
FROM rows GROUP BY part
""",
    "roundtrip_python_datasource": """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang
""",
}
