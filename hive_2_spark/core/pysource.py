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


QUERIES = {"read_python_datasource": read_python_datasource}

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
}
