"""Streaming document ingestion with quality gating (SURVEY.md §2B
op 42 extension): the continuous-corpus-update shape — new documents
arrive as a stream, each micro-batch is gated by the same
blocklist-word census the batch pipeline applies, and only survivors
flow on (to dedup/indexing downstream).

Both faces, like every streaming op here: ``stream_doc_gate`` is the
DuckDB-oracle-checkable batch face; ``stream_doc_gate_builder`` runs
the IDENTICAL column transform over ``readStream`` (stateless
filter+project, so it is append-mode with no watermark or state), and
the two are value-equivalence-tested in tests/test_streaming.py.

Scale: the gate is per-row codegen string/array work — zero shuffle,
zero streaming state; throughput is bounded by source read speed. The
shared transform lives in ONE function so the faces cannot drift
(the `sessionized` lesson from round 1's advice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table
from hive_2_spark.llm.quality import _BLOCK_PM_MAX, _BLOCK_SQL_LIST, _BLOCK_WORDS


def _gate(d: DataFrame) -> DataFrame:
    """Shared gate transform (batch AND streaming): blocked-token
    census per doc, keep docs under the per-mille threshold."""
    toks = F.split(F.col("text"), " ")
    blocked = F.size(F.filter(toks, lambda x: x.isin(*_BLOCK_WORDS)))
    return (
        d.select(
            "doc_id",
            "source",
            F.size(toks).cast("bigint").alias("n_tokens"),
            blocked.cast("bigint").alias("n_blocked"),
        )
        .withColumn(
            "blocked_pm",
            F.expr("CAST(n_blocked * 1000 DIV n_tokens AS BIGINT)"),
        )
        .filter(F.col("blocked_pm") < _BLOCK_PM_MAX)
    )


def stream_doc_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face: the gated (surviving) documents."""
    return _gate(load_table(spark, sf_dir, "documents"))


def _read_stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the documents parquet (collision-free symlinked
    dir — see ``streaming._source``)."""
    from hive_2_spark.streaming._source import read_stream_table

    return read_stream_table(spark, sf_dir, "documents", "doc")


def stream_doc_gate_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming face: same transform over readStream — stateless, so
    append mode with no watermark/state; each micro-batch gates
    independently."""
    return _gate(_read_stream_documents(spark, sf_dir))


QUERIES = {"stream_doc_gate": stream_doc_gate}

ORACLES = {
    "stream_doc_gate": f"""
SELECT doc_id, source,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(string_split(text, ' '),
                x -> x IN ({_BLOCK_SQL_LIST}))) AS BIGINT) AS n_blocked,
       CAST(len(list_filter(string_split(text, ' '),
                x -> x IN ({_BLOCK_SQL_LIST}))) * 1000
            // len(string_split(text, ' ')) AS BIGINT) AS blocked_pm
FROM documents
WHERE len(list_filter(string_split(text, ' '),
          x -> x IN ({_BLOCK_SQL_LIST}))) * 1000
      // len(string_split(text, ' ')) < {_BLOCK_PM_MAX}
""",
}
