"""Streaming model serving (SURVEY.md §2B op 42 extension): score a
stream of embedding vectors against k-means centroids fitted on the
static corpus, and roll the assignments up into the per-cluster
drift-monitor table (cluster sizes + mean squared distance) a serving
deployment alarms on.

Both faces, like every streaming op here: the batch face is the
DuckDB-oracle-checkable query (it reuses ``llm.clustering``'s exact
assignment, so the "model" cannot drift from the trained one), and the
``_builder`` face is the same computation as a ``readStream`` plan,
value-equivalence-tested against the batch face.

Scale: model fitting happens once at plan build (the k x dim centroid
collect ``llm.clustering._assign`` already does); each micro-batch then
scores with the same zero-shuffle Arrow/NumPy kernel — per-batch cost
is a map pass plus a k-row aggregation, no stream state beyond the
complete-mode aggregate (k rows). A production monitor would window
the aggregation by event time; the all-time rollup keeps the oracle
exact here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hive_2_spark.llm.clustering import (
    _KMEANS_CTE,
    _assign,
    _final_assignment,
    _recenter,
    _seeds,
    _vectors,
)
from hive_2_spark.llm.similarity import _as_double


def stream_cluster_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face: per-cluster size and mean squared distance under the
    trained (2-round) k-means model."""
    a = _final_assignment(spark, sf_dir)
    return a.groupBy(F.col("cluster").cast("bigint").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("d2"), 4).alias("avg_d2"),
    )


def _read_stream_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the embeddings parquet (collision-free symlinked
    dir — see ``streaming._source``)."""
    from hive_2_spark.streaming._source import read_stream_table

    return read_stream_table(spark, sf_dir, "embeddings", "emb")


def stream_cluster_monitor_builder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming face: fit on the static table at plan build, score the
    stream with the same Arrow kernel, aggregate in complete mode."""
    e_static = _vectors(spark, sf_dir)
    trained = _recenter(_assign(e_static, _seeds(e_static)))
    stream = _read_stream_embeddings(spark, sf_dir).select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("vec")
    )
    scored = _assign(stream, trained)
    return scored.groupBy(
        F.col("cluster").cast("bigint").alias("cluster")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("d2"), 4).alias("avg_d2"),
    )


QUERIES = {
    "stream_cluster_monitor": stream_cluster_monitor,
}

ORACLES = {
    "stream_cluster_monitor": (
        f"WITH {_KMEANS_CTE} "
        "SELECT CAST(cluster AS BIGINT) AS cluster, COUNT(*) AS n, "
        "ROUND(AVG(d2), 4) AS avg_d2 FROM a2 GROUP BY 1"
    ),
}
