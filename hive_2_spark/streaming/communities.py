"""Streaming face of incremental community maintenance (SURVEY §2B
row 106): label documents as they ARRIVE instead of re-running the
batch attach over the accumulated delta.

Production shape: the base-document block index and the base community
labels are persisted corpus state (built offline, refreshed with the
corpus); each micro-batch normalizes its own documents, probes the
index with a (block, lang)-keyed band join — DELTA-sized work, the
dedup_incremental cost discipline — votes over its base-labeled
near-dup neighbors with the same (count desc, label asc) plurality
rule as :func:`hive_2_spark.core.graph.graph_communities_incremental`,
and appends (doc_id, lbl) to the label store. Arrivals with no labeled
neighbor found singleton communities (their own doc_id), exactly like
the batch face.

Equivalence contract (pytest-gated end-to-end through a real
file-source stream + foreachBatch in tests/test_stream_communities.py):
on blocks at or below the exact-leg cap, the union of per-batch attach
outputs equals the batch operator's delta assignment on every delta
node the pair graph covers, and labels every OTHER arrival as its own
singleton (the batch census only reports nodes with at least one
near-dup edge; a streaming sink must label every arrival).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def community_base_state(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(base_index, base_labels) — the persisted corpus state arrivals
    probe. ``base_index``: (doc_id, lang, blk, words) for every BASE
    document (non-delta slice of the near-dup corpus), checkpointed;
    ``base_labels``: the base LPA fixpoint, via the same helper the
    batch key uses (:func:`core.graph._inc_edges_and_base`)."""
    from hive_2_spark.core.graph import _INC_DELTA_MOD, _inc_edges_and_base
    from hive_2_spark.llm.dedup import _NORM, corpus_with_dups

    _, base_labels = _inc_edges_and_base(spark, sf_dir)
    norm = _NORM(F.col("text"))
    base_index = (
        corpus_with_dups(spark, sf_dir)
        .filter(F.col("doc_id") % _INC_DELTA_MOD != 0)
        .withColumn("norm", norm)
        .select(
            "doc_id",
            "lang",
            F.md5(F.substring(F.col("norm"), 1, 32)).alias("blk"),
            F.array_distinct(F.split(F.col("norm"), " ")).alias("words"),
        )
        .localCheckpoint()
    )
    return base_index, base_labels


def attach_labels(
    batch_docs: DataFrame, base_index: DataFrame, base_labels: DataFrame
) -> DataFrame:
    """Label one micro-batch of arriving documents: (blk, lang) band
    join against the base index, exact word-shingle Jaccard >= 0.8
    (the dedup_ngram_jaccard bar, same ROUND(,4) form), one plurality
    vote over base labels, own-id fallback. Returns (doc_id, lbl).

    Scale: the join's left side is the BATCH (delta-sized); the index
    side is pre-partitioned corpus state. Nothing here grows with the
    corpus except the index probe itself."""
    from pyspark.sql.window import Window

    from hive_2_spark.llm.dedup import _NORM

    norm = _NORM(F.col("text"))
    d = batch_docs.withColumn("norm", norm).select(
        F.col("doc_id").alias("v"),
        "lang",
        F.md5(F.substring(F.col("norm"), 1, 32)).alias("blk"),
        F.array_distinct(F.split(F.col("norm"), " ")).alias("vw"),
    )
    u = base_index.select(
        F.col("doc_id").alias("u"), "lang", "blk",
        F.col("words").alias("uw"),
    )
    jac = F.round(
        F.size(F.array_intersect("vw", "uw"))
        / F.size(F.array_union("vw", "uw")),
        4,
    )
    cand = (
        d.join(u, ["blk", "lang"])
        .withColumn("jac", jac)
        .filter(F.col("jac") >= 0.8)
        .select("v", "u")
    )
    votes = (
        cand.join(base_labels.withColumnRenamed("node", "u"), "u")
        .groupBy(F.col("v"), "lbl")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("v").orderBy(F.col("c").desc(), F.col("lbl").asc())
    assigned = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("v", "lbl")
    )
    return (
        d.select("v").distinct()
        .join(assigned, "v", "left")
        .select(
            F.col("v").alias("doc_id"),
            F.coalesce("lbl", F.col("v")).alias("lbl"),
        )
    )
