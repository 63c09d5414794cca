"""True-streaming face of incremental community maintenance (SURVEY
row 106): delta documents arrive through a REAL file-source stream in
three micro-batches, each labeled by streaming/communities.attach_labels
inside foreachBatch and appended to a parquet label store. The union
must agree per-node with the batch semantics (one plurality vote over
base-labeled near-dup neighbors, count desc / label asc, own-id
fallback), replayed here in pure Python from the SAME edge set the
batch operator uses."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _expected_delta_labels(edges, base_lbl, mod, all_delta_ids):
    """Pure-Python replay of the one-shot attach over the pair graph."""
    nbrs: dict[int, list[int]] = {}
    for s, d in edges:
        if s % mod == 0 and d % mod != 0:
            nbrs.setdefault(s, []).append(d)
    out = {}
    for v in all_delta_ids:
        votes = Counter(
            base_lbl[u] for u in nbrs.get(v, []) if u in base_lbl
        )
        if votes:
            top = max(votes.values())
            out[v] = min(l for l, c in votes.items() if c == top)
        else:
            out[v] = v  # no labeled neighbor: singleton
    return out


def test_stream_attach_matches_batch_semantics(spark, tmp_path):
    from pyspark.sql.window import Window

    from hive_2_spark.core.graph import _INC_DELTA_MOD, _inc_edges_and_base
    from hive_2_spark.llm.dedup import _BLOCK_CAP, _NORM, corpus_with_dups
    from hive_2_spark.streaming.communities import (
        attach_labels,
        community_base_state,
    )

    # Precondition for exact equivalence: every (blk, lang) block is on
    # dedup_ngram_jaccard's exact all-pairs leg, so the streaming band
    # join reproduces the batch pair set bit-for-bit (the mega leg is
    # MinHash-probabilistic and would need a recall gate instead).
    c = (
        corpus_with_dups(spark, SF_DIR)
        .withColumn("norm", _NORM(F.col("text")))
        .withColumn("blk", F.md5(F.substring(F.col("norm"), 1, 32)))
    )
    max_blk = (
        c.groupBy("blk", "lang").count().agg(F.max("count")).first()[0]
    )
    assert max_blk <= _BLOCK_CAP, "fixture grew a mega block; rework test"

    delta = (
        corpus_with_dups(spark, SF_DIR)
        .filter(F.col("doc_id") % _INC_DELTA_MOD == 0)
        .select("doc_id", "lang", "text")
    )
    src = str(tmp_path / "src")
    delta.repartition(3).write.parquet(src)  # 3 files -> 3 micro-batches

    base_index, base_labels = community_base_state(spark, SF_DIR)
    out = str(tmp_path / "labels")

    def handle(batch, _bid):
        attach_labels(batch, base_index, base_labels).write.mode(
            "append"
        ).parquet(out)

    q = (
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert q.lastProgress["batchId"] >= 2  # genuinely multiple batches

    got = {r.doc_id: r.lbl for r in spark.read.parquet(out).collect()}
    delta_ids = [r.doc_id for r in delta.select("doc_id").collect()]
    assert len(got) == len(delta_ids)  # every arrival labeled once

    edges_df, base_df = _inc_edges_and_base(spark, SF_DIR)
    edges = [(r.src, r.dst) for r in edges_df.collect()]
    base_lbl = {r.node: r.lbl for r in base_df.collect()}
    expected = _expected_delta_labels(
        edges, base_lbl, _INC_DELTA_MOD, delta_ids
    )
    assert got == expected
    # sanity: the stream actually attached some arrivals to EXISTING
    # base communities (not everything degenerated to singletons)
    assert any(lbl != v for v, lbl in got.items())
