"""End-to-end training-data pipeline composition: quality-filter ->
exact-dedup -> token-count -> stratified-sample -> partitioned write.
One lazy plan start to finish; results re-read from the sink and
sanity-checked. This is the composed shape the individual operators
exist to serve."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table
from hive_2_spark.llm.dedup import _NORM, corpus_with_dups
from tests.conftest import SF_DIR


def test_pipeline_composes(spark, tmp_path):
    out = str(tmp_path / "curated")

    corpus = corpus_with_dups(spark, SF_DIR)  # includes synthetic dups

    # 1. quality gate: keep docs with enough alpha content
    alpha_ratio = F.length(F.regexp_replace("text", r"[^A-Za-z]", "")) / F.greatest(
        F.length("text"), F.lit(1)
    )
    quality = corpus.filter(alpha_ratio > 0.5)

    # 2. exact dedup: keep the lowest doc_id per content fingerprint
    fp = quality.withColumn("fp", F.md5(_NORM(F.col("text"))))
    w_keep = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    deduped = fp.join(w_keep, on=["fp", "doc_id"], how="inner")

    # 3. enrichment: token counts
    enriched = deduped.withColumn(
        "n_tokens", F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )

    # 4. deterministic 1-in-5 stratified sample per lang
    from pyspark.sql import Window as W

    wn = W.partitionBy("lang").orderBy("doc_id")
    sampled = (
        enriched.withColumn("rn", F.row_number().over(wn))
        .filter((F.col("rn") - 1) % 5 == 0)
        .drop("rn", "fp")
    )

    # 5. partitioned sink
    sampled.write.mode("overwrite").partitionBy("lang").parquet(out)

    back = spark.read.parquet(out)
    assert back.count() == sampled.count() > 0
    # dedup really removed the synthetic exact twins
    assert back.filter(F.col("doc_id") >= 20_000_000).count() == 0
    # sample kept every language stratum
    langs = {r["lang"] for r in back.select("lang").distinct().collect()}
    assert langs == {"en", "de", "fr", "es", "zh"}
    # enrichment survived the sink
    assert back.filter(F.col("n_tokens") <= 0).count() == 0
