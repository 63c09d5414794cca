#!/usr/bin/env python
"""Soft-dedup training mix: the composed weighting pipeline for a
pre-training data loader, built from the round-12 operators.

    documents parquet
      -> soft-dedup weights (llm.curation.curation_soft_dedup_weights
                             — 1e6 DIV near-dup-cluster-size per doc;
                             duplicate families stop dominating the
                             loss without hard-dropping variation)
      -> split assignment   (llm.curation.curation_split_assign —
                             deterministic hash 80/20 train/val)
      -> vocabulary health  (llm.quality.quality_vocab_zipf — the
                             per-language Zipf head audit over the
                             SAME corpus the weights feed)

The output is the per-(split, lang) training-mix ledger a data loader
consumes: document counts, RAW token mass, and WEIGHTED token mass
(sum of n_chars * weight_e6 / 1e6) — the quantity that actually enters
the loss after soft dedup — plus the Zipf head ratios as the
go/no-go distributional check beside it.

Every section reuses the EXACT registry operator (covered by the same
DuckDB oracles the driver runs); the composition joins doc-sized
report frames on doc_id and lang only — the corpus text never
re-shuffles here.

Scale: the weights ride the shared persisted near-dup pair index (one
session build); the split is a pure hash expression; the Zipf audit is
one token explode. On a cluster these are three independent jobs plus
a doc-sized join.

    python examples/soft_dedup_training_mix.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def soft_dedup_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(split, lang, n_docs, raw_chars, weighted_chars, f1_f10_e3) —
    one row per training-mix cell."""
    from hive_2_spark.catalog import load_table
    from hive_2_spark.llm.curation import (
        curation_soft_dedup_weights,
        curation_split_assign,
    )
    from hive_2_spark.llm.quality import quality_vocab_zipf

    weights = curation_soft_dedup_weights(spark, sf_dir)
    split = curation_split_assign(spark, sf_dir).select("doc_id", "split")
    meta = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    zipf = quality_vocab_zipf(spark, sf_dir).select("lang", "f1_f10_e3")

    mix = (
        meta.join(weights, "doc_id")
        .join(split, "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("raw_chars"),
            F.round(
                F.sum(F.col("n_chars") * F.col("weight_e6") / 1e6), 2
            ).alias("weighted_chars"),
        )
    )
    return mix.join(zipf, "lang").select(
        "split", "lang", "n_docs", "raw_chars", "weighted_chars",
        "f1_f10_e3",
    )


if __name__ == "__main__":
    from hive_2_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("soft_dedup_training_mix")
    spark.sparkContext.setLogLevel("ERROR")
    soft_dedup_training_mix(spark, sf_dir).orderBy(
        "split", "lang"
    ).show(20, False)
    spark.stop()
