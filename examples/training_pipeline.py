#!/usr/bin/env python
"""End-to-end LLM training-data pipeline over the documents table:

    quality filter -> language filter -> repetition + LM-surprisal
    gates -> PII scrub -> exact dedup -> near-dup drop (MinHash-LSH
    candidates) -> eval-set decontamination (5-word shingles) ->
    content-hash train/val/test split -> sliding-window chunking ->
    sequence packing -> deterministic shard shuffle -> partitioned sink

Every stage is a registered operator (see OPERATORS.md); this script
shows them composed the way a curation job would run them. Payload-free
plan prints show where the shuffles are.

    python examples/training_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table
from hive_2_spark.llm.curation import _EMAIL_RE, _shingles
from hive_2_spark.llm.dedup import dedup_minhash_lsh
from hive_2_spark.llm.text import text_chunk, token_pack
from hive_2_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="training_pipeline_"
    )
    spark = get_spark("training_pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality + language gate (cheap, pushed to the scan)
    kept = docs.filter(
        (F.length("text") >= 50) & F.col("lang").isin("en", "de", "fr")
    )
    n1 = kept.count()

    # 1b. repetition + LM-surprisal gates (the Gopher/CCNet-style
    # filters): drop repetitive docs and the extreme-surprisal tails
    from hive_2_spark.llm.quality import quality_lm_score, quality_repetition

    rep_ok = quality_repetition(spark, sf_dir).filter(
        ~F.col("repetitive")
    ).select("doc_id")
    lm = quality_lm_score(spark, sf_dir)
    bounds = lm.select(
        F.expr("percentile(surprisal, 0.02)").alias("lo"),
        F.expr("percentile(surprisal, 0.98)").alias("hi"),
    )
    lm_ok = lm.crossJoin(F.broadcast(bounds)).filter(
        F.col("surprisal").between(F.col("lo"), F.col("hi"))
    ).select("doc_id")
    kept = kept.join(rep_ok, "doc_id", "left_semi").join(
        lm_ok, "doc_id", "left_semi"
    )
    n1b = kept.count()

    # 2. PII scrub BEFORE fingerprinting: two docs identical except for
    # an embedded email must dedup together after redaction
    kept = kept.withColumn(
        "text", F.regexp_replace("text", _EMAIL_RE, "[EMAIL]")
    )

    # 3. exact dedup on normalized content
    fp = F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")))
    exact = kept.withColumn("_fp", fp).dropDuplicates(["_fp"]).drop("_fp")
    n2 = exact.count()

    # 4. near-dup victims from MinHash-LSH candidate pairs (keep min id).
    # The dedup fixture corpus plants near-twins densely, so the cut is
    # deliberately deep here; on organic data expect a few percent.
    pairs = dedup_minhash_lsh(spark, sf_dir)
    victims = pairs.select(
        F.greatest("a_id", "b_id").alias("doc_id")
    ).distinct()
    deduped = exact.join(victims, "doc_id", "left_anti")
    n3 = deduped.count()

    # 5. eval-set decontamination: drop any doc sharing a 5-word shingle
    # with the held-out benchmark slice (every 97th doc). The eval-gram
    # side is tiny by construction -> broadcast semi-join, corpus never
    # shuffles for the probe.
    grams = _shingles(docs)
    eval_grams = (
        grams.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    )
    contaminated = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(eval_grams), "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = deduped.join(contaminated, "doc_id", "left_anti").filter(
        F.col("doc_id") % 97 != 0  # the eval slice itself never trains
    )
    n4 = clean.count()

    # 6. deterministic content-hash split (survives re-crawls/re-shards)
    first = F.substring(F.md5("text"), 1, 1)
    clean = clean.withColumn(
        "split",
        F.when(first == "0", "test").when(first == "1", "val").otherwise(
            "train"
        ),
    )

    # 7. chunk + pack (operators run on the full table; restrict here by
    # joining back to the surviving doc ids + split labels)
    ids = clean.select("doc_id", "split")
    chunks = text_chunk(spark, sf_dir).join(ids, "doc_id")
    packs = token_pack(spark, sf_dir).groupBy("lang").agg(
        F.max("pack_id").alias("n_packs")
    )

    # 8. deterministic global shuffle: seed-keyed shard so the training
    # order is reproducible without RNG state (new epoch = new seed)
    shard_key = F.md5(F.concat(F.lit("epoch0:"), F.col("doc_id").cast("string")))
    chunks = chunks.withColumn("shard", F.substring(shard_key, 1, 2))

    # 9. partitioned sink: one dir per (split, language)
    chunks.write.mode("overwrite").partitionBy("split", "lang").parquet(out)

    print(f"documents: {n0} -> quality/lang {n1} -> repetition/LM {n1b} "
          f"-> exact-dedup {n2} -> near-dedup {n3} -> decontaminated {n4}")
    split_counts = {
        r.split: r.n for r in ids.groupBy("split").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    print(f"split sizes: {split_counts}")
    print(f"chunks written: {spark.read.parquet(out).count()} -> {out}")
    print("packs per language:")
    for r in packs.collect():
        print(f"  {r.lang}: {r.n_packs + 1}")


if __name__ == "__main__":
    main()
