#!/usr/bin/env python
"""End-to-end LLM training-data pipeline over the documents table:

    quality filter -> language filter -> exact dedup -> near-dup drop
    (MinHash-LSH candidates) -> sliding-window chunking -> sequence
    packing -> partitioned parquet sink

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

    # 2. exact dedup on normalized content
    fp = F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")))
    exact = kept.withColumn("_fp", fp).dropDuplicates(["_fp"]).drop("_fp")
    n2 = exact.count()

    # 3. near-dup victims from MinHash-LSH candidate pairs (keep min id).
    # The dedup fixture corpus plants near-twins densely, so the cut is
    # deliberately deep here; on organic data expect a few percent.
    pairs = dedup_minhash_lsh(spark, sf_dir)
    victims = pairs.select(
        F.greatest("a_id", "b_id").alias("doc_id")
    ).distinct()
    deduped = exact.join(victims, "doc_id", "left_anti")
    n3 = deduped.count()

    # 4. chunk + pack (operators run on the full table; restrict here by
    # joining back to the surviving doc ids)
    ids = deduped.select("doc_id")
    chunks = text_chunk(spark, sf_dir).join(ids, "doc_id")
    packs = token_pack(spark, sf_dir).groupBy("lang").agg(
        F.max("pack_id").alias("n_packs")
    )

    # 5. partitioned sink: one dir per language
    chunks.write.mode("overwrite").partitionBy("lang").parquet(out)

    print(f"documents: {n0} -> quality/lang {n1} -> exact-dedup {n2} "
          f"-> near-dedup {n3}")
    print(f"chunks written: {spark.read.parquet(out).count()} -> {out}")
    print("packs per language:")
    for r in packs.collect():
        print(f"  {r.lang}: {r.n_packs + 1}")


if __name__ == "__main__":
    main()
