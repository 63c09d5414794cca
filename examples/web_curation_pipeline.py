#!/usr/bin/env python
"""End-to-end web-crawl curation pipeline over the documents table:

    URL canonicalization + URL-level dedup -> domain blocklist filter
    -> blocklist-word quality gate -> temperature-scaled (alpha=0.5)
    language mixing -> per-source token-budget cap -> tokenizer
    OOV-coverage report on the survivors

Every stage is a registered operator (see OPERATORS.md); this script
composes them the way a crawl-to-training-set job would: structural
dedup first (cheapest key), then filters, then mixing, then budget —
each stage shrinks the corpus before the next pays its cost. All
stages are codegen string work, broadcast joins, or per-source/
per-language windows; nothing shuffles document text except the final
token explode, which runs on the smallest surviving set.

    python examples/web_curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from hive_2_spark.llm.curation import sample_source_token_cap, sample_temperature
from hive_2_spark.llm.quality import quality_blocklist_words
from hive_2_spark.llm.text import token_oov_rate
from hive_2_spark.llm.urls import curation_domain_filter, dedup_url_canonical
from hive_2_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("web_curation_pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    url_groups = dedup_url_canonical(spark, sf_dir)
    n_urls = url_groups.count()
    n_dups = url_groups.filter(F.col("n_dups") > 1).count()
    print(f"[1/6] URL dedup: {n_urls} canonical URLs, {n_dups} dup groups")

    domains = curation_domain_filter(spark, sf_dir)
    print(f"[2/6] domain blocklist: {domains.count()} surviving domains")
    domains.show(truncate=False)

    gates = quality_blocklist_words(spark, sf_dir)
    flagged = gates.filter(F.col("flagged")).count()
    print(f"[3/6] blocklist-word gate: {flagged}/{gates.count()} docs flagged")

    mix = sample_temperature(spark, sf_dir)
    print("[4/6] temperature mixing (alpha=0.5) — rarest language keeps all:")
    mix.orderBy("lang").show(truncate=False)

    capped = sample_source_token_cap(spark, sf_dir)
    per_src = capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("kept_docs"),
        F.max("cum_toks").alias("budget_used"),
    )
    print(f"[5/6] per-source token cap: {capped.count()} docs within budget")
    per_src.orderBy("source").show(truncate=False)

    oov = token_oov_rate(spark, sf_dir)
    stats = oov.agg(
        F.round(F.avg("oov_pm") / 10.0, 2).alias("mean_oov_pct"),
        F.max("oov_pm").alias("worst_oov_pm"),
    ).collect()[0]
    print(
        f"[6/6] tokenizer coverage: mean OOV {stats['mean_oov_pct']}%, "
        f"worst doc {stats['worst_oov_pm']}‰"
    )
    spark.stop()


if __name__ == "__main__":
    main()
