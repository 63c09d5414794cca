#!/usr/bin/env python
"""Corpus-refresh pipeline composing the round-6 curation operators:

    boilerplate-segment removal (dedup_paragraph) -> drift check on
    the incoming event telemetry (ts_drift_report) -> retrieval
    regression gate (retrieval_ndcg) -> epoch-based domain upsampling
    (curation_repeat_upsample) -> refreshed-corpus token census

The flow a periodic training-set refresh runs: clean the text first
(duplicated 10-word segments stripped corpus-wide), hold the release
if the telemetry distribution drifted or the retrieval quality gate
regressed, then re-balance domains by repeat factor and report the
final token budget. The cleaned text from stage 1 genuinely feeds the
stage-5 census — the dataflow is real, not a showcase of disconnected
calls.

    python examples/corpus_refresh_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from pyspark.sql import SparkSession

from hive_2_spark.llm.curation import curation_repeat_upsample
from hive_2_spark.llm.dedup import dedup_paragraph
from hive_2_spark.llm.retrieval import retrieval_ndcg
from hive_2_spark.core.timeseries import ts_drift_report

_NDCG_FLOOR = 0.05  # release gate: every query must clear this


def refresh_report(spark: SparkSession, sf_dir: str) -> dict:
    """Run the five stages and return the release-decision numbers.

    Keys: segs_removed, segs_total, drifted_types, worst_ndcg,
    ndcg_pass, doc_epoch_rows, clean_tokens, train_tokens_after_clean.
    """
    cleaned = dedup_paragraph(spark, sf_dir)
    removed = cleaned.agg(
        F.sum("n_removed").alias("segs_removed"),
        F.sum("n_segs").alias("segs_total"),
    ).collect()[0]

    drift = ts_drift_report(spark, sf_dir)
    drifted = sorted(r.event_type for r in drift.collect() if r.drifted)

    ndcg = retrieval_ndcg(spark, sf_dir)
    worst = ndcg.agg(F.min("ndcg").alias("w")).collect()[0]["w"]

    epochs = curation_repeat_upsample(spark, sf_dir)
    # the cleaned text feeds the final census — stage 1's output, not
    # the raw corpus
    census = (
        cleaned.join(epochs.select("doc_id", "n_epochs"), "doc_id")
        .select(
            F.size(F.split("cleaned_text", " ")).alias("toks"),
            "n_epochs",
        )
        .agg(
            F.sum("toks").alias("clean_tokens"),
            F.sum(F.col("toks") * F.col("n_epochs")).alias("train_toks"),
        )
        .collect()[0]
    )
    return {
        "segs_removed": removed["segs_removed"],
        "segs_total": removed["segs_total"],
        "drifted_types": drifted,
        "worst_ndcg": worst,
        "ndcg_pass": (worst or 0.0) >= _NDCG_FLOOR,
        "doc_epoch_rows": epochs.count(),
        "clean_tokens": census["clean_tokens"],
        "train_tokens_after_clean": census["train_toks"],
    }


def main() -> None:
    from hive_2_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus_refresh_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    r = refresh_report(spark, sf_dir)
    print(
        f"[1/5] boilerplate removal: {r['segs_removed']}/"
        f"{r['segs_total']} shared 10-word segments stripped"
    )
    print(
        "[2/5] telemetry drift: "
        + (f"DRIFTED types {r['drifted_types']} — hold the release"
           if r["drifted_types"] else "all event types within 10% TVD")
    )
    print(
        f"[3/5] retrieval gate: worst nDCG@10 = {r['worst_ndcg']} "
        f"({'pass' if r['ndcg_pass'] else 'FAIL'})"
    )
    print(f"[4/5] domain upsampling: {r['doc_epoch_rows']} docs assigned")
    print(
        f"[5/5] refreshed corpus: {r['clean_tokens']} cleaned tokens, "
        f"{r['train_tokens_after_clean']} training tokens after upsampling"
    )
    spark.stop()


if __name__ == "__main__":
    main()
