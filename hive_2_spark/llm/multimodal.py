"""Multimodal column plumbing (SURVEY.md §2B op 44, driver mandate).

Images/audio/video ride as opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, partitioning, Arrow batch
shape, Pandas-UDF signatures — is real and tested; the actual
decode/resample kernels are STUBBED deterministically because no
image/audio libraries exist in this container (each stub documents the
production swap-in, e.g. PIL/libvips for images).

The binary fixtures are synthesized from ``documents.text`` (utf-8
encode) — deterministic, so the rows-only query is stable.

Scale notes: binary payloads stay OFF the shuffle path — metadata is
extracted in a single mapInPandas scan; any grouping happens on the
extracted metadata, never on the blob. Arrow batch size is capped via
``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are large.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_2_spark.catalog import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.StructType(
            [
                T.StructField("n_bytes", T.LongType(), True),
                T.StructField("width", T.IntegerType(), True),
                T.StructField("height", T.IntegerType(), True),
            ]
        ), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, mime string, "
    "feat array<double>, decode_ok boolean"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table: text payloads as opaque binary blobs."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
    ).withColumn(
        "meta",
        F.struct(
            F.length("payload").cast("long").alias("n_bytes"),
            (F.col("media_id") % 640 + 16).cast("int").alias("width"),
            (F.col("media_id") % 480 + 16).cast("int").alias("height"),
        ),
    )


def _decode_stub(payload: bytes, mime: str) -> list[float]:
    """STUB decode/feature-extract kernel.

    Production swap-in: PIL/libvips decode + CNN features for images,
    torchaudio/librosa for audio, frame-sampling + per-frame features
    for video. Here: a deterministic 8-dim byte-histogram sketch so the
    pipeline shape (binary -> fixed-width float vector) is exercised
    end-to-end without media libraries.
    """
    if payload is None:
        raise NotImplementedError("real decoder not available in this container")
    hist = [0.0] * 8
    for by in payload:
        hist[by & 7] += 1.0
    total = sum(hist) or 1.0
    return [h / total for h in hist]


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas: Arrow-batched binary -> feature vectors.

    One pass over partitions; the blob never crosses a shuffle.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_stub(p, m)
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "mime": pdf["mime"],
                    "feat": feats,
                    "decode_ok": [True] * len(pdf),
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only query key: full binary->features pipeline."""
    return extract_features(media_table(spark, sf_dir))


def media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable metadata aggregation over the media table
    (blob strictly excluded from the aggregation path)."""
    m = media_table(spark, sf_dir)
    return m.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.max("meta.width").alias("max_w"),
    )


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize PLAN: target dimensions to fit 256x256
    (never upscale) computed as pure column math — this is the part of a
    resize pipeline that drives work distribution and is oracle-checked;
    the pixel kernel itself is the stub (``_resize_stub``). At scale the
    plan lets you partition/batch by output size BEFORE touching bytes."""
    m = media_table(spark, sf_dir)
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    scale = F.least(F.lit(256.0) / w, F.lit(256.0) / h, F.lit(1.0))
    return m.select(
        "media_id",
        "mime",
        F.col("meta.width").cast("long").alias("orig_w"),
        F.col("meta.height").cast("long").alias("orig_h"),
        F.greatest(F.floor(w * scale), F.lit(1)).cast("long").alias("target_w"),
        F.greatest(F.floor(h * scale), F.lit(1)).cast("long").alias("target_h"),
    )


def _resize_stub(payload: bytes, target_w: int, target_h: int) -> bytes:
    """STUB pixel-resize kernel (production swap-in: PIL.Image.resize /
    libvips thumbnail). Deterministic fake: clamp the blob to
    target_w*target_h bytes — preserves the binary-in/binary-out batch
    shape the real kernel would have."""
    if payload is None:
        raise NotImplementedError("real resizer not available in this container")
    return payload[: max(target_w * target_h, 1)]


def resize_payloads(df: DataFrame) -> DataFrame:
    """mapInPandas face of the resize: blob + target dims -> new blob.
    Input df must carry payload/target_w/target_h (join of media_table
    and media_resize output)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [
                _resize_stub(p, w, h)
                for p, w, h in zip(
                    pdf["payload"], pdf["target_w"], pdf["target_h"]
                )
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "resized": out})

    return df.mapInPandas(batches, schema="media_id long, resized binary")


_FRAME_STEP = 10


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling PLAN for video rows: every ``_FRAME_STEP``-th frame
    index, exploded into a frame-extraction work list (media_id,
    frame_idx). Codegen-only (sequence + explode); the per-frame decode
    is the documented stub. This is how 100 TB of video fans out into
    parallelizable frame tasks without moving a byte of payload."""
    m = media_table(spark, sf_dir).filter(F.col("mime") == "video/mp4")
    n_frames = (F.col("media_id") % 300 + 30).cast("long")
    return m.select(
        "media_id",
        n_frames.alias("n_frames"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), n_frames - 1, F.lit(_FRAME_STEP))
        ).alias("frame_idx"),
    )


QUERIES = {
    "media_features": media_features,  # rows-only (Pandas-UDF stub decode)
    "media_stats": media_stats,
    "media_resize": media_resize,
    "media_frame_sample": media_frame_sample,
}

ORACLES = {
    "media_stats": (
        "SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png' "
        "WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime, "
        "COUNT(*) AS n, "
        "CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes, "
        "CAST(MAX(doc_id % 640 + 16) AS INT) AS max_w "
        "FROM documents GROUP BY 1"
    ),
    "media_resize": (
        "SELECT media_id, mime, CAST(w AS BIGINT) AS orig_w, "
        "CAST(h AS BIGINT) AS orig_h, "
        "CAST(GREATEST(FLOOR(w * LEAST(256.0 / w, 256.0 / h, 1.0)), 1) "
        "  AS BIGINT) AS target_w, "
        "CAST(GREATEST(FLOOR(h * LEAST(256.0 / w, 256.0 / h, 1.0)), 1) "
        "  AS BIGINT) AS target_h "
        "FROM (SELECT doc_id AS media_id, "
        "CASE WHEN doc_id % 3 = 0 THEN 'image/png' "
        "WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime, "
        "CAST(doc_id % 640 + 16 AS DOUBLE) AS w, "
        "CAST(doc_id % 480 + 16 AS DOUBLE) AS h FROM documents)"
    ),
    "media_frame_sample": (
        "SELECT media_id, CAST(nf AS BIGINT) AS n_frames, "
        "CAST(fi AS BIGINT) AS frame_idx "
        "FROM (SELECT doc_id AS media_id, doc_id % 300 + 30 AS nf "
        "FROM documents WHERE doc_id % 3 = 2), "
        "LATERAL (SELECT unnest(range(0, nf, 10)) AS fi)"
    ),
}
