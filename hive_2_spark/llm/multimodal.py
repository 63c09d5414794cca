"""Multimodal column plumbing (SURVEY.md §2B op 44, driver mandate).

Images/audio/video ride as opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, partitioning, Arrow batch
shape, Pandas-UDF signatures — is real and tested, and (since r2) so are
the kernels: payloads are genuine PNG / WAV / RAWV containers built and
parsed by the pure-stdlib codecs in ``media_codec.py`` (zlib PNG with
CRC-validated chunks, ``wave`` 16-bit PCM, an explicit deterministic
video container). A production deployment swaps one decode function for
PIL/libvips/ffmpeg; every Spark-side decision stays identical.

Two fixture tables:

- ``media_table`` — ``documents.text`` utf-8 bytes as the blob; feeds
  the three ORACLE-checked metadata/plan keys (DuckDB can mirror
  octet_length over encode(text), it cannot mirror PNG encoding).
- ``media_table_real`` — real containers synthesized deterministically
  from ``media_id`` inside ``mapInPandas``; feeds the rows-only
  ``media_features`` decode pipeline and the real resize kernel.

Scale notes: binary payloads stay OFF the shuffle path — features are
extracted in a single mapInPandas scan; any grouping happens on the
extracted metadata, never on the blob. Arrow batch size is capped via
``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are large.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_2_spark.catalog import load_table
from hive_2_spark.llm import media_codec as codec

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


def media_table_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One REAL container payload per document row, synthesized from
    ``media_id`` alone inside ``mapInPandas`` — fully distributed (no
    driver-side blob materialization) and bit-deterministic, so the
    rows-only driver check is stable. Dimensions are kept small (the
    point is genuine parse work per row, not bulk)."""

    base = media_table(spark, sf_dir).select("media_id", "mime")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for mid, mime in zip(pdf["media_id"], pdf["mime"]):
                mid = int(mid)
                if mime == "image/png":
                    payloads.append(
                        codec.encode_png(mid % 24 + 8, mid % 16 + 8, mid)
                    )
                elif mime == "audio/wav":
                    payloads.append(codec.encode_wav(mid % 1500 + 64, mid))
                else:
                    payloads.append(
                        codec.encode_rawv(
                            mid % 16 + 8, mid % 12 + 8, mid % 6 + 2, mid
                        )
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": pdf["mime"],
                }
            )

    return base.mapInPandas(gen, schema="media_id long, payload binary, mime string")


def _pixel_feats(kind: float, w: int, h: int, px: bytes) -> list[float]:
    n = len(px)
    mean = sum(px) / n
    var = sum(b * b for b in px) / n - mean * mean
    return [
        kind,
        float(w),
        float(h),
        float(n),
        mean / 255.0,
        math.sqrt(max(var, 0.0)) / 255.0,
        min(px) / 255.0,
        max(px) / 255.0,
    ]


def decode_features(payload: bytes) -> list[float]:
    """REAL decode/feature kernel: sniff the container by magic bytes,
    parse it with the stdlib codec, and reduce content to a fixed 8-dim
    vector ``[kind, dim1, dim2, n_units, mean, spread, min, max]``.

    Raises ``ValueError`` on malformed/unknown payloads — surfaced as
    ``decode_ok = false`` rows by ``extract_features``, never as a task
    failure (one corrupt blob must not kill a 100 TB scan)."""
    if payload is None:
        raise ValueError("null payload")
    payload = bytes(payload)
    if payload[: len(codec.PNG_SIG)] == codec.PNG_SIG:
        w, h, px = codec.decode_png(payload)
        return _pixel_feats(1.0, w, h, px)
    if payload[:4] == b"RIFF":
        rate, samples = codec.decode_wav(payload)
        n = len(samples)
        mean_abs = sum(abs(s) for s in samples) / n
        rms = math.sqrt(sum(s * s for s in samples) / n)
        return [
            2.0,
            float(rate),
            1.0,  # channels
            float(n),
            mean_abs / 32768.0,
            rms / 32768.0,
            min(samples) / 32768.0,
            max(samples) / 32768.0,
        ]
    if payload[:4] == codec.RAWV_MAGIC:
        w, h, frames = codec.decode_rawv(payload)
        feats = _pixel_feats(3.0, w, h, b"".join(frames))
        feats[3] = float(len(frames))  # n_units = frame count
        return feats
    raise ValueError("unknown media container")


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas: Arrow-batched binary -> feature vectors.

    One pass over partitions; the blob never crosses a shuffle. Corrupt
    payloads yield ``decode_ok = false`` with a null feature vector.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats: list[list[float] | None] = []
            oks: list[bool] = []
            for p in pdf["payload"]:
                try:
                    feats.append(decode_features(p))
                    oks.append(True)
                except ValueError:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "mime": pdf["mime"],
                    "feat": feats,
                    "decode_ok": oks,
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only query key: real binary -> parse -> features pipeline.

    The 8-dim feature vector is emitted as a fixed-format CSV string
    (`feat_csv`), not `array<double>`: the driver's canonicalizer sorts
    every output column through pandas, which cannot factorize Python
    lists (the one red row in CORRECTNESS_r03). Same pattern as
    `emb_quantize_int8` — and what a feature store would persist anyway.
    Formatting is JVM-side (`format_string('%.6f')`), deterministic."""
    feats = extract_features(media_table_real(spark, sf_dir))
    feat_csv = F.array_join(
        F.transform(F.col("feat"), lambda x: F.format_string("%.6f", x)), ","
    )
    return feats.select(
        "media_id",
        "n_bytes",
        "mime",
        F.when(F.col("decode_ok"), feat_csv).alias("feat_csv"),
        "decode_ok",
    )


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


def resize_payload(payload: bytes, target_w: int, target_h: int) -> bytes:
    """REAL resize kernel, dispatched on container magic:

    - PNG  -> decode, nearest-neighbor resample to (target_w, target_h),
      re-encode (production: PIL.Image.resize / libvips thumbnail).
    - RAWV -> per-frame nearest-neighbor resample, re-encode.
    - WAV  -> nearest-neighbor resample of the sample array to a
      ``target_w * target_h`` sample budget (production: polyphase
      resampler) — the audio analog of fitting a pixel box.

    Opaque blobs (e.g. ``media_table``'s text bytes) are clamped to the
    target byte budget — the documented fallback, not an error, because
    a mixed 100 TB corpus always contains formats a kernel can't parse.
    """
    payload = bytes(payload)
    tw, th = max(int(target_w), 1), max(int(target_h), 1)
    if payload[: len(codec.PNG_SIG)] == codec.PNG_SIG:
        w, h, px = codec.decode_png(payload)
        return codec.encode_png_gray(tw, th, codec.resample_gray(px, w, h, tw, th))
    if payload[:4] == codec.RAWV_MAGIC:
        w, h, frames = codec.decode_rawv(payload)
        return codec.encode_rawv_frames(
            tw, th, [codec.resample_gray(f, w, h, tw, th) for f in frames]
        )
    if payload[:4] == b"RIFF":
        rate, samples = codec.decode_wav(payload)
        n, m = len(samples), tw * th
        out = [samples[i * n // m] for i in range(m)]
        return codec.encode_wav_from_samples(rate, out)
    return payload[: max(tw * th, 1)]


def resize_payloads(df: DataFrame) -> DataFrame:
    """mapInPandas face of the resize: blob + target dims -> new blob.
    Input df must carry payload/target_w/target_h (join of a media table
    and the media_resize plan output)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [
                resize_payload(p, w, h)
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


def media_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image 64-bit average-hash over REAL decoded PNG pixels.

    The corpus is the PNG slice of the media table plus planted exact
    twins (media_id + 1,000,000 carries the BASE id's payload), so the
    dedup downstream has ground truth. Generate→decode→hash runs in ONE
    mapInPandas pass: the payload never leaves the task, only the
    8-byte hash is emitted — at 100 TB of images the shuffle carries
    64 bits per image."""
    base = (
        media_table(spark, sf_dir)
        .filter(F.col("mime") == "image/png")
        .select("media_id")
    )
    twins = base.filter(F.col("media_id") % 7 == 0).select(
        (F.col("media_id") + 1_000_000).alias("media_id")
    )
    ids = base.unionAll(twins)

    def hash_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = []
            for mid in pdf["media_id"]:
                seed = int(mid) % 1_000_000
                payload = codec.encode_png(seed % 24 + 8, seed % 16 + 8, seed)
                w, h, px = codec.decode_png(payload)
                small = codec.resample_gray(px, w, h, 8, 8)
                mean = sum(small) / 64.0
                bits = 0
                for i, p in enumerate(small):
                    if p > mean:
                        bits |= 1 << i
                # to signed 64-bit so it fits LongType
                if bits >= 1 << 63:
                    bits -= 1 << 64
                hashes.append(bits)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "phash": hashes}
            )

    return ids.mapInPandas(hash_batch, schema="media_id long, phash long")


def media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dedup on the perceptual hash: groups with n_copies and the
    kept (minimum) id — the visual-content analogue of `dedup_exact`.
    Rows-only check (PNG encode/decode is not SQL-expressible); planted
    twin recall is gated in tests/test_multimodal.py."""
    return (
        media_phash(spark, sf_dir)
        .groupBy("phash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.min("media_id").alias("keep_id"),
        )
    )


_CUT_THRESH = 85.0  # mean |frame delta| above this = scene cut
_SCENE_SHIFT = 137  # pixel-ramp seed bump applied from the cut frame on


def media_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over RAWV video rows: per adjacent-frame
    boundary, the mean absolute pixel delta, flagged as a cut when it
    exceeds the threshold — the shot-segmentation step a video
    training pipeline runs before frame sampling (sample per SCENE,
    not per fixed stride).

    Videos are synthesized deterministically from media_id inside ONE
    mapInPandas pass (generate → decode → diff; payloads never leave
    the task — only boundary stats are emitted, so at 100 TB of video
    the shuffle carries a few doubles per frame boundary). Even ids
    get a planted scene change (ramp seed bumped by {shift} from frame
    c = 1 + id mod (n-1)): continuous ramp boundaries measure ~51.4
    mean delta, scene boundaries ~116.7, so the {thresh} threshold
    separates cleanly. Rows-only by necessity (real zlib container
    decode — the media_features barrier); planted-cut recall gated in
    tests/test_multimodal.py.

    Output: media_id, frame_idx (boundary's right frame), mean_delta,
    is_cut.
    """
    base = (
        media_table(spark, sf_dir)
        .filter(F.col("mime") == "video/mp4")
        .select("media_id")
    )

    def cuts(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids, fidx, deltas, flags = [], [], [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h, n = mid % 16 + 8, mid % 12 + 8, mid % 6 + 4
                cut = 1 + mid % (n - 1) if mid % 2 == 0 else None
                frames = []
                for f in range(n):
                    seed = mid + (_SCENE_SHIFT if cut is not None and f >= cut else 0)
                    frames.append(
                        bytes(
                            ((x * 13 + y * 7 + f * 29 + seed) & 0xFF)
                            for y in range(h)
                            for x in range(w)
                        )
                    )
                payload = codec.encode_rawv_frames(w, h, frames)
                dw, dh, dec = codec.decode_rawv(payload)
                npx = dw * dh
                for f in range(1, len(dec)):
                    a, b = dec[f - 1], dec[f]
                    s = sum(abs(b[i] - a[i]) for i in range(npx))
                    md = s / npx
                    mids.append(mid)
                    fidx.append(f)
                    deltas.append(round(md, 4))
                    flags.append(md > _CUT_THRESH)
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "frame_idx": fidx,
                    "mean_delta": deltas,
                    "is_cut": flags,
                }
            )

    return base.mapInPandas(
        cuts,
        schema="media_id long, frame_idx long, mean_delta double, is_cut boolean",
    )


media_scene_cut.__doc__ = media_scene_cut.__doc__.format(
    shift=_SCENE_SHIFT, thresh=_CUT_THRESH
)


QUERIES = {
    "media_scene_cut": media_scene_cut,  # rows-only (real RAWV decode)
    "media_features": media_features,  # rows-only (Pandas-UDF stub decode)
    "media_stats": media_stats,
    "media_resize": media_resize,
    "media_frame_sample": media_frame_sample,
    "media_phash_dedup": media_phash_dedup,  # rows-only (real PNG decode)
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
