"""Multimodal binary-column plumbing: schema, Arrow batch shape, stubbed
decode kernel, and the no-blob-on-shuffle aggregation path."""

from __future__ import annotations

import pytest

from hive_2_spark.llm import multimodal as mm
from tests.conftest import SF_DIR


def test_media_table_schema(spark):
    m = mm.media_table(spark, SF_DIR)
    assert dict(m.dtypes)["payload"] == "binary"
    assert dict(m.dtypes)["meta"].startswith("struct<n_bytes:bigint")
    row = m.filter("media_id = 1").collect()[0]
    assert bytes(row["payload"]).decode("utf-8")  # round-trips as utf-8
    assert row["meta"]["n_bytes"] == len(row["payload"])


def test_extract_features_batchwise(spark):
    feats = mm.extract_features(mm.media_table(spark, SF_DIR)).collect()
    assert len(feats) == 500
    for r in feats[:5]:
        assert len(r["feat"]) == 8
        assert abs(sum(r["feat"]) - 1.0) < 1e-9  # histogram normalized
        assert r["decode_ok"]


def test_decode_stub_deterministic():
    a = mm._decode_stub(b"hello world", "image/png")
    b = mm._decode_stub(b"hello world", "image/png")
    assert a == b
    with pytest.raises(NotImplementedError):
        mm._decode_stub(None, "image/png")


def test_media_stats_no_blob_in_agg(spark):
    stats = mm.media_stats(spark, SF_DIR)
    # blob column must not appear anywhere in the aggregation plan output
    assert "payload" not in stats.columns
    rows = {r["mime"]: r["n"] for r in stats.collect()}
    assert sum(rows.values()) == 500


def test_media_resize_plan_semantics(spark):
    """Targets fit 256x256, preserve aspect within 1px, never upscale."""
    from hive_2_spark.llm.multimodal import media_resize

    rows = media_resize(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.target_w <= 256 and 1 <= r.target_h <= 256
        assert r.target_w <= r.orig_w and r.target_h <= r.orig_h
        if r.orig_w <= 256 and r.orig_h <= 256:  # never upscale
            assert (r.target_w, r.target_h) == (r.orig_w, r.orig_h)


def test_resize_payloads_batch_shape(spark):
    """Binary-in/binary-out mapInPandas kernel: one output row per input,
    payload clamped to the stub's target size."""
    from hive_2_spark.llm.multimodal import (
        media_resize,
        media_table,
        resize_payloads,
    )

    base = media_table(spark, SF_DIR)
    plan = media_resize(spark, SF_DIR).select(
        "media_id", "target_w", "target_h"
    )
    out = resize_payloads(base.join(plan, "media_id"))
    assert out.count() == base.count()
    r = out.orderBy("media_id").first()
    assert isinstance(r.resized, (bytes, bytearray)) and len(r.resized) >= 1


def test_media_frame_sample_stride(spark):
    """Only video rows fan out; indices are 0..n_frames-1 at stride 10."""
    from hive_2_spark.llm.multimodal import media_frame_sample

    rows = media_frame_sample(spark, SF_DIR).collect()
    assert rows
    by_media: dict[int, list[int]] = {}
    for r in rows:
        assert r.media_id % 3 == 2  # video/mp4 synthesis rule
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    for mid, idxs in by_media.items():
        n_frames = mid % 300 + 30
        assert sorted(idxs) == list(range(0, n_frames, 10))
