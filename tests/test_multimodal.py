"""Multimodal binary-column plumbing: schema, Arrow batch shape, REAL
stdlib decode kernels (PNG/WAV/RAWV), and the no-blob-on-shuffle
aggregation path."""

from __future__ import annotations

import pytest

from hive_2_spark.llm import media_codec as codec
from hive_2_spark.llm import multimodal as mm
from tests.conftest import SF_DIR

KIND_BY_MIME = {"image/png": 1.0, "audio/wav": 2.0, "video/mp4": 3.0}


def test_media_table_schema(spark):
    m = mm.media_table(spark, SF_DIR)
    assert dict(m.dtypes)["payload"] == "binary"
    assert dict(m.dtypes)["meta"].startswith("struct<n_bytes:bigint")
    row = m.filter("media_id = 1").collect()[0]
    assert bytes(row["payload"]).decode("utf-8")  # round-trips as utf-8
    assert row["meta"]["n_bytes"] == len(row["payload"])


def test_media_table_real_payloads_are_valid_containers(spark):
    rows = mm.media_table_real(spark, SF_DIR).orderBy("media_id").take(9)
    for r in rows:
        p = bytes(r.payload)
        if r.mime == "image/png":
            assert p[:8] == codec.PNG_SIG
        elif r.mime == "audio/wav":
            assert p[:4] == b"RIFF"
        else:
            assert p[:4] == codec.RAWV_MAGIC


def test_extract_features_real_decode(spark):
    feats = mm.extract_features(mm.media_table_real(spark, SF_DIR)).collect()
    assert len(feats) == 500
    for r in feats:
        assert r["decode_ok"], r
        assert len(r["feat"]) == 8
        assert r["feat"][0] == KIND_BY_MIME[r["mime"]]  # kind matches mime
        assert 0.0 <= r["feat"][4] <= 1.0  # normalized mean


def test_decode_features_real_and_corrupt():
    png = codec.encode_png(16, 12, seed=7)
    assert mm.decode_features(png) == mm.decode_features(png)  # deterministic
    assert mm.decode_features(png)[:4] == [1.0, 16.0, 12.0, 192.0]
    wav = codec.encode_wav(200, seed=3)
    assert mm.decode_features(wav)[:4] == [2.0, 8000.0, 1.0, 200.0]
    with pytest.raises(ValueError):
        mm.decode_features(b"not a container at all")
    # corrupt a PNG byte inside IDAT -> CRC check must catch it
    bad = bytearray(png)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError):
        mm.decode_features(bytes(bad))


def test_extract_features_corrupt_rows_flagged_not_fatal(spark):
    """One corrupt blob yields decode_ok=false, not a task failure."""
    good = codec.encode_png(8, 8, seed=1)
    df = spark.createDataFrame(
        [(1, bytearray(good), "image/png"), (2, bytearray(b"garbage"), "image/png")],
        "media_id long, payload binary, mime string",
    )
    rows = {r.media_id: r for r in mm.extract_features(df).collect()}
    assert rows[1].decode_ok and rows[1].feat is not None
    assert not rows[2].decode_ok and rows[2].feat is None


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


def test_resize_payloads_real_kernel(spark):
    """Binary-in/binary-out mapInPandas kernel over REAL containers: one
    output row per input, and resized PNGs decode to the plan's exact
    target dimensions."""
    from hive_2_spark.llm.multimodal import (
        media_resize,
        media_table_real,
        resize_payloads,
    )

    base = media_table_real(spark, SF_DIR)
    plan = media_resize(spark, SF_DIR).select(
        "media_id", "target_w", "target_h"
    )
    joined = base.join(plan, "media_id")
    out = resize_payloads(joined)
    assert out.count() == base.count()
    targets = {r.media_id: (r.target_w, r.target_h) for r in plan.collect()}
    for r in out.filter("media_id % 3 = 0").orderBy("media_id").take(5):
        w, h, px = codec.decode_png(bytes(r.resized))  # valid PNG out
        assert (w, h) == targets[r.media_id]
        assert len(px) == w * h


def test_resize_payload_kernel_units():
    png = codec.encode_png(20, 10, seed=5)
    w, h, _ = codec.decode_png(mm.resize_payload(png, 10, 5))
    assert (w, h) == (10, 5)
    vid = codec.encode_rawv(12, 8, 3, seed=5)
    vw, vh, frames = codec.decode_rawv(mm.resize_payload(vid, 6, 4))
    assert (vw, vh, len(frames)) == (6, 4, 3)
    wav = codec.encode_wav(500, seed=5)
    rate, samples = codec.decode_wav(mm.resize_payload(wav, 10, 10))
    assert rate == codec.WAV_RATE and len(samples) == 100
    # opaque blob -> documented clamp fallback
    assert mm.resize_payload(b"\x00\x01\x02\x03" * 10, 2, 3) == bytes(
        b"\x00\x01\x02\x03" * 10
    )[:6]


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


def test_media_phash_dedup_finds_planted_twins(spark):
    """Every planted twin (media_id + 1M carries the base payload) must
    share its base's perceptual hash; distinct images should rarely
    collide at 64 bits over 8x8 means."""
    from hive_2_spark.llm.multimodal import media_phash, media_phash_dedup

    ph = {r.media_id: r.phash for r in media_phash(spark, SF_DIR).collect()}
    base_ids = [m for m in ph if m < 1_000_000]
    twin_ids = [m for m in ph if m >= 1_000_000]
    assert twin_ids, "no planted twins"
    for t in twin_ids:
        assert ph[t] == ph[t - 1_000_000]  # exact payload copy -> same hash
    groups = media_phash_dedup(spark, SF_DIR).collect()
    assert sum(g.n_copies for g in groups) == len(ph)
    # every twin's group kept the base (minimum) id
    twin_groups = [g for g in groups if g.n_copies >= 2]
    assert len(twin_groups) >= len(twin_ids) // 2  # collisions may merge
    for g in twin_groups:
        assert g.keep_id < 1_000_000


def test_media_scene_cut_finds_planted_cuts(spark):
    """Even media_ids carry ONE planted scene change at frame
    c = 1 + id % (n-1); odd ids are continuous ramps. The detector
    must flag exactly the planted boundary for every even id and
    nothing for odd ids (ramp boundaries measure ~51.4 mean delta,
    scene boundaries ~116.7 — the 85.0 threshold separates)."""
    from hive_2_spark.llm.multimodal import media_scene_cut

    rows = media_scene_cut(spark, SF_DIR).collect()
    assert rows, "no video rows"
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    for mid, rs in by_id.items():
        n = mid % 6 + 4
        assert len(rs) == n - 1  # one row per boundary
        cuts = sorted(r.frame_idx for r in rs if r.is_cut)
        if mid % 2 == 0:
            assert cuts == [1 + mid % (n - 1)], f"media {mid}: {cuts}"
        else:
            assert cuts == [], f"media {mid}: spurious cuts {cuts}"
