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
