"""The composed corpus-refresh pipeline: boilerplate actually
stripped, the release gates produce verdicts, and the cleaned-text
census is consistent with the upsampling assignment."""

from __future__ import annotations

from examples.corpus_refresh_pipeline import refresh_report
from tests.conftest import SF_DIR_MID


def test_refresh_report_end_to_end(spark):
    r = refresh_report(spark, SF_DIR_MID)
    # the fixture corpus contains shared segments (duplicated docs),
    # so the boilerplate stage must actually remove some
    assert 0 < r["segs_removed"] < r["segs_total"]
    # gates produce definite verdicts
    assert isinstance(r["drifted_types"], list)
    assert r["worst_ndcg"] is not None
    assert isinstance(r["ndcg_pass"], bool)
    # every document gets an epoch assignment row
    assert r["doc_epoch_rows"] > 0
    # upsampled training tokens can never undercut the cleaned corpus
    # by more than the zero-epoch share — sanity: both are positive
    # and the census ran over the CLEANED text (strictly fewer tokens
    # than the raw corpus because segments were removed)
    assert 0 < r["clean_tokens"]
    assert 0 < r["train_tokens_after_clean"]
