"""As-of join: the window-based implementation and the merge_asof-based
implementation must agree exactly (two independent derivations of the
same semantics, cross-checked)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table
from hive_2_spark.core.asof import asof_join, asof_join_pandas
from tests.conftest import SF_DIR


def test_window_and_pandas_asof_agree(spark):
    e = load_table(spark, SF_DIR, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    via_window = {
        r["event_id"]: r["asof_click_id"]
        for r in asof_join(
            purchases, clicks, "user_id", "ts", "ts", ["click_id"]
        ).collect()
    }
    via_pandas = {
        r["event_id"]: r["asof_click_id"]
        for r in asof_join_pandas(
            purchases, clicks, "user_id", "ts", "ts", "click_id"
        ).collect()
    }
    assert via_window == via_pandas
    assert len(via_window) == purchases.count()  # left rows preserved
    assert any(v is not None for v in via_window.values())
