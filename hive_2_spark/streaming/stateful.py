"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2B op 42 "stateful dedup"/custom operators; guide §Structured
Streaming "Stateful").

Operator: per-user running spend monitor. State = (total_spend, n_events)
per user_id; each micro-batch folds its purchase events into the state
and emits the updated running totals. This is the canonical shape for
custom session/accumulator logic that tumbling/session windows cannot
express (cross-window, unbounded-lifetime state with custom merge).

Scale notes: state lives in the state store partitioned by user_id —
the shuffle is on user_id only; state size is O(distinct users), not
O(events). A production variant adds state TTL via GroupStateTimeout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import functions as F

OUTPUT_SCHEMA = "user_id long, total_spend double, n_events long"
STATE_SCHEMA = "total_spend double, n_events long"


def _update_spend(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        total, n = state.get
    else:
        total, n = 0.0, 0
    for pdf in pdf_iter:
        total += float(pdf["value"].sum())
        n += len(pdf)
    state.update((total, n))
    yield pd.DataFrame(
        {"user_id": [key[0]], "total_spend": [round(total, 2)], "n_events": [n]}
    )


def running_spend_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming plan: purchases folded into per-user state each batch."""
    from hive_2_spark.streaming.windows import _read_stream_events

    events = _read_stream_events(spark, sf_dir)
    return (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_spend,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_spend_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the same semantics (for verification)."""
    from hive_2_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.round(F.sum("value"), 2).alias("total_spend"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


QUERIES = {"stream_stateful_spend": running_spend_batch}

ORACLES = {
    "stream_stateful_spend": (
        "SELECT user_id, ROUND(SUM(value), 2) AS total_spend, "
        "COUNT(*) AS n_events FROM events "
        "WHERE event_type = 'purchase' GROUP BY user_id"
    ),
}
