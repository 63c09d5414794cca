"""As-of join — an operator Spark lacks natively (SURVEY.md §4 custom-op
candidate; guide: "As-of / range join" pattern).

Implemented as a composition of built-in ops (preference order (a) from
the build brief): union the two sides, window per key ordered by event
time, and carry the last non-null right-side value forward. This is the
scale-correct plan: ONE shuffle on the key (same as any join), no range
explosion, no per-group Python.

    left ASOF JOIN right ON left.k = right.k AND left.ts >= right.ts

Oracle: DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    right.ts <= left.ts on the same key. Left rows are preserved (left
    outer semantics); right-only rows are dropped from the output."""
    l_tagged = left.withColumn("__side", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    r_proj = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    for c in left.columns:
        if c != on and c not in r_proj.columns:
            r_proj = r_proj.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tagged.unionByName(r_proj, allowMissingColumns=True)
    # right rows sort BEFORE left rows at equal ts so ts-equality matches
    w = (
        W.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned
    for c in value_cols:
        carried = carried.withColumn(
            f"asof_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w)
        )
    return carried.filter(F.col("__side") == 1).drop(
        "__side", "__ts", *[f"__r_{c}" for c in value_cols]
    )


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event: the user's most recent prior click."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["click_id"],
    )
    return out.select(
        "event_id", "user_id", "ts", F.col("asof_click_id").alias("prior_click_id")
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
) -> DataFrame:
    """Alternative implementation: per-key ``pd.merge_asof`` via
    applyInPandas (preference path (b) — used when the carried state per
    key is too wide for the window form). Cogroup keeps each key's rows
    in one Arrow batch; the shuffle is identical to the window form's."""
    import pandas as pd

    out_schema = ", ".join(
        f"{c} {t}" for c, t in left.dtypes
    ) + f", asof_{value_col} long"

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(left_ts)
        rpdf = (
            rpdf[[right_ts, value_col]]
            .sort_values(right_ts)
            .rename(columns={value_col: f"asof_{value_col}"})
        )
        if rpdf.empty:
            lpdf[f"asof_{value_col}"] = pd.NA
            return lpdf
        return pd.merge_asof(
            lpdf, rpdf, left_on=left_ts, right_on=right_ts, direction="backward"
        )

    return left.groupBy(on).cogroup(right.groupBy(on)).applyInPandas(
        lambda l, r: merge(l, r), schema=out_schema
    )


QUERIES = {"join_asof": join_asof}

ORACLES = {
    "join_asof": (
        "SELECT p.event_id, p.user_id, p.ts, c.event_id AS prior_click_id "
        "FROM (SELECT event_id, user_id, ts FROM events "
        "      WHERE event_type = 'purchase') p "
        "ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events "
        "      WHERE event_type = 'click') c "
        "ON p.user_id = c.user_id AND p.ts >= c.ts"
    ),
}
