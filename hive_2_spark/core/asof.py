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
    direction: str = "backward",
    carry_right_ts: bool = False,
) -> DataFrame:
    """As-of join: for each left row, the nearest right row on the same
    key with right.ts <= left.ts (``backward``, the default) or
    right.ts >= left.ts (``forward``). Left rows are preserved (left
    outer semantics); right-only rows are dropped from the output.

    ``carry_right_ts=True`` additionally emits ``asof_ts`` — the matched
    right timestamp — which callers use for tolerance filters (null out
    matches older than a max gap) without a second join.

    Either direction is the same physical plan: ONE shuffle on the key,
    a single in-partition sort, zero range explosion.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    l_tagged = left.withColumn("__side", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    carry = list(value_cols) + ([right_ts] if carry_right_ts else [])
    r_proj = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in carry],
    )
    for c in left.columns:
        if c != on and c not in r_proj.columns:
            r_proj = r_proj.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tagged.unionByName(r_proj, allowMissingColumns=True)
    # right rows sort BEFORE left rows at equal ts (either direction) so
    # ts-equality matches; forward = the same carry over REVERSED time
    ts_order = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    w = (
        W.partitionBy(on)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned
    for c in carry:
        out_name = "asof_ts" if (carry_right_ts and c == right_ts) else f"asof_{c}"
        carried = carried.withColumn(
            out_name, F.last(f"__r_{c}", ignorenulls=True).over(w)
        )
    return carried.filter(F.col("__side") == 1).drop(
        "__side", "__ts", *[f"__r_{c}" for c in carry]
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


def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each click event: the user's NEXT purchase at-or-after it —
    the attribution direction (click -> eventual conversion)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_id"],
        direction="forward",
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("asof_purchase_id").alias("next_purchase_id"),
    )


def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a 1-hour tolerance: a prior click only counts
    if it happened within the hour (stale matches null out). The matched
    right ts is carried by the SAME window pass — no second join."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
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
        carry_right_ts=True,
    )
    within = (
        F.unix_micros("ts") - F.unix_micros("asof_ts") <= 3600 * 1_000_000
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.when(within, F.col("asof_click_id")).alias("recent_click_id"),
    )


_BIN_US = 3_600_000_000  # 1-hour bins; >= max window duration (54 min)


def join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure interval containment join rewritten as a binned EQUI-join.

    No shared key exists between the sides (maintenance windows x event
    points), so a naive plan is a nested-loop O(N*M). The scale rewrite:
    quantize time into fixed bins no smaller than the longest interval,
    explode each interval to the <=2 bins it covers, bin each point once,
    equi-join on the bin, then apply the exact containment residual.
    Cost becomes one shuffle on the bin key and |intervals| x 2 + |points|
    rows — the plan survives 100x data where the nested loop detonates.

    Windows are derived deterministically from the observed time range
    (every 3rd hour, duration 10 + (i*13) % 45 minutes) so the DuckDB
    oracle — written as the NAIVE inequality join — proves the rewrite
    is semantics-preserving.
    """
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"), F.max("ts").alias("hi")
    )
    hours = bounds.select(
        F.posexplode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("i", "start")
    )
    wins = hours.filter(F.col("i") % 3 == 0).select(
        F.col("i").cast("long").alias("win_id"),
        "start",
        F.expr(
            "timestampadd(MINUTE, 10 + (i * 13) % 45, start)"
        ).alias("fin"),
    )
    wins_binned = wins.select(
        "win_id",
        "start",
        "fin",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros("start") / _BIN_US),
                F.floor(F.unix_micros("fin") / _BIN_US),
            )
        ).alias("bin"),
    )
    pts = e.select(
        "ts", "value", F.floor(F.unix_micros("ts") / _BIN_US).alias("bin")
    )
    return (
        pts.join(wins_binned, on="bin")
        .filter((F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("fin")))
        .groupBy("win_id", F.col("start").alias("win_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of (pandas ``merge_asof(direction='nearest')``):
    each purchase matched to the temporally CLOSEST click either side;
    ties (equal gap) prefer the prior click, then the larger click id.

    One shuffle on the key, two in-partition window passes (forward =
    the same carry over reversed time) — the exchange is reused between
    the two sorts, so nearest costs one extra sort, not a second
    shuffle or a range join.
    """
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("__ts"),
        F.lit(0).alias("__side"),
        F.col("event_id").alias("__r_id"),
    )
    l_tagged = purchases.withColumn("__side", F.lit(1)).withColumn(
        "__ts", F.col("ts")
    )
    u = l_tagged.unionByName(clicks, allowMissingColumns=True)
    # third sort key pins tie order among same-ts clicks: last() then
    # deterministically carries the LARGEST click id (mirrored in SQL)
    wb = (
        W.partitionBy("user_id")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__r_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy(F.col("__ts").desc(), F.col("__side").asc(), F.col("__r_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    click_ts = F.when(F.col("__side") == 0, F.col("__ts"))
    u = (
        u.withColumn("prev_id", F.last("__r_id", ignorenulls=True).over(wb))
        .withColumn("prev_ts", F.last(click_ts, ignorenulls=True).over(wb))
        .withColumn("next_id", F.last("__r_id", ignorenulls=True).over(wf))
        .withColumn("next_ts", F.last(click_ts, ignorenulls=True).over(wf))
    )
    res = u.filter(F.col("__side") == 1)
    prev_gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts"))
    next_gap = F.unix_micros(F.col("next_ts")) - F.unix_micros(F.col("ts"))
    use_prev = F.col("next_id").isNull() | (
        F.col("prev_id").isNotNull() & (prev_gap <= next_gap)
    )
    return res.select(
        "event_id",
        "user_id",
        F.when(use_prev, F.col("prev_id"))
        .otherwise(F.col("next_id"))
        .alias("nearest_click_id"),
        F.when(use_prev, prev_gap)
        .otherwise(next_gap)
        .cast("bigint")
        .alias("gap_us"),
    )


QUERIES = {
    "join_asof": join_asof,
    "join_asof_forward": join_asof_forward,
    "join_asof_tolerance": join_asof_tolerance,
    "join_asof_nearest": join_asof_nearest,
    "join_interval_binned": join_interval_binned,
}

ORACLES = {
    # Deliberately the NAIVE inequality join — proves the binned equi-join
    # rewrite preserves semantics exactly.
    "join_interval_binned": (
        "WITH bounds AS (SELECT date_trunc('hour', MIN(ts)) AS lo, "
        "  MAX(ts) AS hi FROM events), "
        "hours AS (SELECT UNNEST(generate_series("
        "  (SELECT lo FROM bounds), (SELECT hi FROM bounds), "
        "  INTERVAL '1 hour')) AS start), "
        "idx AS (SELECT start, "
        "  CAST(ROW_NUMBER() OVER (ORDER BY start) - 1 AS BIGINT) AS i "
        "  FROM hours), "
        "wins AS (SELECT i AS win_id, start, "
        "  start + to_minutes(10 + (i * 13) % 45) AS fin "
        "  FROM idx WHERE i % 3 = 0) "
        "SELECT w.win_id, w.start AS win_start, COUNT(*) AS n_events, "
        "ROUND(SUM(e.value), 2) AS sum_value "
        "FROM wins w JOIN events e ON e.ts >= w.start AND e.ts <= w.fin "
        "GROUP BY 1, 2"
    ),
    "join_asof": (
        "SELECT p.event_id, p.user_id, p.ts, c.event_id AS prior_click_id "
        "FROM (SELECT event_id, user_id, ts FROM events "
        "      WHERE event_type = 'purchase') p "
        "ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events "
        "      WHERE event_type = 'click') c "
        "ON p.user_id = c.user_id AND p.ts >= c.ts"
    ),
    "join_asof_forward": (
        "SELECT c.event_id, c.user_id, c.ts, p.event_id AS next_purchase_id "
        "FROM (SELECT event_id, user_id, ts FROM events "
        "      WHERE event_type = 'click') c "
        "ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events "
        "      WHERE event_type = 'purchase') p "
        "ON c.user_id = p.user_id AND c.ts <= p.ts"
    ),
    # Correlated LATERAL argmin-|gap| — the semantic spec the one-shuffle
    # two-window rewrite must reproduce, including both tie rules
    # (equal gap -> prior side; equal ts same side -> larger click id).
    "join_asof_nearest": (
        "WITH p AS (SELECT event_id, user_id, ts FROM events "
        "           WHERE event_type = 'purchase'), "
        "c AS (SELECT event_id, user_id, ts FROM events "
        "      WHERE event_type = 'click') "
        "SELECT p.event_id, p.user_id, n.nearest_click_id, n.gap_us "
        "FROM p LEFT JOIN LATERAL ("
        "  SELECT c.event_id AS nearest_click_id, "
        "         CAST(abs(epoch_us(c.ts) - epoch_us(p.ts)) AS BIGINT) "
        "           AS gap_us "
        "  FROM c WHERE c.user_id = p.user_id "
        "  ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)) ASC, "
        "           (CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END) ASC, "
        "           c.event_id DESC "
        "  LIMIT 1) n ON TRUE"
    ),
    "join_asof_tolerance": (
        "SELECT p.event_id, p.user_id, p.ts, "
        "CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000 "
        "     THEN c.event_id END AS recent_click_id "
        "FROM (SELECT event_id, user_id, ts FROM events "
        "      WHERE event_type = 'purchase') p "
        "ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events "
        "      WHERE event_type = 'click') c "
        "ON p.user_id = c.user_id AND p.ts >= c.ts"
    ),
}
