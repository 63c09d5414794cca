"""Window-function operators (SURVEY.md §2B op 38).

Ranking, analytic (lag/lead/first/last/ntile), and frame aggregates
(ROWS / RANGE BETWEEN). Every window ORDER BY includes a unique
tiebreaker so row_number/lag/frames are deterministic across engines.

Scale notes: a window = one shuffle on partitionBy keys + an in-partition
sort. Partition keys here (custkey, mktsegment, suppkey) have enough
cardinality to spread; a window with no partitionBy (global sort) is the
anti-pattern at 100 TB and none is used. Running sums accumulate in frame
order (deterministic left-assoc), so they are bit-exact across engines —
no rounding needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table


def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per market segment."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        # cast to long: DuckDB/ANSI rank functions return BIGINT, Spark INT
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order history: previous/next order price and date gap."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate", 1).over(w)
        ).cast("long").alias("days_since_prev"),
    )


def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (ROWS UNBOUNDED PRECEDING..CURRENT)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum("o_totalprice").over(w).alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value over the full partition frame."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
    )


def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric key: peers within 1000.0 below each price.

    COUNT over the frame (exact) — value-based frames are the one window
    kind where peers are defined by the ORDER BY value, not row position.
    """
    o = load_table(spark, sf_dir, "orders")
    # DataFrame-API rangeBetween only accepts integer offsets; a fractional
    # (double-typed) RANGE frame needs the SQL form.
    return o.selectExpr(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        "COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC "
        "RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS peers_within_1k",
    )


def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the canonical window+filter pattern."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def win_pct_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist: relative-position analytics (exact
    rational arithmetic -> bit-stable across engines)."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


def win_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval RANGE frame: orders in the trailing 30 days per
    customer (time-windowed running count — SQL form, since the
    DataFrame API's rangeBetween is numeric-only)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_wrt_orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               COUNT(*) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
               ) AS n_last_30d
        FROM _wrt_orders
        """
    )


def topk_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL ordering in a top-k: DESC NULLS LAST over a derived
    nullable column, deterministic via unique tiebreaker."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "bonus",
            F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")),
        )
        .orderBy(
            F.col("bonus").desc_nulls_last(), F.col("o_orderkey").asc()
        )
        .select("o_orderkey", "bonus")
        .limit(30)
    )


def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS analytics over a sparse column: forward-fill via
    running ``last(x) IGNORE NULLS`` (the canonical gap-fill), plus
    first/nth non-null over the full frame. The sparse column is derived
    (price only for finished orders) since testdata has no NULLs."""
    o = load_table(spark, sf_dir, "orders")
    x = F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
    run = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    full = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.last(x, ignorenulls=True).over(run).alias("ffill_price"),
        F.first(x, ignorenulls=True).over(full).alias("first_f_price"),
        F.nth_value(x, 2, ignoreNulls=True).over(full).alias("second_f_price"),
    )


def win_distinct_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling DISTINCT count over a trailing 10-row frame.

    Spark has no COUNT(DISTINCT) OVER; the idiomatic rewrite is
    size(collect_set() OVER frame) — set state is bounded by the frame
    (10 rows), so memory stays O(frame) per partition at any scale.
    Oracle: DuckDB's native COUNT(DISTINCT ...) OVER the same frame.
    """
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-9, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        # cast to long: size() is INT in Spark, COUNT is BIGINT in DuckDB
        F.size(F.collect_set("o_orderstatus").over(w))
        .cast("long")
        .alias("distinct_status_10"),
    )


def win_median_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact MEDIAN over a trailing 10-row frame.

    Spark has no MEDIAN() OVER; the bounded-frame rewrite is
    sort_array(collect_list() OVER frame) + middle element(s) — state
    is O(frame) per row like the rolling-distinct op, and the
    even-count interpolation (mean of the two middles) matches
    DuckDB's windowed MEDIAN exactly. An UNBOUNDED frame would be the
    anti-pattern (per-row state grows with the partition); bounded
    frames are the contract.
    """
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-9, W.currentRow)
    )
    s = F.sort_array(F.collect_list("o_totalprice").over(w))
    n = F.size(s)
    lo = F.element_at(s, ((n + 1) / 2).cast("int"))
    hi = F.element_at(s, ((n + 2) / 2).cast("int"))
    # floor(x*100+0.5)/100, not ROUND: the interpolated midpoint lands
    # on exact half-cents, where Spark's and DuckDB's ROUND disagree;
    # this form is the same IEEE ops on both engines.
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        (F.floor((lo + hi) / 2.0 * 100 + F.lit(0.5)) / F.lit(100.0)).alias(
            "median_price_10"
        ),
    )


def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance-quartile per customer within market segment (NTILE).

    The equal-height-bucket assignment behind cohorting and tiered
    pricing. NTILE needs a total order per partition: ties on acctbal
    break on custkey, so bucket membership is deterministic across
    engines and partial reruns. One segment-keyed exchange + in-
    partition sort, same cost envelope as every other window here.
    """
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


def win_global_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL running total over all orders — without the naive plan's
    single-partition window.

    ``SUM() OVER (ORDER BY ...)`` with no PARTITION BY forces Spark to
    move the whole table into ONE partition — the classic global-cumsum
    bottleneck (fine at 15k rows, fatal at 100 TB). Two-phase instead,
    with a DATA-DERIVED range id (calendar month of the sort key):

    1. per-month local cumsum — windows PARTITIONED by month run in
       parallel across the cluster;
    2. per-month totals (calendar-sized: one row per month, ~84 for
       TPC-H's 7 years) get EXCLUSIVE prefix offsets via a window over
       that tiny table — its single-partition sort is bounded by the
       calendar, never by the data;
    3. broadcast-join offsets back: global running = local + offset.

    The range id must come from the DATA, not the partitioner:
    ``repartitionByRange`` + ``spark_partition_id`` re-samples
    boundaries per job, so two actions over the same plan can disagree
    on row->partition assignment (measured: ~0.5%% value drift). A
    month id is reproducible everywhere; for keys with no natural
    bucketing column, materialize the range stage (persist/
    localCheckpoint) before branching.

    Money math in DECIMAL end-to-end: two-phase regrouping of doubles
    would drift in the last ULP vs the oracle's sequential fold;
    decimal addition is associative, so the hash match is exact by
    construction. The final value is emitted as double (exact — two
    decimals, far below 2^53).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("bid"),
    )
    wloc = (
        W.partitionBy("bid")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = o.withColumn("local", F.sum("price").over(wloc))
    totals = o.groupBy("bid").agg(F.sum("price").alias("bsum"))
    woff = (
        W.orderBy(F.col("bid").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offs = totals.select(
        "bid", F.coalesce(F.sum("bsum").over(woff), F.lit(0)).alias("off")
    )
    return (
        local.join(F.broadcast(offs), "bid")
        .select(
            "o_orderkey",
            (F.col("local") + F.col("off"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("running_total"),
        )
    )


def win_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL row_number over all orders by (price, key) — the ranking
    twin of `win_global_cumsum`, again without the single-partition
    window the naive ``ROW_NUMBER() OVER (ORDER BY ...)`` plan needs.

    Range id = floor(price / 1000) — domain-bounded (~600 bands at
    TPC-H prices), data-derived, reproducible. Phase 1: per-band local
    row_number (parallel windows). Phase 2: per-band counts get
    EXCLUSIVE prefix sums over the band table (bounded by the price
    DOMAIN, not the data). Phase 3: broadcast-join the offsets back;
    global rank = offset + local rank. Pure integer math — no float
    boundary can flip a rank; the (price, o_orderkey) order is total."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.floor(F.col("o_totalprice") / 1000.0).cast("bigint").alias("bid"),
    )
    wloc = W.partitionBy("bid").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    local = o.withColumn("local_rn", F.row_number().over(wloc))
    counts = o.groupBy("bid").agg(F.count(F.lit(1)).alias("n"))
    woff = W.orderBy(F.col("bid").asc()).rowsBetween(W.unboundedPreceding, -1)
    offs = counts.select(
        "bid",
        F.coalesce(F.sum("n").over(woff), F.lit(0)).cast("bigint").alias("off"),
    )
    return (
        local.join(F.broadcast(offs), "bid")
        .select(
            "o_orderkey",
            "o_totalprice",
            (F.col("off") + F.col("local_rn")).cast("bigint").alias("global_rn"),
        )
    )


QUERIES = {
    "win_ntile": win_ntile,
    "win_median_rolling": win_median_rolling,
    "win_ignore_nulls": win_ignore_nulls,
    "win_range_time": win_range_time,
    "topk_nulls_last": topk_nulls_last,
    "win_pct_rank": win_pct_rank,
    "win_rank": win_rank,
    "win_lag_lead": win_lag_lead,
    "win_running_sum": win_running_sum,
    "win_first_last": win_first_last,
    "win_range_frame": win_range_frame,
    "win_topk_per_group": win_topk_per_group,
    "win_distinct_rolling": win_distinct_rolling,
    "win_global_cumsum": win_global_cumsum,
    "win_global_rank": win_global_rank,
}

_W_RANK = (
    "OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)"
)
_W_CUST = "PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC"

_W_PCT = (
    "OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)"
)

ORACLES = {
    # NOT native MEDIAN() OVER: its even-count midpoint differs in the
    # last ulp, flipping ROUND at exact half-cent boundaries. The list
    # replay makes the arithmetic identical to the Spark side. FLOOR
    # before CAST: DuckDB's double->INT cast ROUNDS, Spark's truncates.
    "win_median_rolling": (
        "SELECT o_orderkey, o_orderpriority, "
        "FLOOR((s[CAST(FLOOR((len(s)+1)/2) AS INT)] + "
        "s[CAST(FLOOR((len(s)+2)/2) AS INT)]) / 2.0 * 100 + 0.5) / 100.0 "
        "AS median_price_10 "
        "FROM (SELECT o_orderkey, o_orderpriority, "
        "  list_sort(list(o_totalprice) OVER (PARTITION BY o_orderpriority "
        "    ORDER BY o_orderdate ASC, o_orderkey ASC "
        "    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)) AS s "
        "  FROM orders)"
    ),
    "win_ntile": (
        "SELECT c_custkey, c_mktsegment, c_acctbal, "
        "CAST(NTILE(4) OVER (PARTITION BY c_mktsegment "
        "ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS quartile "
        "FROM customer"
    ),
    "win_ignore_nulls": (
        "SELECT o_custkey, o_orderkey, "
        "LAST_VALUE(x IGNORE NULLS) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "CURRENT ROW) AS ffill_price, "
        "FIRST_VALUE(x IGNORE NULLS) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "UNBOUNDED FOLLOWING) AS first_f_price, "
        "NTH_VALUE(x, 2 IGNORE NULLS) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "UNBOUNDED FOLLOWING) AS second_f_price "
        "FROM (SELECT *, CASE WHEN o_orderstatus = 'F' "
        "THEN o_totalprice END AS x FROM orders)"
    ),
    "win_range_time": (
        "SELECT o_custkey, o_orderkey, "
        "COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate "
        "RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) "
        "AS n_last_30d FROM orders"
    ),
    "topk_nulls_last": (
        "SELECT o_orderkey, "
        "CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS bonus "
        "FROM orders "
        "ORDER BY bonus DESC NULLS LAST, o_orderkey ASC LIMIT 30"
    ),
    "win_pct_rank": (
        "SELECT c_custkey, c_mktsegment, "
        f"PERCENT_RANK() {_W_PCT} AS pct_rank, "
        f"CUME_DIST() {_W_PCT} AS cume "
        "FROM customer"
    ),
    "win_rank": (
        "SELECT c_custkey, c_mktsegment, c_acctbal, "
        f"ROW_NUMBER() {_W_RANK} AS rn, RANK() {_W_RANK} AS rnk, "
        f"DENSE_RANK() {_W_RANK} AS drnk, NTILE(4) {_W_RANK} AS quartile "
        "FROM customer"
    ),
    "win_lag_lead": (
        "SELECT o_custkey, o_orderkey, o_totalprice, "
        f"LAG(o_totalprice, 1) OVER ({_W_CUST}) AS prev_price, "
        f"LEAD(o_totalprice, 1) OVER ({_W_CUST}) AS next_price, "
        f"CAST(DATEDIFF('day', LAG(o_orderdate, 1) OVER ({_W_CUST}), o_orderdate) "
        "AS BIGINT) AS days_since_prev "
        "FROM orders"
    ),
    "win_running_sum": (
        "SELECT o_custkey, o_orderkey, "
        f"SUM(o_totalprice) OVER ({_W_CUST} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_spend, "
        f"COUNT(*) OVER ({_W_CUST} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n "
        "FROM orders"
    ),
    "win_first_last": (
        "SELECT o_custkey, o_orderkey, "
        f"FIRST_VALUE(o_totalprice) OVER ({_W_CUST} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_price, "
        f"LAST_VALUE(o_totalprice) OVER ({_W_CUST} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price "
        "FROM orders"
    ),
    "win_range_frame": (
        "SELECT o_orderkey, o_orderstatus, o_totalprice, "
        "COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC "
        "RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS peers_within_1k "
        "FROM orders"
    ),
    "win_topk_per_group": (
        "SELECT o_custkey, o_orderkey, o_totalprice, rn FROM ("
        "SELECT o_custkey, o_orderkey, o_totalprice, "
        "ROW_NUMBER() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders) t "
        "WHERE rn <= 3"
    ),
    "win_distinct_rolling": (
        "SELECT o_orderkey, o_orderpriority, "
        "COUNT(DISTINCT o_orderstatus) OVER (PARTITION BY o_orderpriority "
        "ORDER BY o_orderdate ASC, o_orderkey ASC "
        "ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS distinct_status_10 "
        "FROM orders"
    ),
    # The oracle IS the naive single-sequence formulation the two-phase
    # plan must equal; DECIMAL on both sides makes regrouping exact.
    "win_global_rank": (
        "SELECT o_orderkey, o_totalprice, "
        "CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) "
        "AS BIGINT) AS global_rn FROM orders"
    ),
    "win_global_cumsum": (
        "SELECT o_orderkey, "
        "CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER ("
        "ORDER BY o_orderdate ASC, o_orderkey ASC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "AS DECIMAL(18,2)) AS DOUBLE) AS running_total "
        "FROM orders"
    ),
}
