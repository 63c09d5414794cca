"""Join operators (SURVEY.md §2A ops 12-15, §2B op 37).

Reference parity (citations into /root/reference/):
- to-one lookup join (BelongsTo/HasOne): classes/hive/relation/belongsto.php:13-36,
  classes/hive/relation/hasone.php:13-36 → broadcast hash join on the key.
- to-many inner equi-join (HasMany): classes/hive/relation/hasmany.php:15-57
  (JOIN at :32, on-clause :34-41, parent conditions :44).
- M:N two-hop join through a pivot: classes/hive/relation/manytomany.php:56-96.
- pivot-side key fetch: classes/hive/relation/manytomany.php:20-54.
The reference has only inner equi-joins; outer/semi/anti/range come from the
driver-mandated Layer B (BASELINE.json north_star).

Scale notes:
- Dimension sides (region/nation/customer at TPC-H ratios) are broadcast —
  no shuffle of the fact table. At 100 TB the fact side never moves for
  these joins; only genuinely large-large joins (lineitem x orders) shuffle,
  and AQE handles skew splitting.
- Semi/anti joins never duplicate fact rows and short-circuit per key.
- The range join pins the equi-key first so the residual range predicate
  evaluates within the hash-match, not as a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table


# ------------------------------------------------ op 15: to-one lookup join
def join_lookup_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BelongsTo: each order resolves its parent customer (broadcast)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_custkey", "c_name", "c_mktsegment"
    )


# ------------------------------------------------- op 12: has-many equi-join
def join_has_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HasMany: child SELECT + JOIN parent + parent's WHERE conditions."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


# ------------------------------------- op 13: many-to-many through a pivot
def join_many_to_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M:N: suppliers <-> parts through the lineitem pivot (distinct pairs)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    pairs = li.select("l_suppkey", "l_partkey").distinct()
    return (
        pairs.join(F.broadcast(s), pairs.l_suppkey == s.s_suppkey, "inner")
        .join(F.broadcast(p), pairs.l_partkey == p.p_partkey, "inner")
        .select("s_suppkey", "s_name", "p_partkey", "p_name")
    )


# --------------------------------------------- op 14: pivot-side key fetch
def pivot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT fk AS id FROM pivot WHERE pk = ?`` — typed id list."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_suppkey") == 1)
        .select(F.col("l_partkey").alias("id"))
        .distinct()
    )


# ----------------------------------------------------- op 37: outer joins
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer: every customer, order columns NULL when childless."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000.0
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer on deliberately partial key sets (both sides filtered)."""
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 15)
    c_nat = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .filter(F.col("c_nationkey") >= 5)
    )
    return n.join(c_nat, n.n_nationkey == c_nat.c_nationkey, "full").select(
        "n_nationkey", "n_name", "c_nationkey", "n_customers"
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi: suppliers that shipped at least one high-quantity line."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48.0)
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti (NOT EXISTS): customers with no URGENT order in 1998.

    The probe side is date/priority-filtered so the survivor set is
    non-empty at every sf (every customer has *some* order in the driver
    data, so anti-joining all orders returns 0 rows — a vacuous check).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key + range residual: lines shipped >60 days after order date.

    The equi key keeps this a hash join; the range predicate is a residual
    filter inside the match — never a cross product. (A pure range/as-of
    join without an equi key would be pre-bucketized at scale.)
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.date_add(o.o_orderdate, 60)
    )
    return li.join(o, cond, "inner").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate"
    )


def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping out. Derived NULLable keys on
    both sides (priority URGENT -> NULL) exercise the semantics."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.nullif("o_orderpriority", F.lit("1-URGENT")).alias("prio_key"),
    )
    pri = (
        load_table(spark, sf_dir, "orders")
        .select(F.nullif("o_orderpriority", F.lit("1-URGENT")).alias("prio_key"))
        .distinct()
        .withColumn("prio_rank", F.length(F.coalesce(F.col("prio_key"), F.lit(""))))
    )
    return o.join(
        F.broadcast(pri), o.prio_key.eqNullSafe(pri.prio_key), "inner"
    ).select("o_orderkey", o.prio_key.alias("prio_key"), "prio_rank")


# ------------------------------------------- bloom-filter join pruning
_BLOOM_K = 3  # hash probes per key
_BLOOM_BITS_PER_KEY = 16  # ~0.1% fpp at k=3


def _bloom_pos(col, i: int, m_bits: int):
    """Bit position of hash probe ``i`` — MUST be expression-identical on
    the build and probe sides (seed literal type included)."""
    return F.pmod(F.xxhash64(F.lit(i), col), F.lit(m_bits))


def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning: monthly order volume for one segment,
    with the fact scan pruned by a Bloom filter over the filtered dim's
    keys BEFORE the join shuffle.

    The at-100-TB shape for selective dim filters when the dim is too
    big to broadcast whole: ship an m-bit filter (16 bits/key, k=3 →
    ~0.1% false positives) instead of the key set, drop non-matching
    fact rows at the scan, and let the real join remove the few false
    positives — so the result is EXACT (the oracle is the plain join)
    while the shuffle carries ~segment-fraction of the fact table.
    Spark's own runtime row-group bloom pruning inspires the shape; this
    is the explicit, engine-independent version.

    Build is fully distributed: key → k bit positions (explode), bit_or
    of 64-bit words, dense array<long> assembled via map lookup — the
    only driver-side value is the key COUNT that sizes m. The 1-row
    filter frame broadcast is the scalar-subquery shape (CARTESIAN_OK).
    """
    dim = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    keys = dim.select(F.col("c_custkey").alias("k"))
    n_keys = max(1, keys.count())  # scalar action: sizes the filter only
    m_words = (n_keys * _BLOOM_BITS_PER_KEY + 63) // 64
    m_bits = m_words * 64

    entries = keys.select(
        F.explode(
            F.array(
                *[_bloom_pos(F.col("k"), i, m_bits) for i in range(_BLOOM_K)]
            )
        ).alias("p")
    ).select(
        (F.col("p") / 64).cast("long").alias("w"),
        F.expr("shiftleft(1L, cast(p % 64 AS INT))").alias("m"),
    )
    bloom = (
        entries.groupBy("w")
        .agg(F.bit_or("m").alias("mask"))
        .groupBy()
        .agg(
            F.map_from_entries(F.collect_list(F.struct("w", "mask"))).alias(
                "wm"
            )
        )
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(m_words - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("wm"), i.cast("long")),
                    F.lit(0).cast("long"),
                ),
            ).alias("bloom_bits")
        )
    )

    o = load_table(spark, sf_dir, "orders")
    probed = o.crossJoin(F.broadcast(bloom))
    for i in range(_BLOOM_K):
        probed = probed.withColumn(
            f"p{i}", _bloom_pos(F.col("o_custkey"), i, m_bits)
        )
    hit = [
        F.expr(
            f"(element_at(bloom_bits, cast(p{i} / 64 AS INT) + 1) & "
            f"shiftleft(1L, cast(p{i} % 64 AS INT))) <> 0"
        )
        for i in range(_BLOOM_K)
    ]
    pruned = probed.filter(hit[0] & hit[1] & hit[2]).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    # the real join erases bloom false positives — result is exact
    return (
        pruned.join(dim.select("c_custkey"), pruned.o_custkey == F.col("c_custkey"))
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


QUERIES = {
    "join_null_safe": join_null_safe,
    "join_bloom_pruned": join_bloom_pruned,
    "join_lookup_one": join_lookup_one,
    "join_has_many": join_has_many,
    "join_many_to_many": join_many_to_many,
    "pivot_keys": pivot_keys,
    "join_outer": join_outer,
    "join_full_outer": join_full_outer,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_range": join_range,
}

ORACLES = {
    # the plain join IS the oracle: a hash-match proves the bloom prune
    # dropped no true match and the join erased every false positive
    "join_bloom_pruned": (
        "SELECT strftime(o_orderdate, '%Y-%m') AS month, "
        "COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS revenue "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "WHERE c_mktsegment = 'BUILDING' GROUP BY 1"
    ),
    "join_null_safe": (
        "WITH o AS (SELECT o_orderkey, NULLIF(o_orderpriority, '1-URGENT') "
        "  AS prio_key FROM orders), "
        "pri AS (SELECT prio_key, CAST(LENGTH(COALESCE(prio_key, '')) AS INT) "
        "  AS prio_rank FROM (SELECT DISTINCT NULLIF(o_orderpriority, "
        "  '1-URGENT') AS prio_key FROM orders)) "
        "SELECT o.o_orderkey, o.prio_key, pri.prio_rank FROM o JOIN pri "
        "ON o.prio_key IS NOT DISTINCT FROM pri.prio_key"
    ),
    "join_lookup_one": (
        "SELECT o_orderkey, o_custkey, c_name, c_mktsegment "
        "FROM orders JOIN customer ON o_custkey = c_custkey"
    ),
    "join_has_many": (
        "SELECT c_custkey, c_name, o_orderkey, o_totalprice "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "WHERE c_mktsegment = 'BUILDING'"
    ),
    "join_many_to_many": (
        "SELECT s_suppkey, s_name, p_partkey, p_name FROM "
        "(SELECT DISTINCT l_suppkey, l_partkey FROM lineitem) pairs "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN part ON l_partkey = p_partkey"
    ),
    "pivot_keys": (
        "SELECT DISTINCT l_partkey AS id FROM lineitem WHERE l_suppkey = 1"
    ),
    "join_outer": (
        "SELECT c_custkey, c_name, o_orderkey, o_totalprice FROM customer "
        "LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) o "
        "ON c_custkey = o.o_custkey"
    ),
    "join_full_outer": (
        "SELECT n_nationkey, n_name, c_nationkey, n_customers FROM "
        "(SELECT * FROM nation WHERE n_nationkey < 15) n FULL OUTER JOIN "
        "(SELECT c_nationkey, COUNT(*) AS n_customers FROM customer "
        " GROUP BY c_nationkey HAVING c_nationkey >= 5) c "
        "ON n_nationkey = c_nationkey"
    ),
    "join_semi": (
        "SELECT s_suppkey, s_name FROM supplier WHERE EXISTS ("
        "SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity >= 48.0)"
    ),
    "join_anti": (
        "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS ("
        "SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "AND o_orderpriority = '1-URGENT' "
        "AND o_orderdate >= TIMESTAMP '1998-01-01')"
    ),
    "join_range": (
        "SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "AND l_shipdate > o_orderdate + INTERVAL 60 DAY"
    ),
}
