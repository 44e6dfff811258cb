"""Relational query surface over the star schema (SURVEY.md §2.10).

The reference implements none of these (SURVEY §2.10 documents the
absence); our engine exposes them through Spark SQL/DataFrame plans and
this module locks their semantics with DuckDB oracles.

Scale notes (100 TB design):
* every dimension join broadcasts the small side explicitly;
* aggregations are expressed declaratively -> Catalyst does partial
  (map-side) aggregation before the shuffle;
* money sums use DECIMAL accumulation (exact => order-independent =>
  also safe under AQE partition coalescing);
* top-k uses window row_number with a deterministic tiebreak, which
  Spark executes as a partial top-k per partition before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import money_sum, safe_avg
from ..sources.tables import load_table
from . import register

# ---------------------------------------------------------------------------
# Aggregations (hash agg, partial+final — SURVEY §2.10 "Aggregations")


@register(
    "q01_pricing_summary",
    """
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity), 4) AS avg_qty,
      ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_discount), 4) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: multi-measure hash aggregation.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money_sum("l_quantity").alias("sum_qty"),
        money_sum("l_extendedprice").alias("sum_base_price"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
        )
        .cast("double")
        .alias("sum_disc_price"),
        safe_avg("l_quantity").alias("avg_qty"),
        safe_avg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# NOTE: the former q02_orders_by_priority (group-agg with min/max and
# the HLL accuracy claim) was retired in the round-6 50-slot swap that
# admitted o11_dv_masked_read: its exact-aggregation surface is covered
# by q01/q04/e10 and its approx_count_distinct claim moved into q14.


# ---------------------------------------------------------------------------
# Joins (broadcast dims; SURVEY §2.10 "Joins")


@register(
    "q03_revenue_by_nation",
    """
    SELECT
      n_name,
      r_name,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
    doc="TPC-H Q5-style 5-way star join; dims broadcast, facts shuffle once.",
)
def q03_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # customer/nation/region are dimension-sized at any SF -> broadcast all
    # three; the lineitem⋈orders join is the only real shuffle.
    dim = F.broadcast(
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
            F.broadcast(r), n.n_regionkey == r.r_regionkey
        )
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dim, o.o_custkey == dim.c_custkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q04_customer_order_counts",
    """
    SELECT
      c_custkey,
      c_mktsegment,
      COUNT(o_orderkey) AS n_orders,
      CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
    doc="Left outer join preserving customers with no orders.",
)
def q04_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count(F.col("o_orderkey")).alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0).cast("decimal(18,2)")
            )
            .cast("double")
            .alias("total_spent"),
        )
    )


# NOTE: the former q05 (customer ANTI JOIN orders) was folded out of the
# registered surface in round 2 to fit the driver's 50-slot correctness
# window: the left anti-join operator keeps a green hard signal through
# o05_recovery_orphans (the reference's actual anti-join use, reconciler
# T1), which runs the same Spark join type.


@register(
    "q06_parts_with_lineitems",
    """
    SELECT p_brand, COUNT(*) AS n_parts
    FROM part
    SEMI JOIN lineitem ON p_partkey = l_partkey
    GROUP BY p_brand
    """,
    doc="Left semi-join (existence test) + aggregation.",
)
def q06_parts_with_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


@register(
    "q07_supplier_customer_nations",
    """
    SELECT
      n_name,
      COALESCE(cu.cnt, 0) AS n_customers,
      COALESCE(su.cnt, 0) AS n_suppliers
    FROM nation
    LEFT JOIN (SELECT c_nationkey, COUNT(*) AS cnt FROM customer GROUP BY c_nationkey) cu
      ON n_nationkey = cu.c_nationkey
    LEFT JOIN (SELECT s_nationkey, COUNT(*) AS cnt FROM supplier GROUP BY s_nationkey) su
      ON n_nationkey = su.s_nationkey
    """,
    doc="Aggregate-then-join (pre-aggregation pushed below the join).",
)
def q07_supplier_customer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    cu = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cu_cnt"))
    )
    su = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("su_cnt"))
    )
    return (
        n.join(cu, n.n_nationkey == cu.c_nationkey, "left")
        .join(su, n.n_nationkey == su.s_nationkey, "left")
        .select(
            "n_name",
            F.coalesce("cu_cnt", F.lit(0)).alias("n_customers"),
            F.coalesce("su_cnt", F.lit(0)).alias("n_suppliers"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions / top-k (SURVEY §2.10 "Window", "Sorts/limit/top-k")


@register(
    "q08_top_orders_per_priority",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rk
    FROM (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC
             ) AS rk
      FROM orders
    )
    WHERE rk <= 3
    """,
    doc="Per-group top-k via ranked window; Spark plans a partial top-k "
    "per partition before the shuffle (WindowGroupLimit).",
)
def q08_top_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rk")
    )


@register(
    "q09_top10_filtered_lineitems",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 10
    """,
    doc="Selective scan + global top-k in one plan (merged q09+q16): the "
    "TPC-H Q6-style predicates and 4-column projection push down to the "
    "parquet reader (PushedFilters + ReadSchema), and the ordered limit "
    "plans as TakeOrderedAndProject (per-partition partial top-k, no "
    "full sort).",
)
def q09_top10_filtered_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            # plain string literals: Spark coerces them to the COLUMN's
            # timestamp type (NTZ or LTZ), so the wall-clock comparison is
            # session-tz-independent either way, and pushdown is kept
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .limit(10)
    )


@register(
    "q10_orders_vs_priority_avg",
    """
    SELECT o_orderkey, o_orderpriority,
           ROUND(o_totalprice - avg_price, 2) AS delta_from_avg
    FROM (
      SELECT *,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_orderpriority) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY o_orderpriority) AS avg_price
      FROM orders
    )
    WHERE o_totalprice > avg_price
    """,
    doc="Unbounded analytic window (per-group average) + filter — "
    "decorrelated form of a correlated subquery.",
)
def q10_orders_vs_priority_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    # exact decimal window-sum / count => order-independent average
    avg_price = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast(
        "double"
    ) / F.count(F.lit(1)).over(w)
    return (
        o.withColumn("avg_price", avg_price)
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.col("o_totalprice") - F.col("avg_price"), 2).alias("delta_from_avg"),
        )
    )


# ---------------------------------------------------------------------------
# Rollup / grouping sets / distinct / set ops


@register(
    "q11_rollup_cube",
    """
    SELECT 'rollup' AS family,
      COALESCE(l_returnflag, 'ALL') AS key1,
      COALESCE(l_linestatus, 'ALL') AS key2,
      COUNT(*) AS n_rows,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube' AS family,
      COALESCE(CAST(c_nationkey AS VARCHAR), 'ALL') AS key1,
      COALESCE(c_mktsegment, 'ALL') AS key2,
      COUNT(*) AS n_rows,
      CAST(NULL AS DOUBLE) AS sum_qty
    FROM customer
    GROUP BY CUBE (c_nationkey, c_mktsegment)
    """,
    doc="Grouping-sets surface (merged q11+q12): ROLLUP hierarchy totals "
    "over lineitem unioned with a two-dimension CUBE over customer, "
    "tagged by family.",
)
def q11_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rollup = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), money_sum("l_quantity").alias("sum_qty"))
        .select(
            F.lit("rollup").alias("family"),
            F.coalesce("l_returnflag", F.lit("ALL")).alias("key1"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("key2"),
            "n_rows",
            "sum_qty",
        )
    )
    c = load_table(spark, sf_dir, "customer")
    cube = (
        c.cube("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.lit("cube").alias("family"),
            F.coalesce(F.col("c_nationkey").cast("string"), F.lit("ALL")).alias("key1"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("key2"),
            "n_rows",
            F.lit(None).cast("double").alias("sum_qty"),
        )
    )
    return rollup.unionByName(cube)


@register(
    "q13_set_ops_nation_keys",
    """
    WITH cu AS (SELECT DISTINCT c_nationkey AS k FROM customer),
         su AS (SELECT DISTINCT s_nationkey AS k FROM supplier)
    SELECT
      (SELECT COUNT(*) FROM (SELECT k FROM cu UNION SELECT k FROM su)) AS n_union,
      (SELECT COUNT(*) FROM (SELECT k FROM cu INTERSECT SELECT k FROM su)) AS n_intersect,
      (SELECT COUNT(*) FROM (SELECT k FROM cu EXCEPT SELECT k FROM su)) AS n_cust_only
    """,
    doc="UNION / INTERSECT / EXCEPT counts (reference T2 union, T1 "
    "except-as-anti-join) computed in ONE distributed plan: full-outer "
    "join of the two distinct key sets, then conditional counts — no "
    "driver-side actions (the r1 version ran three separate .count() "
    "jobs).",
)
def q13_set_ops_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("k"))
        .distinct()
        .withColumn("in_cu", F.lit(1))
    )
    su = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("k"))
        .distinct()
        .withColumn("in_su", F.lit(1))
    )
    both = cu.join(su, "k", "full_outer")
    return both.agg(
        F.count(F.lit(1)).alias("n_union"),
        F.count(F.when(F.col("in_cu").isNotNull() & F.col("in_su").isNotNull(), 1)).alias(
            "n_intersect"
        ),
        F.count(F.when(F.col("in_cu").isNotNull() & F.col("in_su").isNull(), 1)).alias(
            "n_cust_only"
        ),
    )


@register(
    "q14_distinct_segments",
    """
    SELECT
      c_mktsegment,
      COUNT(DISTINCT c_custkey) AS n_customers,
      TRUE AS approx_distinct_ok
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc="DISTINCT (reference T3/T5 dedup-set analog) + the "
    "approx_count_distinct (HyperLogLog++) accuracy claim absorbed from "
    "the retired q02: the sketch estimate must land within 5% of the "
    "exact distinct count per group. HLL sketches differ across "
    "engines, so the CLAIM (a boolean) is the portable, hash-checkable "
    "output — DuckDB computes the exact count and asserts TRUE. This is "
    "the 100 TB cardinality path where exact distinct shuffles every "
    "key.",
)
def q14_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    exact = F.count_distinct(F.col("c_custkey"))
    approx = F.approx_count_distinct("c_custkey", 0.02)
    return c.groupBy("c_mktsegment").agg(
        exact.alias("n_customers"),
        (
            F.abs(approx.cast("double") - exact.cast("double")) / exact.cast("double")
            <= F.lit(0.05)
        ).alias("approx_distinct_ok"),
    )


# ---------------------------------------------------------------------------
# Scalar function surface (string/date/math — SURVEY §2.10)


@register(
    "q15_scalar_functions",
    """
    SELECT
      o_orderkey,
      lower(to_hex(o_orderkey)) AS key_hex,
      strftime(o_orderdate, '%Y-%m') AS order_month,
      CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_bucket,
      ROUND(ABS(SIN(o_orderkey)) , 6) AS sin_key,
      o_orderkey % 7 AS key_mod,
      length(o_orderpriority) AS prio_len,
      upper(substring(o_orderpriority, 1, 3)) AS prio_prefix,
      concat(o_orderstatus, '-', o_orderpriority) AS status_prio
    FROM orders
    """,
    doc="Scalar string/date/math functions incl. hex encoding (reference P2 "
    "hex IDs traces.go:293-299, R3 date-format paths partition.go:139-185, "
    "R1 epoch bucketing partition.go:48).",
)
def q15_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.lower(F.hex(F.col("o_orderkey"))).alias("key_hex"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("price_bucket"),
        F.round(F.abs(F.sin(F.col("o_orderkey"))), 6).alias("sin_key"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
        F.length("o_orderpriority").alias("prio_len"),
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("prio_prefix"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
    )


# NOTE: the former q16 pushdown scan merged into q09 (same predicates +
# TakeOrderedAndProject) in round 2 — one slot, both operator checks.


@register(
    "q17_percentiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
           ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact continuous percentiles (median/p95) per group — Spark "
    "percentile() and DuckDB quantile_cont share linear interpolation.",
)
def q17_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("p95_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# NOTE: the former q18 approx-distinct merged into q02 (as the portable
# accuracy-claim boolean), and the former q20 uncorrelated scalar
# subquery merged into q19 — round-2 50-slot consolidation.


@register(
    "q19_subqueries",
    """
    SELECT l_partkey, COUNT(*) AS n_above,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / (SELECT COUNT(*) FROM lineitem), 6) AS share_of_all
    FROM lineitem l1
    WHERE l_quantity > 2 * (SELECT MIN(l2.l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = l1.l_partkey)
    GROUP BY l_partkey
    """,
    doc="Subquery surface (merged q19+q20): a correlated scalar subquery "
    "(TPC-H Q17 shape — lineitems above 2x their part's minimum "
    "quantity; Catalyst decorrelates it into an aggregate + self-join) "
    "plus an uncorrelated scalar subquery (share of the global count, "
    "planned as a broadcast of the 1-row subquery result). MIN keeps "
    "the threshold float-exact across engines.",
)
def q19_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem_q19")
    return spark.sql(
        """
        SELECT l_partkey, COUNT(*) AS n_above,
               ROUND(CAST(COUNT(*) AS DOUBLE)
                     / (SELECT COUNT(*) FROM v_lineitem_q19), 6) AS share_of_all
        FROM v_lineitem_q19 l1
        WHERE l_quantity > 2 * (SELECT MIN(l2.l_quantity) FROM v_lineitem_q19 l2
                                WHERE l2.l_partkey = l1.l_partkey)
        GROUP BY l_partkey
        """
    )
