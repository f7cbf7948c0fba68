"""Relational query surface: scans, filters, joins (all types), aggregations
(incl. distinct/rollup/cube/grouping sets), window functions (ranking,
running, lag, ntile, interval range frames), sorts/top-k, set ops, scalar
string/date/math/json/array functions, pivot/unpivot, sessionization, sliding
windows, and an as-of join.

The reference implements none of these (SURVEY.md §2.B — it is a 413-line ETL
runner); this module IS the engine's query surface. The relational entries
are built-in Spark DataFrame/SQL ops only (whole-stage codegen, never
row-at-a-time Python); the deliberate exceptions are the UDF/UDAF/UDTF
showcase entries (agg_weighted_median_udaf, events_trend_grouped_map,
events_minmax_norm_arrow, the applyInPandasWithState streams), which run
Arrow-batched Python workers BY DESIGN — that family's cost model is the
Arrow transfer, not codegen.

Scale notes are attached per query: broadcast hints go on genuinely small
dims (region/nation: 5/25 rows at any SF), fact-fact joins shuffle on their
keys and rely on AQE for skew, and total-order operations (row slices,
ntile, argmax) go through operators/ranking.py or broadcast scalar
aggregates rather than single-partition windows.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from contextlib import contextmanager as _contextmanager

import pandas as pd  # module-level: postponed annotations make UDF type
# hints strings, and pyspark resolves 'pd.Series' through module globals

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flusher_spark.io.tables import load_table, register_views
from flusher_spark.operators.asof import asof_join
from flusher_spark.plans.catalog import register
from flusher_spark.plans.num import (
    davg,
    dec,
    dsum,
    dsum_limbs,
    limb_sum_exact,
    money_long,
    sql_davg,
    sql_dsum,
    sql_dsum_exact,
)

# ---------------------------------------------------------------------------
# TPC-H-shaped analytics (flagship pricing summary first)
# ---------------------------------------------------------------------------

# Exact-decimal revenue expressions (see plans/num.py for why arithmetic is
# done in decimal from the base columns instead of casting double products).
_DISC = "(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4))))"
_CHARGE = f"(CAST({_DISC} AS DECIMAL(18,8)) * (1 + CAST(l_tax AS DECIMAL(12,4))))"


def _disc():
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))


def _charge():
    return _disc().cast("decimal(18,8)") * (F.lit(1) + dec("l_tax"))


# Long-limb twins of the decimal revenue expressions (num.dsum_limbs): the
# same exact values as integers scaled by 10^4 / 10^6, so the hot per-row
# path is codegen'd long arithmetic instead of interpreted wide-decimal ops,
# and the one group-level decimal(38,6)→double conversion stays bit-equal to
# the dsum_exact form the oracles state. q15_top_supplier deliberately keeps
# the TPC-H-literal sum-then-cast decimal form as the cross-check twin of
# this path (its docstring's contract with top_suppliers_revenue).


def _disc_cv():
    """_disc() as an exact long scaled by 1e4: price-in-hundredths times
    (100 − discount-in-hundredths)."""
    return money_long("l_extendedprice") * (F.lit(100) - money_long("l_discount"))


def _charge_cv():
    """_charge() as an exact long scaled by 1e6."""
    return _disc_cv() * (F.lit(100) + money_long("l_tax"))


def _dsum_disc():
    return dsum_limbs(_disc_cv(), 10**4)


def _dsum_charge():
    return dsum_limbs(_charge_cv(), 10**6)


def hist_nearest_ranks(h, col: str, cnt: str, ranks, group: str = "event_type"):
    """Per-``group`` nearest-rank order statistics from a VALUE HISTOGRAM
    (one row per distinct value of ``col`` with a ``cnt`` count): a running
    count over the histogram's value order, then for each (alias,
    rank_expr) pair the minimum value whose running count reaches the
    rank. ``rank_expr`` is a SQL string that may reference ``n`` — the
    group's total row count, also emitted as a long ``n`` column. The
    window runs over DISTINCT VALUES, never raw rows, so its size is
    bounded by the value domain regardless of fact size — the
    histogram-running-sum discipline of the exact quantile family, hoisted
    from five hand-rolled copies (r14 review): the median/quartile/
    percentile selections of agg_exact_quantile_interpolated,
    agg_histogram_rollup_percentile, events_winsorized_stats,
    events_histogram_equidepth, and events_anomaly_mad."""
    wc = Window.partitionBy(group).orderBy(col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy(group)
    c = h.select(
        group, col, F.sum(cnt).over(wc).alias("cum"), F.sum(cnt).over(wn).alias("n")
    )
    return c.groupBy(group).agg(
        F.min("n").cast("long").alias("n"),
        *[
            F.min(F.when(F.col("cum") >= F.expr(r), F.col(col))).alias(a)
            for a, r in ranks
        ],
    )


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum_exact(_DISC)} AS sum_disc_price,
           {sql_dsum_exact(_CHARGE)} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: scan→filter→project→agg→sort (TPC-H Q1 shape). Partial
    aggregation is map-side; six groups total, so the shuffle is tiny."""
    l = load_table(spark, sf_dir, "lineitem")

    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            _dsum_disc().alias("sum_disc_price"),
            _dsum_charge().alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q6_revenue_filter",
    oracle=f"""
    SELECT COALESCE({sql_dsum_exact('(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(12,4)))')}, 0.0) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q6_revenue_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure filter-aggregate (TPC-H Q6 shape); all predicates push to parquet."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.coalesce(
                dsum_limbs(money_long("l_extendedprice") * money_long("l_discount"), 10**4),
                F.lit(0.0),
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum_exact(_DISC)} AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15'
      AND l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + top-k (TPC-H Q3 shape). customer is filtered before
    the join so Catalyst can broadcast it; orders⋈lineitem shuffles on the
    order key (the natural co-partitioning at scale)."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp_ntz")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp_ntz")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("orderdate"), "o_orderpriority")
        .agg(_dsum_disc().alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q4_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join with a non-equi residual (TPC-H Q4 shape)."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(l, (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q5_region_revenue",
    oracle=f"""
    SELECT n_name, {sql_dsum_exact(_DISC)} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way join through a dimension chain (TPC-H Q5 shape). region/nation
    are broadcast explicitly (5/25 rows at every SF); supplier joins on the
    composite (suppkey, nationkey) after the fact-fact shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum_disc().alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {sql_dsum_exact(_DISC)} AS revenue, c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item ranking (TPC-H Q10 shape): join + agg + global top-20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum_disc().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "top_suppliers_revenue",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS s_suppkey, {sql_dsum_exact(_DISC)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s_name, total_revenue
    FROM rev JOIN supplier s ON rev.s_suppkey = s.s_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def top_suppliers_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax via a broadcast 1-row scalar max over the distributed
    per-supplier aggregate (TPC-H Q15 shape) — no single-partition window;
    AQE reuses the aggregate exchange across both branches so the fact is
    scanned once. Exact integer sums make the max-equality tie set safe.
    Deliberate near-twin of q15_top_supplier: this entry pins the
    codegen'd long-limb exact-sum discipline (num.dsum_limbs), q15 pins the
    TPC-H-literal sum-then-cast decimal(38,6) form — the two must keep
    agreeing on the same window, which is itself a cross-check of the two
    exact-sum paths."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(_dsum_disc().alias("total_revenue"))
    )
    # Argmax via a broadcast 1-row scalar max, not an unpartitioned window:
    # rev stays fully distributed, the max is a tiny all-to-one agg.
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    best = rev.crossJoin(F.broadcast(mx)).where(
        F.col("total_revenue") == F.col("__mx")
    )
    return (
        best.join(s, "s_suppkey")
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Join-type coverage
# ---------------------------------------------------------------------------


@register(
    "join_broadcast_dim",
    oracle=f"""
    SELECT p_brand, {sql_dsum_exact(_DISC)} AS revenue, COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size < 15
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim with an explicit broadcast hint — no shuffle of lineitem."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") < 15)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(_dsum_disc().alias("revenue"), F.count("*").alias("n_items"))
        .orderBy("p_brand")
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
           COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
    WITH s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1),
         c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1)
    SELECT COALESCE(s.nationkey, c.nationkey) AS nationkey,
           COALESCE(n_suppliers, 0) AS n_suppliers,
           COALESCE(n_customers, 0) AS n_customers
    FROM s FULL JOIN c ON s.nationkey = c.nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregations (aggregate-then-join keeps the
    shuffled data minimal — the scalable order of operations)."""
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    return (
        s.join(c, "nationkey", "full")
        .select(
            "nationkey",
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_mktsegment = 'BUILDING'
      AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): building-segment customers with urgent orders."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers who never ordered."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_acctbal")


@register(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny dims (125 rows; broadcast nested loop)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(F.broadcast(n)).select("r_name", "n_name")


# ---------------------------------------------------------------------------
# Aggregation coverage
# ---------------------------------------------------------------------------


@register(
    "agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (expand + two-phase agg under the hood)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n_customers"), F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           {sql_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (grand total + per-flag + per-pair)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           {sql_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations of the two dims."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface (same Catalyst plan)."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        f"""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               {sql_dsum('l_quantity')} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "agg_variance_manual",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n,
           {sql_dsum('l_quantity')} / COUNT(*) AS mean_qty,
           ({sql_dsum('l_quantity * l_quantity')}
            - {sql_dsum('l_quantity')} * {sql_dsum('l_quantity')} / COUNT(*)) / (COUNT(*) - 1) AS var_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_variance_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance from exact decimal sums (deterministic across engines,
    unlike streaming variance implementations)."""
    l = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    s1 = dsum(q)
    s2 = dsum(q * q)
    n = F.count("*")
    return (
        l.groupBy("l_returnflag")
        .agg(
            n.alias("n"),
            (s1 / n).alias("mean_qty"),
            # try_divide: a singleton group has n-1 = 0 and ANSI decimal
            # division RAISES; NULL matches the oracle (r12 review).
            F.try_divide(s2 - s1 * s1 / n, n - F.lit(1)).alias("var_qty"),
        )
        .orderBy("l_returnflag")
    )


@register("count_rows", oracle="SELECT COUNT(*) AS n FROM lineitem")
def count_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row count (the reference's numrows operator, export.py:31-32 — which
    fetched every cell to count rows; here it's a metadata-only parquet scan)."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "window_topk_per_group",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_acctbal, rn FROM (
      SELECT s_nationkey, s_suppkey, s_acctbal,
             ROW_NUMBER() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rn
      FROM supplier) t
    WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 suppliers per nation — the scalable top-k-per-group pattern
    (one shuffle on the partition key; no global sort)."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), "s_suppkey")
    return (
        s.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("s_nationkey", "s_suppkey", "s_acctbal", F.col("rn").cast("long").alias("rn"))
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend (deterministic via the orderkey tiebreak)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("orderdate"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double").alias("running_total"),
    )


@register(
    "window_lag_delta",
    oracle="""
    SELECT event_id, user_id, value,
           value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
    FROM events
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG analytic: per-user event-over-event change."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id", "user_id", "value", (F.col("value") - F.lag("value").over(w)).alias("delta")
    )


@register(
    "window_ntile",
    oracle="""
    SELECT c_custkey, NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
    FROM customer
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quartiles over a total order — computed DISTRIBUTED via
    operators.ranking (range partition + per-partition offsets), not the
    single-partition ``Window.orderBy`` that WindowExec warns about."""
    from flusher_spark.operators.ranking import with_global_ntile

    c = load_table(spark, sf_dir, "customer")
    return with_global_ntile(c, ["c_acctbal", "c_custkey"], 4, out="quartile").select(
        "c_custkey", "quartile"
    )


@register(
    "window_range_interval",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS rolling_30d
    FROM orders
    """,
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: 30-day rolling spend per customer (SQL surface;
    the DataFrame API's rangeBetween is numeric-only)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                          RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS rolling_30d
        FROM orders
        """
    )


# ---------------------------------------------------------------------------
# Set operations / distinct / sort-limit
# ---------------------------------------------------------------------------


@register(
    "setop_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "setop_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with both urgent and low-priority orders."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("custkey"))
    low = o.where(F.col("o_orderpriority") == "5-LOW").select(F.col("o_custkey").alias("custkey"))
    return urgent.intersect(low)


@register(
    "setop_except",
    oracle="""
    SELECT p_partkey FROM part
    EXCEPT
    SELECT l_partkey FROM lineitem
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: parts never ordered. ``subtract`` IS SQL's EXCEPT (set
    semantics: a value present on the right disappears entirely) —
    ``exceptAll().distinct()`` only matches it when the left side has no
    duplicate keys (multiplicity subtraction keeps a row the set form
    drops whenever count_left > count_right > 0; r14 review)."""
    p = load_table(spark, sf_dir, "part").select("p_partkey")
    l = load_table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    return p.subtract(l)


@register("distinct_values", oracle="SELECT DISTINCT c_mktsegment FROM customer")
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (exact dedup on a projection)."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@register(
    "topk_orders_global",
    oracle="""
    SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (Spark executes as a per-partition take + merge, not a
    full sort — the right plan at scale)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", F.col("o_orderdate").cast("date").alias("orderdate"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "range_scan_rows",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount FROM (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
             ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
      FROM lineitem) t
    WHERE rn BETWEEN 11 AND 50
    """,
)
def range_scan_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A1 cell-range scan semantic (reference export.py:46-51): a column
    projection plus a row-slice over the canonical order. Distributed via
    operators.ranking.global_row_slice — A1 addressing is spreadsheet-scale
    (≤10M cells per Google's limits) but the same slice works on a fact
    table without a single-partition window."""
    from flusher_spark.operators.ranking import global_row_slice

    l = load_table(spark, sf_dir, "lineitem")
    return global_row_slice(
        l.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"),
        ["l_orderkey", "l_linenumber"],
        11,
        50,
    )


@register(
    "filter_projection_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '2000-01-01'
    """,
)
def filter_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain filter+project — both reach the parquet scan (PushedFilters /
    ReadSchema; asserted in tests/test_plans.py)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.where(
        (F.col("l_quantity") > 45)
        & (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


# ---------------------------------------------------------------------------
# Scalar function coverage
# ---------------------------------------------------------------------------


@register(
    "scalar_string_funcs",
    oracle=r"""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           SUBSTRING(p_name, 1, 5) AS name_prefix,
           LENGTH(p_name) AS name_len,
           CONCAT(p_brand, '#', p_type) AS brand_type,
           REGEXP_EXTRACT(p_name, '^(\w+)', 1) AS first_word,
           REPLACE(p_type, ' ', '_') AS type_snake
    FROM part
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function coverage: case, substring, length, concat, regexp,
    replace — all JVM-side built-ins."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
           CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
           CAST(QUARTER(o_orderdate) AS INTEGER) AS order_quarter,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month_start,
           CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_1995
    FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function coverage: extract, truncate, diff."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz")).alias(
            "days_since_1995"
        ),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(0.1 AS DECIMAL(2,1)), 2) AS DOUBLE) AS price_tenth,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           SQRT(l_quantity) AS qty_sqrt,
           l_quantity * l_quantity AS qty_sq,
           l_orderkey % 7 AS key_mod
    FROM lineitem
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function coverage, restricted to IEEE-exact ops (sqrt/abs/round/
    ceil/floor/mod) so the oracle comparison is bit-stable."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        # Decimal, not double: price*0.1 has 3 decimal digits, so rounding
        # the double at scale 2 hits midpoints where engines disagree.
        F.round(dec("l_extendedprice") * F.expr("CAST(0.1 AS DECIMAL(2,1))"), 2)
        .cast("double")
        .alias("price_tenth"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@register(
    "scalar_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column (FIXTURES.md)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select("event_type", F.get_json_object("props", "$.k").cast("int").alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n"))
        .orderBy("event_type")
    )


def _sql_array_fold(col: str, dim: int, term: str = "CAST({c}[{i}] AS DOUBLE)") -> str:
    """Left-associated explicit fold over array elements — matches Spark's
    F.aggregate fold order bit-for-bit (see plans/catalog.py numeric notes)."""
    return "(" + " + ".join(term.format(c=col, i=i) for i in range(1, dim + 1)) + ")"


EMBEDDING_DIM = 64  # fixed by the fixtures (FIXTURES.md embeddings.embedding)


@register(
    "scalar_array_ops",
    oracle=f"""
    SELECT vec_id,
           CAST(LEN(embedding) AS INTEGER) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           CAST(embedding[{EMBEDDING_DIM}] AS DOUBLE) AS last_elem,
           {_sql_array_fold('embedding', EMBEDDING_DIM)} AS elem_sum
    FROM embeddings
    """,
)
def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function coverage on the embedding column: size, element access,
    and an exact left-fold sum (F.aggregate — no UDF)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.element_at("embedding", EMBEDDING_DIM).cast("double").alias("last_elem"),
        F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")).alias("elem_sum"),
    )


@register(
    "case_when_bucketing",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders GROUP BY 1 ORDER BY bucket
    """,
)
def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregation."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("total"))
        .orderBy("bucket")
    )


@register(
    "pivot_linestatus",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS "F",
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS "O"
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: linestatus columns out of rows (explicit value list — no extra
    distinct-scan job, which matters at scale)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum("l_quantity"))
        .orderBy("l_returnflag")
    )


@register(
    "unpivot_part_attrs",
    oracle="""
    SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    """,
)
def unpivot_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide attributes to long (id, attr, val) rows."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", F.col("p_size").cast("double").alias("p_size")
    )
    return p.unpivot("p_partkey", ["p_retailprice", "p_size"], "attr", "val")


# ---------------------------------------------------------------------------
# Event-time operators (batch shape; streaming versions in streaming/windows.py)
# ---------------------------------------------------------------------------


@register(
    "events_tumbling_hourly",
    oracle=f"""
    SELECT EPOCH_US(DATE_TRUNC('hour', ts)) AS window_start_us, event_type,
           COUNT(*) AS n, {sql_dsum('value')} AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows over event time."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "events_sliding_2h_1h",
    oracle=f"""
    WITH assigned AS (
      SELECT DATE_TRUNC('hour', ts) AS ws, event_type, value FROM events
      UNION ALL
      SELECT DATE_TRUNC('hour', ts) - INTERVAL 1 HOUR, event_type, value FROM events)
    SELECT EPOCH_US(ws) AS window_start_us, event_type,
           COUNT(*) AS n, {sql_dsum('value')} AS sum_value
    FROM assigned GROUP BY 1, 2
    """,
)
def events_sliding_2h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h length, 1h slide): each event lands in two windows."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "events_sessionize_30m",
    oracle="""
    WITH gaps AS (
      SELECT user_id, EPOCH_US(ts) AS ts_us,
             LAG(EPOCH_US(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events)
    SELECT user_id, CAST(SUM(CASE WHEN prev_us IS NULL
                                  OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sessions
    FROM gaps GROUP BY user_id
    """,
)
def events_sessionize_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + marker sum — one
    shuffle on user_id; the streaming twin uses session_window."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros("ts")
    new_session = (
        F.lag(ts_us).over(w).isNull() | ((ts_us - F.lag(ts_us).over(w)) > 1_800_000_000)
    ).cast("long")
    return (
        e.select("user_id", new_session.alias("new_s"))
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n_sessions"))
    )


@register(
    "agg_exact_quantile_interpolated",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cv
      FROM events),
    hist AS (SELECT event_type, cv, COUNT(*) AS k FROM v GROUP BY event_type, cv),
    run AS (
      SELECT event_type, cv, k,
             SUM(k) OVER (PARTITION BY event_type ORDER BY cv) AS cum,
             SUM(k) OVER (PARTITION BY event_type) AS n
      FROM hist),
    pos AS (
      SELECT event_type, cv, cum, n,
             1 + (n - 1) // 4 AS k25, (n - 1) % 4 AS r25,
             1 + (3 * (n - 1)) // 4 AS k75, (3 * (n - 1)) % 4 AS r75
      FROM run),
    sel AS (
      SELECT event_type, CAST(MIN(n) AS BIGINT) AS n,
             MIN(r25) AS r25, MIN(r75) AS r75,
             MIN(CASE WHEN cum >= k25 THEN cv END) AS x25,
             MIN(CASE WHEN cum >= k25 + 1 THEN cv END) AS x25n,
             MIN(CASE WHEN cum >= k75 THEN cv END) AS x75,
             MIN(CASE WHEN cum >= k75 + 1 THEN cv END) AS x75n
      FROM pos GROUP BY event_type)
    SELECT event_type, n,
           CAST((4 - r25) * x25 + r25 * COALESCE(x25n, x25) AS BIGINT) AS q25_cv_x4,
           CAST((4 - r75) * x75 + r75 * COALESCE(x75n, x75) AS BIGINT) AS q75_cv_x4
    FROM sel ORDER BY event_type
    """,
)
def agg_exact_quantile_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT linearly-INTERPOLATED quantiles (Hyndman–Fan type 7 — the
    definition numpy.percentile and Spark's ``percentile`` use) with zero
    doubles: at q = m/4 the interpolation fraction is a quarter, so
    4·quantile = (4−r)·x_k + r·x_{k+1} with r = (m·(n−1)) mod 4 — pure
    integer arithmetic over the exact cv = 100·value domain. Completes
    the quantile family: nearest-rank exact (agg_exact_median_ranked),
    histogram-rollup exact (agg_histogram_rollup_percentile), sketch
    approximate (agg_approx_sketches), and now interpolated exact — the
    one that usually forces engines into drifting float interpolation.
    Both order statistics come from the same VALUE-HISTOGRAM running sum
    (windows over distinct values, never raw rows); one fact scan, two
    histogram shuffles."""
    e = load_table(spark, sf_dir, "events")
    cv = (dec("value", "decimal(8,2)") * 100).cast("long")
    hist = (
        e.select("event_type", cv.alias("cv")).groupBy("event_type", "cv").agg(
            F.count("*").alias("k")
        )
    )
    sel = hist_nearest_ranks(
        hist,
        "cv",
        "k",
        [
            ("x25", "1 + (n - 1) div 4"),
            ("x25n", "2 + (n - 1) div 4"),
            ("x75", "1 + (3 * (n - 1)) div 4"),
            ("x75n", "2 + (3 * (n - 1)) div 4"),
        ],
    )
    return sel.selectExpr(
        "event_type", "n",
        "CAST((4 - (n - 1) % 4) * x25 + ((n - 1) % 4) * COALESCE(x25n, x25) AS BIGINT) AS q25_cv_x4",
        "CAST((4 - (3 * (n - 1)) % 4) * x75 + ((3 * (n - 1)) % 4) * COALESCE(x75n, x75) AS BIGINT) AS q75_cv_x4",
    ).orderBy("event_type")


@register(
    "sql_api_revenue_report",
    oracle="""
    WITH r AS (
      SELECT n.n_name AS nation,
             date_trunc('month', o.o_orderdate) AS month,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(8,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(8,2)))) AS DOUBLE)
               AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY nation, month)
    SELECT nation, CAST(month AS DATE) AS month, revenue,
           CAST(RANK() OVER (PARTITION BY month ORDER BY revenue DESC, nation)
                AS BIGINT) AS month_rank
    FROM r
    WHERE revenue > 0
    ORDER BY month, month_rank, nation
    """,
)
def sql_api_revenue_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PURE-SQL authoring surface, demonstrated end to end: temp views
    over the lake tables, then one ``spark.sql`` statement combining a
    4-table join, decimal-exact revenue aggregation, and a ranking window
    — a user who writes SQL (not DataFrames) runs this engine unchanged,
    and Catalyst plans it identically to the DataFrame twin (same
    broadcast/AQE/pushdown machinery; every other catalog entry proves
    the DataFrame surface, this one proves ``spark.sql``). The statement
    text doubles as the oracle with only dialect-level tweaks (DuckDB
    date_trunc returns TIMESTAMP → cast to DATE on both sides)."""
    for t in ("lineitem", "orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        WITH r AS (
          SELECT n.n_name AS nation,
                 CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
                 CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(8,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(8,2)))) AS DOUBLE)
                   AS revenue
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY nation, month)
        SELECT nation, month, revenue,
               CAST(RANK() OVER (PARTITION BY month
                                 ORDER BY revenue DESC, nation) AS BIGINT)
                 AS month_rank
        FROM r
        WHERE revenue > 0
        ORDER BY month, month_rank, nation
        """
    )


@register(
    "events_sliding_distinct_bitmap",
    oracle="""
    WITH days AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day
                  FROM events)
    SELECT e.event_type, d.day, COUNT(DISTINCT e.user_id) AS users_7d
    FROM events e JOIN days d
      ON CAST(date_trunc('day', e.ts) AS DATE) BETWEEN d.day - 6 AND d.day
    GROUP BY e.event_type, d.day ORDER BY e.event_type, d.day
    """,
)
def events_sliding_distinct_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-7-day distinct users per event type — the windowed
    completion of the incremental-distinct story: agg_bitmap_distinct
    showed the per-group bitmap, agg_hll_rollup_reuse the approximate
    rollup; this is the exact SLIDING window, and the reason it scales is
    that the window runs over the BITMAP LAYER, never the fact. One fact
    scan builds per-(type, day, chunk) 64-bit words (partial-aggregated);
    each word row then fans out — a narrow explode(sequence(day, day+6)),
    no join — to the ≤7 window-end days it serves, a second bit_or merges
    per (type, window_day, chunk), and bit_count sums give exact
    cardinalities. A broadcast equi-join against the distinct-day spine
    drops phantom window ends past the data's last day. Fan-out cost is
    7× the COMPACT bitmap table (types × days × chunks rows), not 7× the
    events — the oracle's direct formulation is the 7×-the-fact range
    join this plan exists to avoid. Matching hashes prove the bitmap
    window loses nothing vs COUNT(DISTINCT)."""
    e = load_table(spark, sf_dir, "events")
    daily = bitmap_distinct_words(e, "user_id", "event_type", F.to_date("ts").alias("day"))
    spine = daily.select("day").distinct()
    fan = daily.select(
        "event_type",
        "chunk",
        "word",
        F.explode(F.expr("sequence(day, date_add(day, 6), interval 1 day)")).alias("wday"),
    )
    merged = (
        fan.join(F.broadcast(spine), fan.wday == spine.day)
        .groupBy("event_type", "day", "chunk")
        .agg(F.bit_or("word").alias("word"))
    )
    return (
        merged.groupBy("event_type", "day")
        .agg(F.sum(F.bit_count("word")).alias("users_7d"))
        .orderBy("event_type", "day")
    )


@register(
    "agg_histogram_rollup_percentile",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cv
      FROM events),
    daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cv, COUNT(*) AS k
      FROM events GROUP BY 1, 2, 3),
    merged AS (
      SELECT event_type, cv, CAST(SUM(k) AS BIGINT) AS k
      FROM daily GROUP BY event_type, cv),
    run AS (
      SELECT event_type, cv, k,
             SUM(k) OVER (PARTITION BY event_type ORDER BY cv) AS cum,
             SUM(k) OVER (PARTITION BY event_type) AS n
      FROM merged)
    SELECT event_type, CAST(MIN(n) AS BIGINT) AS n_values,
           MIN(CASE WHEN cum >= (n + 1) // 2 THEN cv END) AS p50_cv,
           MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN cv END) AS p99_cv
    FROM run GROUP BY event_type ORDER BY event_type
    """,
)
def agg_histogram_rollup_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRE-AGGREGATED PERCENTILE LAYER — what makes percentile
    dashboards tractable at 100 TB: materialize per-(type, day) VALUE
    HISTOGRAMS once (value is a 2-decimal money column, so cv = 100·value
    is an exact integer key and the histogram is lossless), then answer
    the coarser per-type median/p99 by MERGING histograms — integer count
    addition, associative and exact, the same rollup-reuse move as the
    HLL entry but for EXACT nearest-rank quantiles. The daily histogram
    table is days × types × |distinct values| rows serving ANY date-range
    percentile with zero fact rescans; the fact is read once. Matching
    hashes against the oracle's identical formulation prove the rollup
    layer loses nothing (merged-histogram quantile ≡ direct quantile, a
    consequence of integer-exact counts). Single-partition windows run
    only over distinct (type, value) rows — the winsorize-trick
    boundedness argument, stated where it matters."""
    e = load_table(spark, sf_dir, "events")
    cv = (dec("value", "decimal(8,2)") * 100).cast("long")
    daily = (
        e.select("event_type", F.to_date("ts").alias("day"), cv.alias("cv"))
        .groupBy("event_type", "day", "cv")
        .agg(F.count("*").alias("k"))
    )
    merged = daily.groupBy("event_type", "cv").agg(F.sum("k").cast("long").alias("k"))
    return (
        hist_nearest_ranks(
            merged,
            "cv",
            "k",
            [("p50_cv", "(n + 1) div 2"), ("p99_cv", "(99 * n + 99) div 100")],
        )
        .withColumnRenamed("n", "n_values")
        .orderBy("event_type")
    )


@register(
    "events_sessionize_dynamic_gap",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, EPOCH_US(ts) AS ts_us,
             CASE WHEN event_type = 'purchase' THEN 3600000000
                  ELSE 1800000000 END AS gap_us
      FROM events),
    r AS (
      SELECT *, MAX(ts_us + gap_us)
                  OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS reach
      FROM e),
    s AS (
      SELECT *, CAST(SUM(CASE WHEN reach IS NULL OR ts_us >= reach
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                     AS BIGINT) AS sid
      FROM r)
    SELECT user_id, sid, MIN(ts_us) AS session_start_us,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_purchases
    FROM s GROUP BY user_id, sid ORDER BY user_id, sid
    """,
)
def events_sessionize_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a PER-EVENT dynamic inactivity gap (purchases
    hold the session open 60 min, everything else 30) — the semantics of
    Spark's ``session_window(ts, gap_col)``, expressed relationally so the
    batch form carries a full oracle: each event projects a reach of
    ts + gap(event); a session breaks where an event's start is at or past
    the RUNNING MAX of all previous reaches (running max, not lag — an
    early long-gap event must hold the session open across later
    short-gap ones, exactly the interval-merge rule session_window
    applies). One user-key shuffle; both window passes share the
    partitioning and sort. All µs-integer arithmetic — no interval/float
    boundary drift between engines. Tie safety: equal-ts events can never
    split (reach > ts for any positive gap), so the event_id tie-break
    affects only internal numbering, which the grouping absorbs
    identically in both engines. The streaming twin is
    ``F.session_window(F.col("ts"), gap_col)`` over stream_events with
    the same gap expression."""
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros("ts")
    gap_us = F.when(F.col("event_type") == "purchase", F.lit(3_600_000_000)).otherwise(
        F.lit(1_800_000_000)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    reach = F.max(ts_us + gap_us).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_s = (reach.isNull() | (ts_us >= reach)).cast("long")
    sid = F.sum(new_s).over(w)
    return (
        e.select(
            "user_id",
            "event_type",
            ts_us.alias("ts_us"),
            sid.alias("sid"),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.count("*").alias("n_events"),
            F.sum((F.col("event_type") == "purchase").cast("int"))
            .cast("long")
            .alias("n_purchases"),
        )
        .orderBy("user_id", "sid")
    )


@register(
    "asof_purchase_last_view",
    oracle="""
    SELECT p.event_id, p.user_id, EPOCH_US(p.ts) AS purchase_ts_us,
           EPOCH_US(v.ts) AS last_view_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the most recent prior (or simultaneous)
    view by the same user — composed from union + running window
    (operators/asof.py), one shuffle, no range explosion."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = e.where(F.col("event_type") == "view").select("user_id", F.col("ts").alias("view_ts"))
    joined = asof_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="view_ts", value_cols=[]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.unix_micros("view_ts_right").alias("last_view_ts_us"),
    )


@register(
    "asof_view_staleness_bound",
    oracle="""
    SELECT p.event_id, p.user_id, EPOCH_US(p.ts) AS purchase_ts_us,
           CASE WHEN EPOCH_US(p.ts) - EPOCH_US(v.ts) <= 3600000000
                THEN EPOCH_US(v.ts) END AS fresh_view_ts_us,
           (v.ts IS NOT NULL
            AND EPOCH_US(p.ts) - EPOCH_US(v.ts) > 3600000000) AS stale
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def asof_view_staleness_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature lookup WITH A STALENESS BOUND — the
    feature-store contract: each purchase takes the user's most recent
    prior view only if it is at most 1 hour old; an older match is
    reported STALE (flagged, value nulled) rather than silently served.
    Composition, not a new operator: the tolerance is one codegen'd CASE
    over the asof join's output (operators/asof.py — union + running
    window, one shuffle, no range explosion), because as-of-with-tolerance
    ≡ as-of followed by an age filter when matches are latest-first. The
    µs-integer age compare is engine-exact; the oracle applies the same
    CASE over DuckDB's native ASOF JOIN."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = e.where(F.col("event_type") == "view").select("user_id", F.col("ts").alias("view_ts"))
    joined = asof_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="view_ts", value_cols=[]
    )
    p_us = F.unix_micros("ts")
    v_us = F.unix_micros("view_ts_right")
    age = p_us - v_us
    return joined.select(
        "event_id",
        "user_id",
        p_us.alias("purchase_ts_us"),
        F.when(age <= 3_600_000_000, v_us).alias("fresh_view_ts_us"),
        (v_us.isNotNull() & (age > 3_600_000_000)).alias("stale"),
    )


@register(
    "asof_nearest_view",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    v AS (SELECT user_id, ts AS vts FROM events WHERE event_type = 'view'),
    best AS (
      SELECT p.event_id, EPOCH_US(v.vts) AS nearest_view_ts_us
      FROM p JOIN v ON p.user_id = v.user_id
        AND ABS(EPOCH_US(p.ts) - EPOCH_US(v.vts)) <= 3600000000
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY p.event_id
        ORDER BY ABS(EPOCH_US(p.ts) - EPOCH_US(v.vts)), EPOCH_US(v.vts)) = 1)
    SELECT p.event_id, p.user_id, EPOCH_US(p.ts) AS purchase_ts_us,
           best.nearest_view_ts_us
    FROM p LEFT JOIN best USING (event_id)
    """,
)
def asof_nearest_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas merge_asof direction='nearest'):
    each purchase paired with the closest view by the same user within ±1 h,
    whichever side is closer (ties prefer the prior view). Composed from the
    union + dual running-window formulation (operators/asof.py
    asof_join_nearest) — ONE shuffle, both direction passes in one Window
    node, no tolerance-proportional join fan-out (the oracle's |Δt| ≤ tol
    theta-join explodes with tolerance; the engine's cost is the sort)."""
    from flusher_spark.operators.asof import asof_join_nearest

    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = e.where(F.col("event_type") == "view").select("user_id", F.col("ts").alias("view_ts"))
    joined = asof_join_nearest(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="view_ts",
        tolerance_us=3_600_000_000, value_cols=[],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.unix_micros("view_ts_right").alias("nearest_view_ts_us"),
    )


@register(
    "join_range_binned",
    oracle="""
    WITH promo AS (
      SELECT event_id AS promo_id, user_id, ts AS win_start,
             ts + INTERVAL 30 MINUTE AS win_end
      FROM events WHERE event_type = 'purchase')
    SELECT p.promo_id, p.user_id, COUNT(e.event_id) AS n_views_in_window
    FROM promo p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') e
      ON e.user_id = p.user_id AND e.ts >= p.win_start AND e.ts < p.win_end
    GROUP BY p.promo_id, p.user_id
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join via operators/rangejoin.py bin trick:
    views landing inside each purchase's 30-minute follow-up window, counted
    per window. The bin equi-join keeps it shuffle-parallel — no
    BroadcastNestedLoopJoin / CartesianProduct (asserted in test_plans)."""
    from flusher_spark.operators.rangejoin import range_join

    e = load_table(spark, sf_dir, "events")
    promo = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("promo_id"),
        "user_id",
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("win_end"),
    )
    views = e.where(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    hits = range_join(
        views, promo, left_point="ts", right_start="win_start", right_end="win_end",
        on=["user_id"], bin_width="30 minutes",
    )
    counted = hits.groupBy("promo_id", "user_id").agg(
        F.count("*").alias("n_views_in_window")
    )
    # LEFT semantics: windows with zero views still appear (count 0).
    return (
        promo.join(counted, ["promo_id", "user_id"], "left")
        .select(
            "promo_id",
            "user_id",
            F.coalesce("n_views_in_window", F.lit(0)).cast("long").alias("n_views_in_window"),
        )
    )


@register(
    "join_interval_overlap",
    oracle="""
    WITH p AS (
      SELECT event_id AS p_id, ts AS p_start, ts + INTERVAL 90 MINUTE AS p_end
      FROM events WHERE event_type = 'purchase'),
    i AS (
      SELECT event_id AS i_id, ts AS i_start, ts + INTERVAL 45 MINUTE AS i_end
      FROM events WHERE event_type = 'error')
    SELECT p.p_id, COUNT(*) AS n_incidents,
           MIN(i.i_id) AS first_incident, MAX(i.i_id) AS last_incident
    FROM p JOIN i ON p.p_start < i.i_end AND i.i_start < p.p_end
    GROUP BY p.p_id
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join (the SCD2/maintenance-window shape):
    purchase follow-up windows [ts, ts+90m) × incident windows [ts, ts+45m),
    summarized per purchase. Runs through
    operators/rangejoin.py::interval_overlap_join — both sides exploded
    across 30-minute bins, equi-joined on the bin id, deduplicated by the
    canonical greatest-start bin (a filter, not a distinct shuffle). The
    oracle states the same join as the plain theta join DuckDB can afford at
    oracle scale; Spark would plan that form as a nested loop, which is the
    whole point of the bin rewrite (no-nested-loop asserted in test_plans)."""
    from flusher_spark.operators.rangejoin import interval_overlap_join

    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_start"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("p_end"),
    )
    i = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("i_id"),
        F.col("ts").alias("i_start"),
        (F.col("ts") + F.expr("INTERVAL 45 MINUTES")).alias("i_end"),
    )
    pairs = interval_overlap_join(
        p, i, "p_start", "p_end", "i_start", "i_end", bin_width="30 minutes"
    )
    return pairs.groupBy("p_id").agg(
        F.count("*").alias("n_incidents"),
        F.min("i_id").alias("first_incident"),
        F.max("i_id").alias("last_incident"),
    )


@register(
    "events_rollup_day_hour",
    oracle=f"""
    SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
           EXTRACT(hour FROM ts) AS hour,
           COUNT(*) AS n, {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY ROLLUP (CAST(DATE_TRUNC('day', ts) AS DATE), EXTRACT(hour FROM ts))
    """,
)
def events_rollup_day_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time rollup: (day, hour) hierarchy with subtotal and
    grand-total rows via ROLLUP — partial aggregation map-side, one shuffle,
    the continuous-aggregate pattern at any scale."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.col("ts").cast("date").alias("day"),
            F.hour("ts").cast("long").alias("hour"),
            "value",
        )
        .rollup("day", "hour")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
    )


@register("agg_approx_sketches")  # rows-only: HLL/quantile sketches differ across engines by design
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — the constant-memory path when exact distinct /
    quantiles would spill at scale: HyperLogLog++ distinct counts and
    approximate percentiles, one pass, mergeable partials (the 100 TB answer
    to COUNT(DISTINCT) over a high-cardinality key). Accuracy vs the exact
    twins is asserted in tests/test_plans.py.

    The three quantiles are projected to scalar doubles (not an
    array<double> column): the driver's result canonicalizer sorts/hashes
    column values and numpy arrays are unhashable there."""
    l = load_table(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000)
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
            q.getItem(0).alias("price_p50"),
            q.getItem(1).alias("price_p95"),
            q.getItem(2).alias("price_p99"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register("agg_count_min_freq")  # rows-only: no CMS in DuckDB; bounds asserted in tests
def agg_count_min_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates — the constant-memory answer to
    "how often does key k appear?" over a 100 TB stream, where an exact
    per-key count would shuffle the full key space. The sketch is built by
    the built-in F.count_min_sketch aggregate (eps=0.001, conf=0.99, fixed
    seed): partials are d×w counter arrays merged by addition, so the
    result is independent of partitioning AND deterministic for a fixed
    seed — rows-only only because DuckDB has no CMS, not because the output
    wobbles. Querying happens driver-side against the per-group sketches
    via a pure-Python reader of the sketch's public V1 serialization
    (functions/sketch.py — no spark._jvm, so the probe works identically
    under Spark Connect): bounded by construction (one ~100 KB sketch per
    event_type, 5 groups) — the distributed work is the build + merge,
    which is the part that scales with data. Estimates are guaranteed >=
    the true count, and <= true + eps*N with prob 1-delta (asserted
    against exact counts, and bit-for-bit against the JVM reader, in
    tests/test_plans.py)."""
    from flusher_spark.functions.sketch import CountMinSketch

    e = load_table(spark, sf_dir, "events")
    sketches = (
        e.groupBy("event_type")
        .agg(
            F.count_min_sketch("user_id", F.lit(0.001), F.lit(0.99), F.lit(42)).alias("cms"),
            F.count("*").alias("n_events"),
        )
        .collect()  # bounded: |event_type| rows, each a ~100 KB sketch
    )
    query_keys = list(range(1, 11))  # fixed probe set: user_ids 1..10
    out = []
    for row in sketches:
        sk = CountMinSketch.from_bytes(bytes(row["cms"]))
        for k in query_keys:
            out.append((row["event_type"], k, sk.estimate_count(k), row["n_events"]))
    return spark.createDataFrame(
        out, "event_type string, user_id long, est_count long, n_events long"
    ).orderBy("event_type", "user_id")


@register(
    "q12_conditional_agg",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS high_priority,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS low_priority
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q12_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation over a fact-fact join (TPC-H Q12 shape):
    CASE-summing inside a single hash agg — one shuffle on the order key,
    one on the tiny group key."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey)
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-of-counts (TPC-H Q13 shape): left join keeps zero-order
    customers, then a second aggregation over the first's result — the
    double-shuffle histogram pattern."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q14_promo_ratio",
    oracle=f"""
    SELECT 100.0 * {sql_dsum_exact(f"CASE WHEN p_type = 'PROMO' THEN {_DISC} ELSE CAST(0 AS DECIMAL(13,4)) END")}
                 / {sql_dsum_exact(_DISC)} AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional revenue ratio (TPC-H Q14 shape): part is a dimension —
    filtered lineitem joins it broadcast. Both sums are exact (long-limb
    integer sums, num.dsum_limbs — bit-equal to the oracle's decimal SUM by
    construction); the ratio is computed in doubles AFTER surfacing each sum
    through the decimal(38,6)→double conversion, so Spark and the oracle
    perform the identical two IEEE ops (decimal division rules differ
    between engines — doubles don't).
    The (38,6) rescale is load-bearing (r14 review): ``_disc()`` is a
    SCALE-8 decimal, so a direct decimal→double cast of its sum stays a
    single correctly-rounded division only while the unscaled value is
    ≤ 2^53 — about $90 M of month-filtered revenue, a wall real scale
    factors already pass — after which Spark's double-rounding can land
    1 ulp off DuckDB. The expression carries ≤4 real decimal digits, so
    the rescale to scale 6 is lossless at any corpus size."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    disc_cv = _disc_cv()
    promo_cv = F.when(F.col("p_type") == "PROMO", disc_cv).otherwise(F.lit(0).cast("long"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * dsum_limbs(promo_cv, 10**4) / dsum_limbs(disc_cv, 10**4))
            .alias("promo_revenue_pct")
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey, CAST(SUM({_DISC}) AS DECIMAL(38,6)) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE rev = (SELECT MAX(rev) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max over a derived aggregate (TPC-H Q15 shape: the ``revenue`` view +
    top-supplier probe). The view is one pruned fact scan + one suppkey
    shuffle. The global max is a 1-row ``agg(F.max)`` broadcast back onto the
    distributed per-supplier aggregate — NOT an unpartitioned window, which
    would funnel the whole post-aggregate (supplier cardinality: ~10⁷ rows at
    100 TB TPC-H scaling) through a single partition. The two plan branches
    share the aggregate's shuffle at runtime: AQE injects ReusedExchange for
    the canonical-identical subtree, so the fact is scanned once (verified on
    the executed plan — static planning shows two scans, the adaptive plan
    reuses). The max-equality compare happens on exact decimal(38,6) sums, so
    the tie set is identical in both engines; revenue is cast to double only
    for output."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(F.sum(_disc()).cast("decimal(38,6)").alias("__rev"))
    mx = rev.agg(F.max("__rev").alias("__max_rev"))
    best = (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("__rev") == F.col("__max_rev"))
        .select("l_suppkey", "__rev")
    )
    return (
        s.join(F.broadcast(best), s.s_suppkey == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", F.col("__rev").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "q19_disjunctive_filter",
    oracle=f"""
    SELECT {sql_dsum_exact(_DISC)} AS revenue, COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#13' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#20' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#9' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive multi-branch predicate spanning both join sides (TPC-H
    Q19 shape): Catalyst extracts the common l_partkey equi-key so the join
    stays a hash join with the OR as a residual filter."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#13") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#20") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#9") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(cond)
        .agg(_dsum_disc().alias("revenue"), F.count("*").alias("n"))
    )


@register(
    "q18_large_orders",
    oracle=f"""
    SELECT c_name, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate, o_totalprice,
           {sql_dsum('l_quantity')} AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(8,2))) > 150)
    GROUP BY c_name, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery over an aggregate (TPC-H Q18 shape) as a semi-join
    against the aggregated key set — the two lineitem scans share the
    shuffle key, and the final top-k is TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(8,2)")).alias("__q"))
        .where(F.col("__q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_totalprice",
        )
        .agg(dsum("l_quantity").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "q22_global_avg_anti",
    oracle="""
    WITH s AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(8,2))) AS t, COUNT(*) AS n
               FROM customer WHERE c_acctbal > 0.0)
    SELECT c_mktsegment, COUNT(*) AS n_custs,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(8,2))) AS DOUBLE) AS total_bal
    FROM customer c, s
    WHERE CAST(c_acctbal AS DECIMAL(8,2)) * s.n > s.t
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q22_global_avg_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery + anti join (TPC-H Q22 shape): the global average is
    a broadcast 1-row aggregate; customers-without-a-large-order is a
    left-anti join — no correlated per-row subquery execution anywhere.
    The above-average predicate is the exact integer-cross-multiplication
    form (bal·n > sum, both decimal) — comparing against a double AVG
    threshold would be partial-aggregation-order-sensitive at the ulp
    boundary, the float-threshold class the house numerics rules ban."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    stats = c.where(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(8,2)")).alias("__sum"),
        F.count("*").alias("__n"),
    )
    return (
        c.crossJoin(F.broadcast(stats))
        .where(F.col("c_acctbal").cast("decimal(8,2)") * F.col("__n") > F.col("__sum"))
        .join(o.where(F.col("o_totalprice") > 300000.0), c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_custs"),
            F.sum(F.col("c_acctbal").cast("decimal(8,2)")).cast("double").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact-fact join via bucketing (operators/scale.py): both
    sides written bucketBy(o_orderkey) once, then the join itself plans with
    NO Exchange — the pre-shuffled layout every repeatedly-joined 100 TB
    fact table should have. The write happens into a per-call temp database;
    results equal the plain join (the oracle)."""
    from flusher_spark.operators.scale import bucketed_join, write_bucketed

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    # Deterministic per-sf names + overwrite mode → re-runs reuse, never leak.
    suffix = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    to, tl = f"bo_{suffix}", f"bl_{suffix}"
    write_bucketed(o, to, "o_orderkey", buckets=8)
    write_bucketed(l, tl, "o_orderkey", buckets=8)
    out = (
        bucketed_join(spark, to, tl, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(8,2)")).cast("double").alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )
    return out


# ---------------------------------------------------------------------------
# TPC-H hard plan shapes, round 2: correlated subqueries, multi-fact join
# trees, global-scalar filters, nested semi/anti joins. The fixtures carry no
# partsupp table and no commit/receipt dates, so each query keeps the
# *shape* (what stresses the planner) re-keyed onto the available columns;
# the classic TPC-H number is noted per entry.
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
    FROM supply JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_size BETWEEN 1 AND 15 AND p_type = 'LARGE'
      AND cost = (SELECT MIN(s2.cost) FROM supply s2 WHERE s2.l_partkey = supply.l_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-per-group correlated subquery (TPC-H Q2 shape; lineitem stands in
    for partsupp as the part↔supplier link). Decorrelated as one aggregate
    plus an unordered per-part window min — never a per-row subquery. MIN
    over doubles is exact (no arithmetic), so the equality filter against
    the window min matches the oracle bit-for-bit."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_size").between(1, 15) & (F.col("p_type") == "LARGE")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    # The correlated min is PER PART, so restricting supply to the filtered
    # parts up front (broadcast semi-join before the aggregate) is
    # semantically identical — the subquery is only ever evaluated for those
    # parts — and shrinks the agg+window shuffles by the part-filter
    # selectivity (same decorrelation-pushdown as q17).
    pkeys = p.select("p_partkey")
    supply = (
        l.join(F.broadcast(pkeys), l.l_partkey == pkeys.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("cost"))
    )
    # Per-part minimum as an unordered window over supply, NOT a second
    # aggregate joined back: one lineitem scan and one partkey shuffle
    # instead of two scans + a double-equality join (Spark 4 doesn't reuse
    # the agg exchange across those branches — verified on the executed
    # plan), and it degrades gracefully when parts outgrow a broadcast.
    min_w = Window.partitionBy("l_partkey")
    return (
        supply.withColumn("__min_cost", F.min("cost").over(min_w))
        .where(F.col("cost") == F.col("__min_cost"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q7_nation_trade_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l_shipdate) AS INT) AS l_year,
           {sql_dsum_exact(_DISC)} AS revenue
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_1','NATION_2','NATION_3')
      AND n2.n_name IN ('NATION_1','NATION_2','NATION_3')
      AND n1.n_name <> n2.n_name
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume between nation sets by year (TPC-H Q7 shape):
    the same dimension joined twice under different roles. Both nation legs
    are filtered *before* broadcast so supplier/customer prune early; the
    cross-role inequality is a residual on already-joined rows (never a
    nested loop). Fact-fact shuffle is on the order key only."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    picked = ("NATION_1", "NATION_2", "NATION_3")
    n1 = n.where(F.col("n_name").isin(*picked)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.where(F.col("n_name").isin(*picked)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(_dsum_disc().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           100.0 * {sql_dsum_exact("CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(13,4)) END")}
                 / {sql_dsum_exact("volume")} AS mkt_share_pct
    FROM (SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year, {_DISC} AS volume, n2.n_name AS nation
          FROM lineitem JOIN part ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
            AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01') t
    GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share within a region (TPC-H Q8 shape): the deepest
    join tree in the catalog — two facts plus four dimension legs, nation in
    two roles. Market-share ratio follows the q14 discipline: both sums stay
    decimal until a single double division per group."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), "n_regionkey")
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    vol_cv = _disc_cv()
    in_nation_cv = F.when(F.col("nation") == "NATION_3", vol_cv).otherwise(
        F.lit(0).cast("long")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            # dsum_limbs surfaces each exact sum through the same
            # decimal(38,6)→double conversion as dsum_exact (the q14
            # r14-review precision fix applied to the same ratio
            # discipline), with the per-row work in codegen'd longs.
            (F.lit(100.0) * dsum_limbs(in_nation_cv, 10**4) / dsum_limbs(vol_cv, 10**4))
            .alias("mkt_share_pct")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, {sql_dsum_exact('amount')} AS sum_profit
    FROM (SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
                 {_DISC} - CAST(p_retailprice AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(12,4)) AS amount
          FROM lineitem JOIN part ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%bolt%') t
    GROUP BY nation, o_year ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation and year over a name-pattern part filter
    (TPC-H Q9 shape; retail cost stands in for ps_supplycost). amount =
    disc_price − retail_cost stays exact end-to-end: the long-limb form
    carries the same ≤4-real-decimal-digit integer value (negative profits
    split cleanly — arithmetic shiftright floors, the low limb stays
    non-negative, see num.dsum_limbs); the part filter broadcasts, the two
    facts shuffle once on the order key."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    # amount as an exact long at 1e-4 scale: retail·qty carries 2 real
    # decimals (l_quantity is integral by generation), so its 1e-4-unscaled
    # form is retail-in-hundredths · qty · 100.
    amount_cv = _disc_cv() - money_long("p_retailprice") * F.round(
        F.col("l_quantity")
    ).cast("long") * F.lit(100)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum_limbs(amount_cv, 10**4).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q11_important_parts",
    oracle=f"""
    WITH base AS (
      SELECT l_partkey, {_DISC} AS v
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5'))
    SELECT l_partkey, CAST(CAST(SUM(v) AS DECIMAL(38,6)) AS DOUBLE) AS value
    FROM base GROUP BY l_partkey
    HAVING CAST(CAST(SUM(v) AS DECIMAL(38,6)) AS DOUBLE) >
           (SELECT CAST(CAST(SUM(v) AS DECIMAL(38,6)) AS DOUBLE) FROM base) * CAST(0.001 AS DOUBLE)
    ORDER BY value DESC, l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group filter against a global scalar (TPC-H Q11 shape): per-part value
    vs a fraction of the grand total. The total is re-aggregated from the
    per-group decimal sums (exact — decimal addition is associative), so the
    grand total is a 1-row broadcast and the base is scanned once per branch
    with no driver-side collect. Threshold comparison is a single IEEE
    multiply per side, identical in both engines."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5")
    )
    supp_keys = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi").select(
        "s_suppkey"
    )
    base = l.join(F.broadcast(supp_keys), l.l_suppkey == F.col("s_suppkey"), "left_semi")
    val = base.groupBy("l_partkey").agg(
        F.sum(_disc()).cast("decimal(38,6)").alias("__value_dec")
    )
    tot = val.agg(F.sum("__value_dec").cast("decimal(38,6)").cast("double").alias("__total"))
    return (
        val.crossJoin(F.broadcast(tot))
        .where(F.col("__value_dec").cast("double") > F.col("__total") * F.lit(0.001))
        .select("l_partkey", F.col("__value_dec").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DECIMAL(38,6)) AS DOUBLE) / 7.0
             AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
      AND l_quantity < (SELECT CAST(0.2 AS DOUBLE) * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key correlated scalar (TPC-H Q17 shape): rows below 20% of their
    part's average quantity. Decorrelated as an unordered per-part window
    average — computed only over lineitems of the *filtered* parts
    (semantically identical: the subquery is only evaluated for those
    parts), so one pruned scan serves both the predicate and the revenue
    sum. Quantities are integer-valued doubles, so the plain double average
    is exact and order-insensitive in both engines."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    pkeys = p.select("p_partkey")
    relevant = l.join(F.broadcast(pkeys), l.l_partkey == pkeys.p_partkey, "left_semi")
    # The correlated scalar as an unordered window — one scan + one partkey
    # shuffle, instead of aggregating a second scan and joining it back.
    avg_q = F.avg("l_quantity").over(Window.partitionBy("l_partkey"))
    return (
        relevant.withColumn("__avg_q", avg_q)
        .where(F.col("l_quantity") < F.lit(0.2) * F.col("__avg_q"))
        .agg(
            (
                F.sum(dec("l_extendedprice")).cast("decimal(38,6)").cast("double") / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q20_qualified_suppliers",
    oracle="""
    SELECT s_name, n_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(8,2))) > 50)
    ORDER BY s_name
    """,
)
def q20_qualified_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested IN-subqueries (TPC-H Q20 shape): suppliers who moved >50 units
    of any red part in 1996. Both IN levels become semi-joins — the part
    filter broadcasts into the lineitem scan, the HAVING is a partial-agg
    shuffle on (suppkey, partkey), and the supplier probe is a second
    semi-join. No distinct needed anywhere: semi-join semantics dedup for
    free."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    qualified = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(8,2)")).alias("__qty"))
        .where(F.col("__qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(qualified, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "q21_sole_flagged_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait FROM lineitem l1
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
    """,
)
def q21_sole_flagged_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + NOT EXISTS over the same fact (TPC-H Q21 shape, returnflag
    standing in for the late-delivery dates): suppliers who were the *only*
    flagged supplier in a multi-supplier finalized order. Plans as a semi
    join then an anti join, both equi on the order key with the supplier
    inequality as a hash-join residual — three lineitem legs all sharing one
    shuffle key, then a broadcast supplier lookup and a tiny top-k."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    l1 = l.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l2 = l.select(F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey"))
    l3 = l.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    return (
        l1.join(o, l1.l_orderkey == o.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Streaming execution entries: the stateful operators and the stream-stream
# join RUN AS STREAMS here — a staged file micro-batch source driven to
# completion inside the entry — so the correctness harness checks actual
# streaming execution, not just the batch twins above.
# ---------------------------------------------------------------------------

_STREAM_STAGE_CACHE: dict[tuple, str] = {}


@_contextmanager
def _stream_shuffle_partitions(spark: SparkSession, partitions: int = 8):
    """Shuffle partitions sized to streaming state volume for ONE bounded
    stream run, restored afterwards: every stateful micro-batch
    instantiates one state store per shuffle partition, so the
    session-wide 32 would pay 4× the store setup for fixture-sized state.
    (A real deployment sizes this per query the same way — state
    partitioning is fixed at first checkpoint.) ONE copy of the
    save/set/restore dance — _run_stream_entry and the foreachBatch
    entries share it (r14 review; events_stream_upsert_latest used to
    hand-roll it)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _run_stream_entry(spark: SparkSession, build, name: str, mode: str, partitions: int = 8):
    """Drive a bounded stream to completion under _stream_shuffle_partitions
    and return its memory-sink table."""
    from flusher_spark.streaming.windows import run_stream_to_memory

    with _stream_shuffle_partitions(spark, partitions):
        q = run_stream_to_memory(build(), name, mode)
        q.stop()
    return spark.table(name)


def _stage_event_stream(
    spark: SparkSession,
    sf_dir: str,
    n_files: int = 4,
    dup: bool = False,
    sentinel: bool = False,
) -> str:
    """Split events.parquet into ``n_files`` time-ordered files (one per
    micro-batch under maxFilesPerTrigger=1) with increasing mtimes, so the
    file source replays them chronologically and watermarks only ever
    advance. ``dup=True`` doubles every row *within its file* — duplicate
    pairs always share a batch, so first-seen output is batch-split
    independent. Exact ts percentiles are three longs to the driver (a
    100 TB deployment would use approxQuantile; the boundary choice only
    shapes batches, not results)."""
    import glob as _glob
    import shutil
    import time as _time

    from flusher_spark.io.tables import normalize_event_ts

    # The cache key carries the fixture's mtime stamp — the same staleness
    # guard as plans/llm.py::_scratch_index (r9 advisor): a fixture
    # regenerated mid-process must invalidate the staged files, or a stale
    # staging would silently answer for the new data.
    try:
        stamp = int(os.stat(os.path.join(sf_dir, "events.parquet")).st_mtime_ns)
    except OSError:
        stamp = -1
    key = (sf_dir, n_files, dup, sentinel, stamp)
    cached = _STREAM_STAGE_CACHE.get(key)
    if cached and os.path.isdir(cached):
        return cached
    # Evict any superseded stamp for the same logical key NOW: a fixture
    # regenerated mid-process would otherwise orphan the old-stamp staging
    # until exit (its atexit hook still fires, but the dict entry is dead
    # weight and the dir lingers for the rest of the run — r12 review).
    for k in [k for k in _STREAM_STAGE_CACHE if k[:4] == key[:4]]:
        shutil.rmtree(_STREAM_STAGE_CACHE.pop(k), ignore_errors=True)
    # Stage files with ts already canonicalized to TIMESTAMP (io/tables.py):
    # the stream reader's footer probe then sees one encoding regardless of
    # which testdata generation (INT64-ns vs timestamp[us]) is on disk.
    raw = normalize_event_ts(spark.read.parquet(os.path.join(sf_dir, "events.parquet")))
    fracs = [i / n_files for i in range(1, n_files)]
    cuts = raw.select(
        F.expr(f"percentile(unix_micros(ts), array({','.join(map(str, fracs))}))")
    ).first()[0]
    bounds = [None, *cuts, None]
    out = tempfile.mkdtemp(prefix="flusher_stream_")
    # Same end-of-process cleanup as plans/llm.py::_scratch_index — without
    # it every process left one staged events copy per key in /tmp forever
    # (r12 review).
    import atexit

    atexit.register(shutil.rmtree, out, ignore_errors=True)
    base = _time.time() - 3600
    for i in range(n_files):
        part = raw
        if bounds[i] is not None:
            part = part.where(F.unix_micros(F.col("ts")) > bounds[i])
        if bounds[i + 1] is not None:
            part = part.where(F.unix_micros(F.col("ts")) <= bounds[i + 1])
        if dup:
            part = part.unionAll(part)
        stage = os.path.join(out, f"_stage{i}")
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        src = _glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(out, f"{i:04d}.parquet")
        os.replace(src, dst)
        shutil.rmtree(stage)
        os.utime(dst, (base + i, base + i))
    if sentinel:
        # A final watermark-flush file: one purchase + one view for the
        # impossible user -1, timestamped far past every real event. Outer
        # stream-stream joins only emit their NULL rows once the global
        # watermark proves no match can still arrive; on a bounded stream
        # the watermark stalls at max_real_ts - delay, stranding every
        # late purchase's NULL row in state. The sentinel rows advance
        # BOTH sides' watermarks past max_real_ts (then get filtered out
        # of the result by user_id >= 0), so the bounded run emits the
        # complete batch-left-join answer. Production streams don't need
        # this — their watermark keeps moving with live traffic.
        far = raw.agg(
            (F.max(F.unix_micros(F.col("ts"))) + 36_000_000_000).alias("us")
        ).first()["us"]
        sent = spark.createDataFrame(
            [(-1, -1, "purchase", 0.0, "{}"), (-2, -1, "view", 0.0, "{}")],
            "event_id long, user_id long, event_type string, value double, props string",
        ).select(
            "event_id",
            F.timestamp_micros(F.lit(far)).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        stage = os.path.join(out, "_stage_sentinel")
        sent.coalesce(1).write.mode("overwrite").parquet(stage)
        src = _glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(out, f"{n_files:04d}.parquet")
        os.replace(src, dst)
        shutil.rmtree(stage)
        os.utime(dst, (base + n_files, base + n_files))
    _STREAM_STAGE_CACHE[key] = out
    return out


@register(
    "events_stateful_running_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value
    FROM events GROUP BY user_id
    """,
)
def events_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState EXECUTED as a stream (streaming/stateful.py
    running_user_totals): four micro-batches through the state store, then
    the final lifetime totals per user — n_events and max_value are
    monotone, so the last emission equals the batch aggregate regardless of
    how files split into batches, and the oracle is the plain batch groupBy.
    (sum_value is excluded by design: float accumulation order across
    batches is not comparable bit-for-bit.)"""
    from flusher_spark.streaming.stateful import running_user_totals
    from flusher_spark.streaming.windows import stream_events

    path = _stage_event_stream(spark, sf_dir)
    totals = _run_stream_entry(
        spark,
        lambda: running_user_totals(stream_events(spark, path)),
        "cat_running_totals",
        "update",
    )
    return (
        totals
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("max_value").alias("max_value"))
    )


@register(
    "events_stateful_dedup_first",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events WHERE user_id % 5 = 0
    """,
)
def events_stateful_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-dedup EXECUTED as a stream (streaming/stateful.py
    streaming_dedup_first_seen): every event is fed TWICE (duplicates share
    a batch by construction), the state store admits exactly one row per
    event_id, and the surviving set must equal the original table — the
    exactly-once ingestion guard, oracle-checked end to end. The stream is
    bounded to a 1-in-5 user slice: applyInPandasWithState pays a per-key
    pandas call, and per-EVENT keys make the unsliced fixture run ~17 s in
    the harness for no extra semantic coverage (state behavior is identical
    per key)."""
    from flusher_spark.streaming.stateful import streaming_dedup_first_seen
    from flusher_spark.streaming.windows import stream_events

    path = _stage_event_stream(spark, sf_dir, dup=True)
    stream = stream_events(spark, path).where(F.col("user_id") % 5 == 0)
    # The operator passes the FULL input schema through; this entry's oracle
    # pins the 4-column projection, applied on the streaming result.
    return _run_stream_entry(
        spark,
        lambda: streaming_dedup_first_seen(stream).select(
            "event_id", "user_id", "event_type", "value"
        ),
        "cat_first_seen",
        "update",
    )


@register(
    "events_stream_dedup_native",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
)
def events_stream_dedup_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-dedup via Spark's BUILT-IN stateful operator: the
    idiomatic 100 TB path next to the applyInPandasWithState demo
    (events_stateful_dedup_first). ``dropDuplicates`` on a stream keeps its
    key set in the JVM state store — no Python worker, no per-key pandas
    call — so the FULL doubled event stream dedups in one pass with no
    user-slice concession. State here is UNBOUNDED (every key kept
    forever); the production watermark-evicted form runs as its own entry,
    events_stream_dedup_watermarked. The bounded catalog stream completes
    before eviction matters, so the surviving set equals the original
    table exactly (full oracle)."""
    from flusher_spark.streaming.windows import stream_events

    path = _stage_event_stream(spark, sf_dir, dup=True)
    stream = stream_events(spark, path).select("event_id", "user_id", "event_type", "value")
    return _run_stream_entry(
        spark, lambda: stream.dropDuplicates(["event_id"]), "cat_native_dedup", "append"
    )


@register(
    "events_stream_dedup_watermarked",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
)
def events_stream_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with BOUNDED state: ``withWatermark`` +
    ``dropDuplicatesWithinWatermark`` — the production form of
    events_stream_dedup_native, which its docstring names but the catalog
    never executed. Plain dropDuplicates keeps every key seen FOREVER (state
    grows with the stream — unusable for an unbounded 100 TB ingest);
    WithinWatermark evicts a key's marker once the watermark passes its
    event time + delay, so state is bounded by the duplicate-arrival window
    (here 2 hours) regardless of stream length. Duplicates are staged to
    share a micro-batch (dup=True), so every replay lands inside the
    watermark and the surviving set equals the original table exactly —
    the same full oracle as the unbounded twin, now with eviction on."""
    from flusher_spark.streaming.windows import stream_events

    path = _stage_event_stream(spark, sf_dir, dup=True)
    stream = stream_events(spark, path).select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    return _run_stream_entry(
        spark,
        lambda: stream.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
        .drop("ts"),
        "cat_wm_dedup",
        "append",
    )


@register(
    "events_stream_stream_join",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'),
    v AS (
      SELECT event_id AS view_id, user_id, ts AS view_ts
      FROM events WHERE event_type = 'view')
    SELECT purchase_id, user_id, purchase_ts, view_id, view_ts
    FROM p JOIN v USING (user_id)
    WHERE view_ts <= purchase_ts AND view_ts >= purchase_ts - INTERVAL 1 HOUR
    """,
)
def events_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join EXECUTED as a stream
    (streaming/joins.py join_purchases_to_views): purchases ⋈ prior views
    within 1 hour, both sides buffering watermark-bounded state across four
    chronological micro-batches.

    Full batch-SQL oracle: INNER stream-stream joins emit each pair in the
    micro-batch where both sides are present (watermarks bound STATE, not
    emission — only outer-join NULLs wait for the watermark), and the staged
    source replays files chronologically, so a view is never evicted before
    its last matchable purchase (eviction needs watermark > view_ts + 1 h,
    watermark lags max event time by 2 h, and matchable purchases are ≤ 1 h
    ahead of the view). The bounded stream therefore emits exactly the batch
    interval-join pair set — asserted pairwise in tests/test_streaming.py
    and hash-checked against DuckDB here."""
    from flusher_spark.streaming.joins import join_purchases_to_views
    from flusher_spark.streaming.windows import stream_events

    path = _stage_event_stream(spark, sf_dir)
    return _run_stream_entry(
        spark,
        lambda: join_purchases_to_views(stream_events(spark, path)),
        "cat_ss_join",
        "append",
    )


@register(
    "events_stream_stream_left_join",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'),
    v AS (
      SELECT event_id AS view_id, user_id, ts AS view_ts
      FROM events WHERE event_type = 'view')
    SELECT p.purchase_id, p.user_id, p.purchase_ts, v.view_id, v.view_ts
    FROM p LEFT JOIN v
      ON p.user_id = v.user_id
     AND v.view_ts <= p.purchase_ts
     AND v.view_ts >= p.purchase_ts - INTERVAL 1 HOUR
    """,
)
def events_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER watermarked stream-stream join executed as a stream
    (streaming/joins.py join_purchases_to_views_left): the outer twin of
    events_stream_stream_join, covering the semantics inner joins never
    exercise — NULL rows for match-less purchases, emitted only after the
    global watermark proves the match window closed. Bounded-stream
    completeness comes from a sentinel flush file (_stage_event_stream
    sentinel=True: far-future purchase+view for user -1 advance both
    watermarks past every real event, then the user filter drops them), so
    the stream emits exactly the batch LEFT JOIN row set and the entry gets
    a full DuckDB hash oracle, not a rows-only waiver."""
    from flusher_spark.streaming.joins import join_purchases_to_views_left
    from flusher_spark.streaming.windows import stream_events

    path = _stage_event_stream(spark, sf_dir, sentinel=True)
    out = _run_stream_entry(
        spark,
        lambda: join_purchases_to_views_left(stream_events(spark, path)),
        "cat_ss_left_join",
        "append",
    )
    return out.where(F.col("user_id") >= 0)


@register(
    "events_stream_stream_full_join",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'),
    v AS (
      SELECT event_id AS view_id, user_id, ts AS view_ts
      FROM events WHERE event_type = 'view')
    SELECT p.purchase_id, COALESCE(p.user_id, v.user_id) AS user_id,
           p.purchase_ts, v.view_id, v.view_ts
    FROM p FULL JOIN v
      ON p.user_id = v.user_id
     AND v.view_ts <= p.purchase_ts
     AND v.view_ts >= p.purchase_ts - INTERVAL 1 HOUR
    """,
)
def events_stream_stream_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER watermarked stream-stream join executed as a stream
    (streaming/joins.py join_purchases_to_views_full) — the family's
    completion after inner and left: BOTH unmatched directions emit NULL
    rows, and the view-side NULLs are the subtle half (a view's
    no-purchase verdict requires the global watermark past view_ts +
    max_gap, since a claiming purchase may arrive up to an hour LATER —
    the mirror of the left join's logic, pointing forward in time).
    The sentinel flush file advances both watermarks past every real
    event so the bounded stream emits the exact batch FULL JOIN row set
    and the entry earns a full DuckDB hash oracle."""
    from flusher_spark.streaming.joins import join_purchases_to_views_full
    from flusher_spark.streaming.windows import stream_events

    path = _stage_event_stream(spark, sf_dir, sentinel=True)
    out = _run_stream_entry(
        spark,
        lambda: join_purchases_to_views_full(stream_events(spark, path)),
        "cat_ss_full_join",
        "append",
    )
    return out.where(F.col("user_id") >= 0)


@register(
    "events_stream_stream_right_join",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'),
    v AS (
      SELECT event_id AS view_id, user_id, ts AS view_ts
      FROM events WHERE event_type = 'view')
    SELECT p.purchase_id, v.user_id, p.purchase_ts, v.view_id, v.view_ts
    FROM p RIGHT JOIN v
      ON p.user_id = v.user_id
     AND v.view_ts <= p.purchase_ts
     AND v.view_ts >= p.purchase_ts - INTERVAL 1 HOUR
    """,
)
def events_stream_stream_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER watermarked stream-stream join executed as a stream
    (streaming/joins.py join_purchases_to_views_right) — the last missing
    orientation after inner/left/full: outer on the VIEW side, so every
    view emits, with NULL purchase columns if no purchase ever claims it.
    The view-side NULL is the forward-looking verdict (shared with the
    full join's view half): it flushes only when the global watermark
    passes view_ts + max_gap, since a claiming purchase may arrive up to
    an hour LATER. The sentinel flush file advances both watermarks past
    every real event so the bounded stream emits the exact batch RIGHT
    JOIN row set and the entry earns a full DuckDB hash oracle."""
    from flusher_spark.streaming.joins import join_purchases_to_views_right
    from flusher_spark.streaming.windows import stream_events

    path = _stage_event_stream(spark, sf_dir, sentinel=True)
    out = _run_stream_entry(
        spark,
        lambda: join_purchases_to_views_right(stream_events(spark, path)),
        "cat_ss_right_join",
        "append",
    )
    return out.where(F.col("user_id") >= 0)


@register(
    "join_salted_skew",
    oracle=f"""
    WITH skewed AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN CAST(1 AS BIGINT) ELSE user_id END AS skew_user,
             value
      FROM events),
    dim AS (
      SELECT user_id AS skew_user, user_id % 7 AS segment
      FROM (SELECT DISTINCT user_id FROM events))
    SELECT segment, COUNT(*) AS n_events, {sql_dsum('value')} AS sum_value
    FROM skewed JOIN dim USING (skew_user)
    GROUP BY segment ORDER BY segment
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join (operators/scale.py salted_join) on a pathologically
    skewed key: half of all events are remapped onto ONE user, the regime
    where an unsalted shuffle join puts 50% of the fact table in a single
    task. The salt splits that key across 8 sub-keys (deterministic row
    hash), the dim side replicates 8×, and the result is provably identical
    to the plain join — the oracle is the unsalted SQL. The dim carries a
    shuffle_hash hint because salting only matters when the build side is
    too big to broadcast; the hint reproduces that regime at fixture scale.
    Partition balance (hot key actually split) is asserted in
    tests/test_operators.py."""
    from flusher_spark.operators.scale import salted_join

    e = load_table(spark, sf_dir, "events")
    skewed = e.select(
        F.when(F.col("event_id") % 2 == 0, F.lit(1).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("skew_user"),
        "value",
    )
    dim = (
        e.select("user_id").distinct()
        .select(F.col("user_id").alias("skew_user"), (F.col("user_id") % 7).alias("segment"))
    )
    return (
        salted_join(skewed, dim.hint("shuffle_hash"), "skew_user")
        .groupBy("segment")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .orderBy("segment")
    )


@register(
    "q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type NOT IN ('PROMO','ECONOMY')
      AND p_size IN (1, 4, 9, 14, 19, 23)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count grouping + NOT IN exclusion (TPC-H Q16 shape, the last
    of the 22 classic plan shapes in the catalog; negative account balance
    stands in for the complaints filter). NOT IN over a non-null key is a
    left-anti join against the (tiny, broadcast) excluded-supplier set;
    COUNT(DISTINCT) is a two-level aggregate — Spark expands it to a
    distinct-then-count pair of hash aggregates sharing one shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").isin("PROMO", "ECONOMY")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23)
    )
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "events_funnel_conversion",
    oracle="""
    WITH s AS (SELECT user_id, MIN(ts) AS t0 FROM events WHERE event_type = 'signup' GROUP BY user_id),
    v AS (SELECT e.user_id, MIN(e.ts) AS t1 FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'view' AND e.ts > s.t0 GROUP BY e.user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
    SELECT CAST(1 AS INTEGER) AS stage_no, 'signup' AS stage, (SELECT COUNT(*) FROM s) AS n_users
    UNION ALL SELECT 2, 'view_after_signup', (SELECT COUNT(*) FROM v)
    UNION ALL SELECT 3, 'click_after_view', (SELECT COUNT(*) FROM c)
    UNION ALL SELECT 4, 'purchase_after_click', (SELECT COUNT(*) FROM p)
    ORDER BY stage_no
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (signup → view → click → purchase, each
    stage strictly after the user's previous stage time): a chain of
    per-stage min-aggregates joined on user_id — every stage reuses the
    same user-key shuffle, each stage's scan is type-filtered at the parquet
    level, and the four 1-row stage counts union (no scalar-subquery nested
    loops)."""
    e = load_table(spark, sf_dir, "events")

    def stage(prev: DataFrame, etype: str, prev_t: str, out_t: str) -> DataFrame:
        f = e.where(F.col("event_type") == etype).select("user_id", "ts")
        return (
            f.join(prev, "user_id")
            .where(F.col("ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_t))
        )

    s0 = (
        e.where(F.col("event_type") == "signup").groupBy("user_id").agg(F.min("ts").alias("t0"))
    )
    v = stage(s0, "view", "t0", "t1")
    c = stage(v, "click", "t1", "t2")
    p = stage(c, "purchase", "t2", "t3")
    parts = [
        (1, "signup", s0), (2, "view_after_signup", v),
        (3, "click_after_view", c), (4, "purchase_after_click", p),
    ]
    out = None
    for no, name, df in parts:
        row = df.agg(F.count("*").alias("n_users")).select(
            F.lit(no).cast("int").alias("stage_no"), F.lit(name).alias("stage"), "n_users"
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("stage_no")


@register(
    "events_funnel_single_scan",
    oracle="""
    WITH s AS (SELECT user_id, MIN(ts) AS t0 FROM events WHERE event_type = 'signup' GROUP BY user_id),
    v AS (SELECT e.user_id, MIN(e.ts) AS t1 FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'view' AND e.ts > s.t0 GROUP BY e.user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
    SELECT CAST(1 AS INTEGER) AS stage_no, 'signup' AS stage, (SELECT COUNT(*) FROM s) AS n_users
    UNION ALL SELECT 2, 'view_after_signup', (SELECT COUNT(*) FROM v)
    UNION ALL SELECT 3, 'click_after_view', (SELECT COUNT(*) FROM c)
    UNION ALL SELECT 4, 'purchase_after_click', (SELECT COUNT(*) FROM p)
    ORDER BY stage_no
    """,
)
def events_funnel_single_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME funnel as events_funnel_conversion, reformulated to read
    events ONCE: one type-pruned scan, one shuffle to the user key, then a
    per-user F.aggregate fold over each user's time-sorted events that
    walks the signup→view→click→purchase chain in order (an element can
    only advance the stage its type matches, and the strict ts > prev-stage
    comparisons make tie order irrelevant, so the fold is deterministic).
    At funnel depth d the chained form scans the fact d times and joins
    d-1 times; this form is depth-independent — the trade is a per-user
    in-memory event array, bounded by per-user activity (product-analytics
    cardinality, thousands not billions; a pathological user would need
    the sessionized variant). Oracle identical to the chained twin — both
    entries must hash to the same stage counts.

    Formulation audit (r6): the fold is an F.aggregate HOF, i.e.
    CodegenFallback — the r5 bench flagged this entry at 2.1× its r4 time
    and suspected interpreted eval. Measured head-to-head in one JVM at
    sf0.1 (median of 5 steady-state runs): this fold 0.40 s — exactly its
    r4 number — vs 0.66 s for the no-HOF alternative (four chained
    whole-partition window mins sharing one Exchange). The HOF walks each
    user's small array once inside a codegen'd aggregate stage; the window
    form pays four Window materializations of the full fact. The r5
    inflation was session-environment (uniform across 31 queries), not
    this plan — so the fold stays, and bench.py now reports steady-state
    medians to keep environment noise out of cross-round ratios."""
    e = load_table(spark, sf_dir, "events")
    ev = e.where(
        F.col("event_type").isin("signup", "view", "click", "purchase")
    ).select("user_id", "ts", "event_type")
    per = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_type"))).alias("evs")
    )
    nothing = F.lit(None).cast("timestamp")
    state0 = F.struct(
        nothing.alias("t0"), nothing.alias("t1"), nothing.alias("t2"), nothing.alias("t3")
    )

    def step(acc, x):
        def advance(slot, etype, prev):
            cond = (
                slot.isNull()
                & (x["event_type"] == etype)
                & (F.lit(True) if prev is None else prev.isNotNull() & (x["ts"] > prev))
            )
            return F.when(cond, x["ts"]).otherwise(slot)

        return F.struct(
            advance(acc["t0"], "signup", None).alias("t0"),
            advance(acc["t1"], "view", acc["t0"]).alias("t1"),
            advance(acc["t2"], "click", acc["t1"]).alias("t2"),
            advance(acc["t3"], "purchase", acc["t2"]).alias("t3"),
        )

    walked = per.select(F.aggregate("evs", state0, step).alias("st"))
    agg = walked.agg(
        *[
            F.sum(F.col(f"st.t{i}").isNotNull().cast("long")).alias(f"n{i + 1}")
            for i in range(4)
        ]
    )
    return agg.selectExpr(
        "stack(4, 1, 'signup', n1, 2, 'view_after_signup', n2,"
        " 3, 'click_after_view', n3, 4, 'purchase_after_click', n4)"
        " AS (stage_no, stage, n_users)"
    ).select(F.col("stage_no").cast("int"), "stage", "n_users").orderBy("stage_no")


@register(
    "events_retention_cohorts",
    oracle="""
    WITH first AS (
      SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS cohort_day
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS active_day FROM events)
    SELECT cohort_day, date_diff('day', cohort_day, active_day) AS day_offset,
           COUNT(*) AS n_users
    FROM activity JOIN first USING (user_id)
    WHERE date_diff('day', cohort_day, active_day) BETWEEN 0 AND 13
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (day-0 cohort × day offset, two weeks out):
    the classic product-analytics rollup. One (user, day) distinct and one
    per-user min both shuffle on user_id; the countDistinct is avoided by
    pre-distincting activity, so the final cell aggregate is a plain COUNT
    over already-unique (user, day) pairs. Nothing here holds state
    proportional to events — both intermediates are bounded by
    users × active-days."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("DAY", F.col("ts"))).alias("active_day")
    )
    first = e.groupBy("user_id").agg(F.min("active_day").alias("cohort_day"))
    activity = e.distinct()
    offset = F.datediff(F.col("active_day"), F.col("cohort_day"))
    return (
        activity.join(first, "user_id")
        .select("cohort_day", offset.alias("day_offset"))
        .where(F.col("day_offset").between(0, 13))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "events_resample_gapfill",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(CAST(SUM(CAST(value AS DECIMAL(8,2))) AS DECIMAL(38,6)) AS DOUBLE) AS value_sum
      FROM events GROUP BY event_type, date_trunc('hour', ts)),
    bounds AS (
      SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY event_type),
    spine AS (
      SELECT event_type, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds)
    SELECT s.event_type, s.hour,
           COALESCE(h.value_sum, 0.0) AS value_sum,
           LAST_VALUE(h.value_sum IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
           (h.value_sum IS NULL) AS gap_filled
    FROM spine s LEFT JOIN hourly h ON s.event_type = h.event_type AND s.hour = h.hour
    ORDER BY s.event_type, s.hour
    """,
)
def events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample to a dense hourly grid with zero-fill AND
    forward-fill: the spine is generated per event_type from that type's own
    [min, max] hour via sequence+explode (spine size is types × hours — a
    function of wall-clock span, not event volume, so it stays tiny at any
    SF), left-joined to the hourly aggregate, then forward-filled with an
    ignore-nulls last() window per type. Hour sums go through exact decimals
    so the zero-filled and forward-filled doubles are bit-identical across
    engines."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy("event_type", F.date_trunc("HOUR", F.col("ts")).alias("hour")).agg(
        F.sum(dec("value", "decimal(8,2)")).cast("decimal(38,6)").cast("double").alias("value_sum")
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))).alias("hour"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("value_sum"), F.lit(0.0)).alias("value_sum"),
            F.last("value_sum", ignorenulls=True).over(w).alias("value_ffill"),
            F.col("value_sum").isNull().alias("gap_filled"),
        )
        .orderBy("event_type", "hour")
    )


@register(
    "events_scd2_intervals",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events),
    changes AS (
      SELECT user_id, event_id, ts, event_type FROM marked
      WHERE prev_type IS NULL OR event_type <> prev_type)
    SELECT user_id, event_type AS status, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           (LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
    FROM changes ORDER BY user_id, valid_from, status
    """,
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from an event stream: collapse each
    user's event sequence to its status CHANGES (lag filter), then stamp
    [valid_from, valid_to) validity intervals with lead(), open-ended on the
    current row — the standard warehouse dimension-versioning op. Both
    windows partition by user_id and order by (ts, event_id) — the id
    tiebreak makes the interval set deterministic even under timestamp
    collisions — and reuse ONE user_id sort shuffle (same partitioning and
    ordering, so Spark plans a single Window node pair over one Exchange)."""
    e = load_table(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(wseq))
        .where(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", "event_id", "ts", "event_type")
    )
    return (
        changes.withColumn("valid_to", F.lead("ts").over(wseq))
        .select(
            "user_id",
            F.col("event_type").alias("status"),
            F.col("ts").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "status")
    )


@register(
    "events_zscore_outliers",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cv
      FROM events),
    stats AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(cv) AS HUGEINT) AS s1,
             CAST(SUM(cv * cv) AS HUGEINT) AS s2
      FROM v GROUP BY event_type)
    SELECT v.event_type, MIN(s.n) AS n,
           CAST(SUM(CASE WHEN 4 * CAST(s.n * v.cv - s.s1 AS HUGEINT)
                             * CAST(s.n * v.cv - s.s1 AS HUGEINT)
                             * CAST(s.n - 1 AS HUGEINT)
                           > 25 * CAST(s.n AS HUGEINT)
                                * (CAST(s.n AS HUGEINT) * s.s2 - s.s1 * s.s1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS outlier_cnt
    FROM v JOIN stats s USING (event_type)
    GROUP BY v.event_type ORDER BY v.event_type
    """,
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group anomaly flagging: |z| > 2.5 against the group's own
    mean/stddev, decided in EXACT integer arithmetic. value is a 2-decimal
    money-style column, so cv = 100*value is an exact integer; with
    n = count, s1 = SUM(cv), s2 = SUM(cv^2) the test

        |z| > 5/2  <=>  4*(n*cv - s1)^2*(n-1) > 25*n*(n*s2 - s1^2)

    (the /100 scale cancels on both sides). No sqrt, no doubles: the
    boundary cannot flip on engine-version FMA/rounding differences, which
    is exactly how the double formulation hash-mismatched in the round-3
    driver while passing locally (boundary gap was ~1.4e-4). Both engines
    evaluate END TO END in 128-bit-class exact types — Spark casts cv to
    decimal(38,0) BEFORE the sums (a long SUM would wrap silently at ~922
    rows of cv^2 terms at |value|=10^6), mirroring the oracle's HUGEINT
    sums. Headroom: the largest term is rhs ~ 25*n^3*cv_max^2; with
    |value| <= 10^6 (cv_max = 10^8) that stays inside 38 digits for n up
    to ~7e6 rows per group. Past that the repo's ANSI sessions (the
    Spark 4 default; session.py never disables it) RAISE
    NUMERIC_VALUE_OUT_OF_RANGE at the first overflowing multiply — loud
    by exception, verified empirically (r14 review: the earlier
    NULL-propagation design here was dead code — overflow-returns-NULL
    only exists under ``spark.sql.ansi.enabled=false``, which nothing in
    this repo runs). A scale-out would shard the group first anyway.
    Spark computes the
    moments as a partial-aggregated groupBy BROADCAST-joined back onto the
    rows (the oracle's join form exactly) — NOT as windows partitioned by
    event_type: with ~5 distinct types, a raw-row window funnels a fifth of
    the fact through each of 5 tasks (the low-cardinality-group hazard
    agg_exact_median_* documents), while the aggregate's 5-group reduce
    only ever carries one partial row per map task.

    Hot-path typing: Spark's decimal(38) SUM runs interpreted (measured 17×
    slower than a long SUM on this aggregate), so the per-row work stays in
    pure-long codegen: cv² is exact in a long (≤10¹⁶ < 2⁶³), summed as TWO
    wrap-safe limbs (high = cv²>>32, low = cv² & (2³²−1); the low limb is
    long-safe to ~2·10⁹ rows/group, high to ~4·10¹²).

    r15: the per-row COMPARE is pure long codegen too. The r14 form
    evaluated 4·dev²·(n−1) > rhs per row — three interpreted decimal(38)
    multiplies per event. The inequality is monotonic in |dev|, so it
    folds into one per-group integer THRESHOLD: with K = 4(n−1),
    R = 25n(n·s2 − s1²), and q = R div K,

        K·dev² > R  ⟺  dev² ≥ q+1  ⟺  |dev| ≥ isqrt(q)+1 =: t

    (integers: R/K ∈ [q, q+1) so dev² > R/K ⟺ dev² ≥ q+1; and
    min{a ≥ 0 : a² ≥ q+1} = isqrt(q)+1 — exact, including q+1 a perfect
    square). t is computed on the DRIVER with math.isqrt over exact Python
    integers from the per-group stats row — the bm25/codebook bounded-
    collect discipline; event_type is a domain-bounded enum (~5 rows), and
    the collect replaces the same 5-row broadcast the join form built
    in-plan. Per row the flag is now |n·cv − s1| ≥ t — one long multiply,
    subtract, abs, compare, all whole-stage codegen.

    Overflow contract (improved): the stats/threshold arithmetic runs in
    unbounded Python integers (the r14 decimal(38) rhs raised at ~7e6
    rows/group); the only in-plan products are n·cv per row and the limb
    sums, so ANSI now raises first at n·|cv| > 2⁶³ ≈ 9.2e10 rows/group at
    |value| ≤ 10⁶ — four orders more headroom, still loud-by-exception.
    Boundary exactness (dev² landing ON q or q+1, K dividing R exactly) is
    pinned by tests/test_operators.py::
    test_zscore_threshold_matches_decimal_reference_on_boundaries."""
    import math

    e = load_table(spark, sf_dir, "events")
    cv = (dec("value", "decimal(8,2)") * 100).cast("long")
    ev = e.select("event_type", cv.alias("cv"))
    sq = F.col("cv") * F.col("cv")
    srows = (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("cv").alias("s1"),
            F.sum(F.shiftright(sq, 32)).alias("s2q"),
            F.sum(sq.bitwiseAND(F.lit(4294967295))).alias("s2r"),
        )
        .collect()
    )
    lim = []
    for r in srows:
        n_g, s1_g = r["n"], (r["s1"] or 0)
        s2_g = ((r["s2q"] or 0) << 32) + (r["s2r"] or 0)
        if n_g >= 2:
            big_r = 25 * n_g * (n_g * s2_g - s1_g * s1_g)
            t_g = math.isqrt(big_r // (4 * (n_g - 1))) + 1
        else:
            # n==1: dev = cv − s1 = 0 and R = 0 — the test 0 > 0 is false,
            # so no row flags; any positive threshold encodes that.
            t_g = 1
        # Clamp to a long. |dev| = |n·cv − s1| ≤ 2⁶³ (past that the per-row
        # product raises under ANSI), so a threshold at 2⁶²—reachable only
        # when q ≥ ~2¹²⁴, i.e. groups far beyond the raise bound—flags
        # nothing, which is also what the exact t would do there.
        lim.append((r["event_type"], n_g, s1_g, min(t_g, 1 << 62)))
    stats = ev.sparkSession.createDataFrame(
        lim, "event_type string, n long, s1 long, t long"
    )
    j = ev.join(F.broadcast(stats), "event_type")
    dev = F.col("n") * F.col("cv") - F.col("s1")
    return (
        j.select(
            "event_type",
            F.col("n"),
            # otherwise(0), matching the oracle's ELSE 0: under ANSI a
            # per-row overflow raises before the WHEN evaluates, so there
            # is no NULL path to guard (r14 review — the prior two-WHEN +
            # count-guarded-sum NULL machinery was unreachable).
            F.when(F.abs(dev) >= F.col("t"), 1).otherwise(0).alias("f"),
        )
        .groupBy("event_type")
        .agg(F.min("n").alias("n"), F.sum("f").alias("outlier_cnt"))
        .orderBy("event_type")
    )


@register(
    "events_top_paths",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e2,
             LEAD(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e3
      FROM events),
    p AS (SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path, COUNT(*) AS n
          FROM s WHERE e3 IS NOT NULL GROUP BY path)
    SELECT path, n FROM p ORDER BY n DESC, path LIMIT 10
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event paths: the 10 most frequent 3-step behavioral sequences
    across all user streams — the path-analysis primitive behind funnel
    discovery (which journeys actually happen, before you pin a funnel to
    test). Sequences come from two LEADs over each user's (ts, event_id)-
    ordered stream — ONE user-key sort shuffle produces every overlapping
    trigram as a row-local projection (the event-stream twin of the token
    shingling in operators/dedup.py, same no-extra-shuffle reasoning) —
    then a partial-aggregated count and a TakeOrdered top-10 with a
    deterministic (count desc, path) tie-break. The event_id tiebreak in
    the ordering makes same-timestamp streams deterministic cross-engine.
    At 100 TB: trigram cardinality is |types|³ (bounded, here ≤125), so
    the count shuffle carries at most that many rows per map task."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        s.where(F.col("e3").isNotNull())
        .select(F.concat_ws(" > ", "event_type", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
    )


@register(
    "events_attribution_first_touch",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS t,
             CAST(json_extract(props, '$.k') AS BIGINT) % 4 AS ch,
             CAST(value AS DECIMAL(8,2)) AS val
      FROM events),
    a AS (
      SELECT *,
             MIN(CASE WHEN event_type = 'view' THEN t * 4 + ch END)
               OVER (PARTITION BY user_id ORDER BY t
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS fv
      FROM e)
    SELECT COALESCE(fv % 4, -1) AS channel,
           COUNT(*) AS n_purchases,
           CAST(SUM(val) AS DOUBLE) AS attributed_value
    FROM a WHERE event_type = 'purchase'
    GROUP BY channel ORDER BY channel
    """,
)
def events_attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each purchase is credited wholly to the
    EARLIEST view in the preceding hour of the same user's stream (channel
    = a deterministic campaign id derived from the event's JSON props);
    purchases with no qualifying view land in channel −1. Two techniques
    carry the entry: (1) the earliest-qualifying-event lookup is ONE
    range-frame window min over the user's time-ordered stream — no
    purchase×view self-join, so cost is one user-key sort shuffle
    regardless of fan-in (the same frame family as window_range_interval,
    here doing an analytics join's job); (2) the (ts, channel) argmin is
    ENCODED as the single long t·4+ch — min of the encoding is
    lexicographic (earliest ts, tie → lowest channel), decoded with %4 —
    keeping the window state one long instead of a struct and making the
    tie-break integer-exact in both engines. Partitioning is by user_id
    (high-cardinality — the safe side of the raw-row-window hazard the
    zscore entry documents). Credit sums are exact decimal; fractional
    multi-touch splits are the one shape this can't do exactly (rational
    credits with per-purchase denominators don't sum associatively in
    doubles) — last-touch lives in asof_purchase_last_view."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("t"),
        (F.get_json_object("props", "$.k").cast("long") % 4).alias("ch"),
        dec("value", "decimal(8,2)").alias("val"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-3600 * 1000 * 1000, Window.currentRow)
    )
    fv = F.min(
        F.when(F.col("event_type") == "view", F.col("t") * 4 + F.col("ch"))
    ).over(w)
    return (
        base.withColumn("fv", fv)
        .where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("fv") % 4, F.lit(-1)).alias("channel"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("val").cast("double").alias("attributed_value"),
        )
        .orderBy("channel")
    )


@register(
    "events_audience_overlap",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS users_both
    FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY type_a, type_b ORDER BY type_a, type_b
    """,
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact audience-overlap matrix: for every pair of event types, how
    many distinct users did BOTH — the set-intersection cardinality behind
    cohort targeting and funnel design. The oracle states the textbook
    formulation (distinct user×type self-joined on user), but the Spark
    plan deliberately avoids the self-join: one groupBy(user) collect_set
    (bounded — the type domain is categorical, ≤5 values), then a row-local
    double-explode of each user's type set into its ordered pairs, then a
    pair count. One user-key shuffle total, no join fan-out: the self-join
    form shuffles the distinct table twice and materializes (user × deg²)
    join rows; this shape carries each user's ≤C(5,2)=10 pair rows out of
    a single pass. At web scale (per-user set sizes in the hundreds) the
    same plan holds because the explode is quadratic only in the PER-USER
    degree, never in users."""
    e = load_table(spark, sf_dir, "events")
    sets = e.groupBy("user_id").agg(F.collect_set("event_type").alias("types"))
    pairs = (
        sets.select(F.explode("types").alias("type_a"), F.col("types"))
        .select("type_a", F.explode("types").alias("type_b"))
        .where(F.col("type_a") < F.col("type_b"))
    )
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(F.count("*").alias("users_both"))
        .orderBy("type_a", "type_b")
    )


@register(
    "agg_corr_exact",
    oracle="""
    WITH v AS (
      SELECT l_returnflag,
             CAST(CAST(l_quantity AS DECIMAL(8,2)) * 100 AS BIGINT) AS x,
             CAST(CAST(l_extendedprice AS DECIMAL(8,2)) * 100 AS BIGINT) AS y
      FROM lineitem),
    m AS (
      SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM v GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_qty_price
    FROM m ORDER BY l_returnflag
    """,
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from EXACT integer moments — the deterministic
    twin of F.corr, whose streaming-covariance implementation accumulates
    doubles in partition order and so drifts in the last bits between
    engines (and between runs with different partitioning). Here both
    columns are 2-decimal money-style values, so x=100·qty, y=100·price
    are exact longs; the five moments (Σx, Σy, Σxy, Σx², Σy²) accumulate
    as codegen'd LONG-LIMB sums (num.limb_sum_exact — the
    events_zscore_outliers split, applied per moment as that entry's
    docstring proposed) reassembled into exact decimal(38,0)/HUGEINT at
    the 3-group level, and only the final n·Σxy−ΣxΣy and variance terms
    are cast to double for one division and two correctly-rounded sqrts,
    evaluated in the SAME expression shape on both engines, making the
    correlation bit-stable. Limb headroom per group: x ≤ 5e3 sums in one
    plain long to ~1.8e15 rows; the 2-limb y/xy/x² splits are safe to
    ~8.8e12 rows; y² ≤ 1e16 takes the 3-limb split (same bound). ANSI
    sessions RAISE on a long-sum overflow past those — shard the group
    first, exactly as zscore documents."""
    l = load_table(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    v = l.select(
        "l_returnflag",
        (dec("l_quantity", "decimal(8,2)") * 100).cast("long").alias("x"),
        (dec("l_extendedprice", "decimal(8,2)") * 100).cast("long").alias("y"),
    )
    x, y = F.col("x"), F.col("y")
    m = v.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast(d38).alias("sx"),
        limb_sum_exact(y, 2).alias("sy"),
        limb_sum_exact(x * y, 2).alias("sxy"),
        limb_sum_exact(x * x, 2).alias("sxx"),
        limb_sum_exact(y * y, 3).alias("syy"),
    )
    nd = F.col("n").cast(d38)
    num = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = F.sqrt((nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    dy = F.sqrt((nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    # try_divide: a zero-variance group (constant qty or price) makes
    # dx·dy = 0, and under this repo's ANSI sessions double division by
    # zero RAISES (verified: both double and decimal raise on Spark 4.1) —
    # NULL matches the DuckDB oracle's x/0 and is IEEE-identical for every
    # nonzero denominator, so hashes are unaffected (r12 review).
    return m.select(
        "l_returnflag", "n", F.try_divide(num, dx * dy).alias("corr_qty_price")
    ).orderBy("l_returnflag")


@register(
    "events_winsorized_stats",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cv
      FROM events),
    tot AS (SELECT event_type, COUNT(*) AS n FROM v GROUP BY event_type),
    h AS (SELECT event_type, cv, COUNT(*) AS c FROM v GROUP BY event_type, cv),
    cum AS (SELECT event_type, cv,
                   SUM(c) OVER (PARTITION BY event_type ORDER BY cv) AS cum
            FROM h),
    th AS (SELECT cum.event_type,
                  MIN(CASE WHEN cum >= (n + 9) // 10 THEN cv END) AS lo_cv,
                  MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN cv END) AS hi_cv,
                  MIN(n) AS n
           FROM cum JOIN tot USING (event_type) GROUP BY cum.event_type)
    SELECT v.event_type, MIN(th.n) AS n,
           CAST(MIN(th.lo_cv) AS BIGINT) AS lo_cv,
           CAST(MIN(th.hi_cv) AS BIGINT) AS hi_cv,
           CAST(SUM(LEAST(GREATEST(v.cv, th.lo_cv), th.hi_cv)) AS BIGINT)
             AS winsorized_sum
    FROM v JOIN th USING (event_type)
    GROUP BY v.event_type ORDER BY v.event_type
    """,
)
def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (clamp to the exact [p10, p90]) — the robust
    aggregation step that keeps a handful of corrupt extreme rows from
    dominating a metric, decided ENTIRELY in integer arithmetic. value is a
    2-decimal money-style column, so cv = 100·value is an exact long; the
    percentile is NEAREST-RANK (k-th smallest, k = ceil(q·n) computed as
    integer div (q·n+9) div 10 — no 0.1·n double ever exists), so both
    engines select the same threshold from the same total order with no
    interpolation to drift.

    The rank selection never sorts raw rows: thresholds come from a VALUE
    HISTOGRAM — groupBy (type, cv) counts (partial-aggregated map-side),
    a running sum over the histogram (window over #distinct-values rows,
    bounded by the value domain — here ≤49 002 rows/group regardless of
    fact size, NOT the raw-row low-cardinality-window hazard the zscore
    docstring documents), and min-cv-where-cum≥k. The 5-row threshold
    table broadcasts back onto the fact for a codegen'd
    least(greatest(cv, lo), hi) clamp + long SUM — one fact scan, one
    histogram shuffle, one 5-group reduce. Headroom: cv ≤ 10⁸ keeps the
    clamped long sum exact to ~9·10¹⁰ rows/group; past that the sum moves
    to the two-limb split events_zscore_outliers already uses."""
    e = load_table(spark, sf_dir, "events")
    ev = e.select("event_type", (dec("value", "decimal(8,2)") * 100).cast("long").alias("cv"))
    # Group totals derive from the histogram (sum of counts), not a second
    # fact aggregate — the fact is scanned twice total: histogram + clamp.
    h = ev.groupBy("event_type", "cv").agg(F.count("*").alias("c")).localCheckpoint(
        eager=False
    )
    th = hist_nearest_ranks(
        h, "cv", "c", [("lo_cv", "(n + 9) div 10"), ("hi_cv", "(9 * n + 9) div 10")]
    )
    return (
        ev.join(F.broadcast(th), "event_type")
        .select(
            "event_type",
            "n",
            "lo_cv",
            "hi_cv",
            F.least(F.greatest(F.col("cv"), F.col("lo_cv")), F.col("hi_cv")).alias("w"),
        )
        .groupBy("event_type")
        .agg(
            F.min("n").alias("n"),
            F.min("lo_cv").alias("lo_cv"),
            F.min("hi_cv").alias("hi_cv"),
            F.sum("w").alias("winsorized_sum"),
        )
        .orderBy("event_type")
    )


@register(
    "events_minmax_norm_arrow",
    oracle="""
    WITH s AS (
      SELECT event_id, event_type, value,
             MIN(value) OVER (PARTITION BY event_type) AS mn,
             MAX(value) OVER (PARTITION BY event_type) AS mx
      FROM events)
    SELECT event_id, event_type,
           CASE WHEN mx = mn THEN CAST(0.0 AS DOUBLE)
                ELSE (value - mn) / (mx - mn) END AS v_norm
    FROM s
    """,
)
def events_minmax_norm_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max feature normalization via groupBy().applyInArrow —
    Spark 4's Arrow-NATIVE group API (zero pandas conversion; pyarrow.compute
    kernels on the shuffled group batches). This is the API-coverage twin of
    the pandas paths in operators/similarity.py: the normalization itself IS
    window-expressible (the oracle states that formulation, and it is the
    recommended plan when groups are unbounded — applyInArrow materializes
    one group per call, fine for bounded categorical groups like
    event_type, wrong for billion-row keys). Results hash-match the SQL
    window form exactly: min/max/subtract/divide are the same IEEE doubles
    in Arrow kernels, Spark, and DuckDB."""
    import pyarrow as pa
    import pyarrow.compute as pc

    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def norm(t: pa.Table) -> pa.Table:
        v = t.column("value")
        mn = pc.min(v).as_py()
        mx = pc.max(v).as_py()
        if mn is None:
            # All-null group: SQL's CASE WHEN mx = mn is NULL=NULL -> NULL,
            # so the window form emits NULL — match it, don't emit 0.0.
            out = pa.nulls(len(t), pa.float64())
        elif mx == mn:
            out = pa.array([0.0] * len(t), pa.float64())
        else:
            out = pc.divide(pc.subtract(v, mn), mx - mn)
        return pa.table(
            {"event_id": t.column("event_id"), "event_type": t.column("event_type"), "v_norm": out}
        )

    return e.groupBy("event_type").applyInArrow(
        norm, schema="event_id long, event_type string, v_norm double"
    )


@register(
    "agg_exact_median_ranked",
    oracle="""
    WITH r AS (
      SELECT l_returnflag, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem)
    SELECT l_returnflag, AVG(l_extendedprice) AS median_price, MIN(n) AS n
    FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_exact_median_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group median over HIGH-cardinality values with LOW-
    cardinality groups — the shape where a plain partitioned window is
    fatal at scale (3 returnflag groups ⇒ a third of a 100 TB fact per
    window task). Ranks come from operators/ranking.py's
    with_group_row_number: range-partition on (group, value, tiebreak) so
    each group spans many contiguous partitions, rank = local row_number +
    the group's broadcast per-partition prefix count. Group sizes join back
    from a 3-row broadcast aggregate; the middle element(s) are picked by
    integer arithmetic and averaged — the same ≤2-double mean the oracle
    computes, so results hash-match. For values with a domain-bounded
    distinct count, agg_exact_median_histogram is the cheaper plan; the
    constant-memory approximate twin is agg_approx_sketches'
    percentile_approx."""
    from flusher_spark.operators.ranking import with_group_row_number

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    ranked = with_group_row_number(
        l, ["l_returnflag"], ["l_extendedprice", "l_orderkey", "l_linenumber"], out="rn"
    )
    # Deliberately a SECOND scan, not with_group_row_number's totals_out:
    # riding the ranking pass's count table (built and MEASURED r15) was
    # 1.18× at fixture — the standalone scan+agg runs as an independent
    # job subtree OVERLAPPING the ranking sort under AQE, while totals_out
    # serializes the 3-row broadcast behind the checkpoint materialization
    # (the r14 multi-consumer-checkpoint lesson). At a scale where the
    # extra scan's I/O dominates the lost overlap, flip to
    # totals_out=[...]; the bit-equality is pinned by
    # test_group_row_number_totals_match_direct_count either way.
    sizes = l.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    return (
        ranked.join(F.broadcast(sizes), "l_returnflag")
        .where((F.col("rn") == F.expr("(n + 1) div 2")) | (F.col("rn") == F.expr("(n + 2) div 2")))
        .groupBy("l_returnflag")
        .agg(F.avg("l_extendedprice").alias("median_price"), F.min("n").alias("n"))
        .orderBy("l_returnflag")
    )


@register(
    "agg_exact_median_histogram",
    oracle="""
    WITH r AS (
      SELECT l_returnflag, l_quantity,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem)
    SELECT l_returnflag, AVG(l_quantity) AS median_qty, MIN(n) AS n
    FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_exact_median_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group median for DOMAIN-BOUNDED values (quantity: ≤50
    distinct regardless of row volume): aggregate a (group, value) count
    histogram — one partial-aggregated shuffle whose reduce side is groups ×
    distinct values — then locate the bucket(s) covering the middle rank(s)
    with a cumulative count over histogram rows. No raw row is ever sorted
    or windowed. The value at a given rank depends only on the sorted value
    multiset, so the oracle's row-ranked formulation picks the same values;
    the weighted bucket average reduces to the identical ≤2-double IEEE
    mean. Complements agg_exact_median_ranked (high-cardinality values)."""
    l = load_table(spark, sf_dir, "lineitem")
    h = l.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("c"))
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("l_returnflag")
    r = h.select(
        "l_returnflag", "l_quantity", "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wn).alias("n"),
    )
    k1, k2 = F.expr("(n + 1) div 2"), F.expr("(n + 2) div 2")
    lo = F.col("cum") - F.col("c")
    weight = ((lo < k1) & (k1 <= F.col("cum"))).cast("int") + (
        (lo < k2) & (k2 <= F.col("cum"))
    ).cast("int")
    return (
        r.select("l_returnflag", "l_quantity", "n", weight.alias("w"))
        .where(F.col("w") > 0)
        .groupBy("l_returnflag")
        .agg(
            (F.sum(F.col("l_quantity") * F.col("w")) / F.lit(2)).alias("median_qty"),
            F.min("n").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "events_stream_upsert_latest",
    oracle="""
    WITH r AS (SELECT user_id, event_id, event_type, value,
                      ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
               FROM events)
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           value AS last_value
    FROM r WHERE rn = 1
    """,
)
def events_stream_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE via foreachBatch EXECUTED as a stream: each
    micro-batch reduces to its per-user latest row (argmax on (ts, event_id)),
    merges with the previous keyed snapshot, and writes a NEW snapshot
    version (read-old/write-new — never overwrite-in-place, the same
    versioned-snapshot move Warehouse.compact uses). Per-key lexicographic
    max is associative, so the final snapshot equals the batch argmax no
    matter how files split into micro-batches — which is what makes the
    plain batch SQL above a valid oracle for a four-batch streaming run.

    Scale shape: each merge shuffles only (batch latest ∪ snapshot), both
    bounded by key cardinality, not event volume — the dimension-table CDC
    pattern. Fact-scale upserts take the append+compaction path
    (sinks/table.py) or a table format's MERGE instead. Ordering compares
    µs-truncated timestamps on both engines (epoch_us in the oracle,
    timestamp_micros in stream_events) so a ns-precision tie cannot pick
    different winners."""
    from flusher_spark.streaming.windows import stream_events

    path = _stage_event_stream(spark, sf_dir)
    # Deterministic per-sf root: the fixed batch count means v0..v3 are
    # rewritten in place (overwrite mode) on re-runs instead of a fresh
    # mkdtemp orphan per invocation. The returned plan reads the final
    # snapshot lazily, so the root must outlive this function.
    root = os.path.join(
        tempfile.gettempdir(),
        f"flusher_upsert_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    state: dict[str, str | None] = {"snap": None}

    def latest_per_user(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.col("__ts_us").desc(), F.col("last_event_id").desc()
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )

    def merge(batch: DataFrame, batch_id: int) -> None:
        inc = batch.select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            F.unix_micros("ts").alias("__ts_us"),
        )
        if state["snap"] is not None:
            inc = inc.unionByName(batch.sparkSession.read.parquet(state["snap"]))
        new_snap = os.path.join(root, f"v{batch_id}")
        latest_per_user(inc).write.mode("overwrite").parquet(new_snap)
        state["snap"] = new_snap

    with _stream_shuffle_partitions(spark):
        q = stream_events(spark, path).writeStream.foreachBatch(merge).start()
        q.processAllAvailable()
        q.stop()
    assert state["snap"] is not None
    return spark.read.parquet(state["snap"]).drop("__ts_us")


@register(
    "events_ewma_per_user",
    oracle="""
    WITH per AS (
      SELECT user_id, COUNT(*) AS n_events,
             list_transform(
               list_sort(list(struct_pack(ts := ts, eid := event_id,
                                          v := CAST(value AS DOUBLE)))),
               s -> s.v) AS vals
      FROM events GROUP BY user_id)
    SELECT user_id, n_events,
           list_reduce(vals, (acc, x) -> 0.5 * acc + 0.5 * x) AS ewma
    FROM per ORDER BY user_id
    """,
)
def events_ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average over the event stream
    — the classic recursive time-series signal NO window function can
    express (each output depends on the previous output, not a frame of
    inputs), so the only batch formulations are a fold or a self-join
    chain. Same shape as events_funnel_single_scan: one scan, one user-key
    shuffle, then a row-local F.aggregate fold over the user's time-sorted
    values, seeded with the first value and folding the rest — mirrored
    exactly by DuckDB's list_reduce (also a seed-with-first left fold).

    Exactness: alpha = 0.5 makes every step two exact halvings plus one
    correctly-rounded IEEE add, and both engines execute the identical
    operation sequence in the identical (ts, event_id)-sorted order — so
    the doubles hash bit-for-bit with no decimal machinery. Per-user event
    arrays are bounded by per-user activity (the funnel entry's documented
    caveat); the streaming twin of this operator is a stateful
    value-per-key processor (streaming/stateful.py)."""
    e = load_table(spark, sf_dir, "events")
    per = (
        e.select(
            "user_id", "ts", F.col("event_id").alias("eid"), F.col("value").cast("double").alias("v")
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sort_array(F.collect_list(F.struct("ts", "eid", "v"))).alias("evs"),
        )
    )
    ewma = F.expr(
        "aggregate(slice(transform(evs, s -> s.v), 2, size(evs) - 1), "
        "transform(evs, s -> s.v)[0], (acc, x) -> 0.5D * acc + 0.5D * x)"
    )
    return per.select("user_id", "n_events", ewma.alias("ewma")).orderBy("user_id")


@register(
    "scalar_variant_extract",
    oracle="""
    WITH x AS (
      SELECT event_type,
             CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k
      FROM events)
    SELECT event_type,
           CAST(SUM(CASE WHEN k >= 50 THEN k END) AS BIGINT) AS sum_big_k,
           CAST(SUM(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           CAST(MAX(k) AS BIGINT) AS max_k
    FROM x GROUP BY event_type ORDER BY event_type
    """,
)
def scalar_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type — the
    parse-once/extract-many successor to per-path get_json_object:
    ``parse_json`` decodes props into the binary variant encoding a single
    time, then every ``try_variant_get`` is a cheap binary probe instead of
    a fresh JSON parse (with N extraction paths the string-JSON plan parses
    each row N times — the cost that makes wide semi-structured scans at
    100 TB parse-bound). try_variant_get (vs variant_get) also makes
    missing/mistyped paths NULL instead of failing the job — the same
    quarantine-not-crash policy as the JSONL ingest entry. The oracle
    states the equivalent one-parse plan over DuckDB's JSON functions."""
    e = load_table(spark, sf_dir, "events")
    v = e.select("event_type", F.parse_json("props").alias("v"))
    k = F.try_variant_get("v", "$.k", "long")
    x = v.select("event_type", k.alias("k"))
    big = F.col("k") >= 50
    return (
        x.groupBy("event_type")
        .agg(
            F.sum(F.when(big, F.col("k"))).alias("sum_big_k"),
            F.sum(F.when(big, 1).otherwise(0)).alias("n_big"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_incremental_merge",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS order_cnt,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the materialized-view refresh
    pattern that makes daily rollups tractable at 100 TB. The pre-cutoff
    history is aggregated ONCE into a stored partial state — (count, exact
    decimal sum) per group, a commutative monoid — and written to the lake;
    each refresh then scans only the delta partitions, aggregates them to
    the same partial shape, and MERGES (union + re-aggregate: counts add,
    decimal sums add). The oracle is the full recompute over all of
    ``orders``, so the driver hash proves merge-of-parts == whole. At scale
    the stored state is #groups rows vs a multi-TB fact rescan per refresh;
    correctness rests on the partials being associative — which is exactly
    why the sum is carried as DECIMAL (exact, order-insensitive) and only
    surfaced as double at the end (plans/num.py discipline). The parquet
    roundtrip of the partial state is deliberate: it pins that the decimal
    schema survives storage, i.e. the MV can actually live in the lake."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01")
    partials = [
        F.count("*").alias("cnt"),
        F.sum(dec("o_totalprice", "decimal(8,2)")).alias("tp"),
    ]
    # Deterministic per-sf path + overwrite mode → re-runs reuse, never leak
    # (join_bucketed_colocated's discipline; mkdtemp grew a fresh orphan per
    # harness invocation).
    suffix = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(
        tempfile.gettempdir(), f"flusher_mv_{suffix}", "orders_priority_mv"
    )
    o.where(F.col("o_orderdate") < cutoff).groupBy("o_orderpriority").agg(
        *partials
    ).write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)
    delta = o.where(F.col("o_orderdate") >= cutoff).groupBy("o_orderpriority").agg(*partials)
    return (
        stored.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("cnt").alias("order_cnt"),
            F.sum("tp").cast("double").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "events_tz_local_days",
    oracle="""
    SELECT CAST(CAST(timezone('America/New_York', timezone('UTC', ts)) AS DATE)
                AS VARCHAR) AS local_date,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(8,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY local_date ORDER BY local_date
    """,
)
def events_tz_local_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone-correct daily rollup: events land in the LOCAL calendar day
    of America/New_York, not the UTC day — the difference every
    user-facing daily metric hinges on (a 23:30 UTC event belongs to the
    previous NY day; the UTC-day rollup misassigns ~21% of a uniform
    stream at UTC−5). Cross-engine this is a parity minefield worth
    pinning: both engines resolve the SAME IANA zone database rules —
    Spark via from_utc_timestamp (instant → zone wall clock), DuckDB via
    the two-step timezone('UTC', ts) → timestamptz instant, then
    timezone('America/New_York', …) → local naive — and the matching
    hashes prove the fixture's UTC-naive timestamps regroup identically.
    The conversion is a codegen'd per-row projection (no shuffle beyond
    the day aggregate); at 100 TB the only scale note is that local-day
    PARTITIONING of a lake should store the UTC instant and derive local
    days at query time exactly like this, because zone rules change and
    baked-in local days can't be re-derived."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.to_date(F.from_utc_timestamp("ts", "America/New_York")).cast("string").alias(
                "local_date"
            ),
            "value",
        )
        .groupBy("local_date")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value", "decimal(8,2)")).cast("double").alias("sum_value"),
        )
        .orderBy("local_date")
    )


@register(
    "events_anomaly_mad",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cv
      FROM events),
    tot AS (SELECT event_type, COUNT(*) AS n FROM v GROUP BY event_type),
    h1 AS (SELECT event_type, cv, COUNT(*) AS c FROM v GROUP BY event_type, cv),
    c1 AS (SELECT event_type, cv,
                  SUM(c) OVER (PARTITION BY event_type ORDER BY cv) AS cum
           FROM h1),
    med AS (SELECT c1.event_type,
                   MIN(CASE WHEN cum >= (n + 1) // 2 THEN cv END) AS med,
                   MIN(n) AS n
            FROM c1 JOIN tot USING (event_type) GROUP BY c1.event_type),
    d AS (SELECT v.event_type, ABS(v.cv - med.med) AS dev
          FROM v JOIN med USING (event_type)),
    h2 AS (SELECT event_type, dev, COUNT(*) AS c FROM d GROUP BY event_type, dev),
    c2 AS (SELECT event_type, dev,
                  SUM(c) OVER (PARTITION BY event_type ORDER BY dev) AS cum
           FROM h2),
    mad AS (SELECT c2.event_type,
                   MIN(CASE WHEN cum >= (n + 1) // 2 THEN dev END) AS mad
            FROM c2 JOIN med USING (event_type) GROUP BY c2.event_type)
    SELECT d.event_type, MIN(med.n) AS n,
           CAST(MIN(med.med) AS BIGINT) AS median_cv,
           CAST(MIN(mad.mad) AS BIGINT) AS mad_cv,
           CAST(SUM(CASE WHEN d.dev > 5 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS outlier_cnt
    FROM d JOIN mad USING (event_type) JOIN med USING (event_type)
    GROUP BY d.event_type ORDER BY d.event_type
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly flagging via MEDIAN ABSOLUTE DEVIATION — the
    breakdown-resistant twin of events_zscore_outliers: mean/stddev move
    with the outliers they are supposed to find (one corrupt 10⁶ row
    shifts every z-score), while median and MAD have a 50% breakdown
    point. Flag = |cv − median| > 5·MAD, decided entirely in integers:
    both the median and the MAD are NEAREST-RANK selections (k = (n+1)
    div 2) from VALUE HISTOGRAMS — the same histogram-running-sum trick
    as events_winsorized_stats, COMPOSED twice: pass one selects the
    per-group median from the value histogram, pass two builds the
    histogram of |cv − median| and selects ITS median. No doubles exist
    anywhere, so the flag boundary cannot flip between engines. Cost
    shape at 100 TB: two pruned fact scans (the second computes
    deviations against the broadcast 5-row median table), two
    histogram-sized shuffles, windows only over distinct values — never
    raw rows. MAD = 0 (over half the group at one value) degenerates to
    flagging any deviation, which is the standard and correct MAD
    behavior.

    Everything downstream of the two histograms derives FROM the
    histograms: group totals are the sum of histogram counts (not a third
    fact aggregate), and the final outlier count is a weighted sum over
    the deviation histogram (sum of c where dev > 5·MAD) — so the fact is
    scanned exactly twice, and each lazily-checkpointed histogram feeds
    its cumulative window, its rank selection, and the final reduce
    without replanning the scan (the same reuse discipline as the n-gram
    pair core)."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type", (dec("value", "decimal(8,2)") * 100).cast("long").alias("cv")
    )

    h1 = v.groupBy("event_type", "cv").agg(F.count("*").alias("c")).localCheckpoint(
        eager=False
    )
    # hist_nearest_ranks both times — the group total n rides the second
    # call's output (sum over the deviation histogram == sum over the value
    # histogram), so no separate totals aggregate is needed.
    med = hist_nearest_ranks(h1, "cv", "c", [("med", "(n + 1) div 2")]).select(
        "event_type", "med"
    )
    d = v.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("cv") - F.col("med")).alias("dev")
    )
    h2 = d.groupBy("event_type", "med", "dev").agg(F.count("*").alias("c")).localCheckpoint(
        eager=False
    )
    mad = hist_nearest_ranks(h2, "dev", "c", [("mad", "(n + 1) div 2")])
    return (
        h2.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("n").alias("n"),
            F.min("med").alias("median_cv"),
            F.min("mad").alias("mad_cv"),
            F.sum(F.when(F.col("dev") > 5 * F.col("mad"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("outlier_cnt"),
        )
        .orderBy("event_type")
    )


@register(
    "events_histogram_equiwidth",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cv
      FROM events),
    b AS (SELECT event_type, MIN(cv) AS lo, MAX(cv) AS hi
          FROM v GROUP BY event_type)
    SELECT v.event_type,
           CAST((v.cv - b.lo) * 10 // (b.hi - b.lo + 1) AS BIGINT) AS bucket,
           COUNT(*) AS n
    FROM v JOIN b USING (event_type)
    GROUP BY v.event_type, bucket ORDER BY v.event_type, bucket
    """,
)
def events_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram per group — the profiling primitive behind
    data-quality dashboards and optimizer statistics — with bucket
    boundaries decided in PURE integer arithmetic: cv = 100·value is an
    exact long, and bucket = (cv − lo)·10 div (hi − lo + 1) maps the
    inclusive [lo, hi] range onto exactly 10 buckets with no double
    division anywhere (the naive floor((v−lo)/width) computes width as a
    double and flickers at bucket edges between engines — the same
    boundary-drift class the zscore entry eliminated). The per-group
    [lo, hi] bounds come from one partial-aggregated scan broadcast back
    onto the fact (5 rows), the bucket assignment is a codegen'd
    projection, and the count is a second partial-aggregated shuffle
    carrying ≤ groups×10 rows — two fact scans total, both pruned to two
    columns. At 100 TB the bounds scan amortizes across every profile
    column computed in the same pass (profile_lineitem_columns shows the
    one-scan multi-column variant)."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type", (dec("value", "decimal(8,2)") * 100).cast("long").alias("cv")
    )
    b = v.groupBy("event_type").agg(F.min("cv").alias("lo"), F.max("cv").alias("hi"))
    return (
        v.join(F.broadcast(b), "event_type")
        .select(
            "event_type",
            F.expr("(cv - lo) * 10 div (hi - lo + 1)").alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "bucket")
    )


@register(
    "join_null_safe",
    oracle="""
    WITH o AS (SELECT CASE WHEN o_custkey % 500 = 0 THEN NULL
                           ELSE o_custkey END AS k, o_totalprice FROM orders),
    c AS (SELECT CASE WHEN c_custkey % 500 = 0 THEN NULL
                      ELSE c_custkey END AS k, c_mktsegment FROM customer)
    SELECT c.c_mktsegment,
           CAST(SUM(CASE WHEN o.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_key_matches,
           COUNT(*) AS n
    FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.k
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality join (Spark `<=>` ⇔ SQL IS NOT DISTINCT FROM):
    unlike `=`, NULL keys MATCH each other — the semantic needed when NULL
    is a real category ('unknown customer') rather than absent data, e.g.
    reconciling two systems that both use NULL sentinels. The fixture
    nullifies every 500th key on both sides deterministically, and the
    output counts per-segment matches plus how many came from the NULL
    bucket. Scale hazard, stated honestly: NULL behaves as ONE join key
    value, so null×null matches are a cross product of the null buckets —
    fine when NULL rows are bounded (here ~0.2%), but a high-null-rate
    join should pre-split the NULL bucket (union of a plain join on
    non-null keys + an explicit cross of the null sides) or salt it, the
    join_salted_skew machinery verbatim. Spark plans `<=>` as a regular
    hash/sort-merge join key (Coalesce+IsNull tuple), NOT a nested loop —
    the plan keeps the one-shuffle equi-join shape."""
    o = load_table(spark, sf_dir, "orders").select(
        F.when(F.col("o_custkey") % 500 == 0, None)
        .otherwise(F.col("o_custkey"))
        .alias("ok"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 500 == 0, None)
        .otherwise(F.col("c_custkey"))
        .alias("ck"),
        "c_mktsegment",
    )
    j = o.join(c, F.col("ok").eqNullSafe(F.col("ck")))
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.sum(F.when(F.col("ok").isNull(), 1).otherwise(0)).cast("long").alias(
                "null_key_matches"
            ),
            F.count("*").alias("n"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "agg_weighted_avg_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))
                    * CAST(l_extendedprice AS DECIMAL(8,2))) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE)
             AS wavg_price,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_weighted_avg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted average as exact-sum-then-one-division: the
    quantity-weighted mean price per return flag, with BOTH the weighted
    sum (Σ wᵢxᵢ as a decimal product of 2-decimal base columns — exact,
    no double product ever formed) and the weight sum carried in decimal,
    then a single deterministic double division. This is the general
    recipe for every weighted aggregate (weighted means, rates,
    per-token-weighted quality scores): a streaming double accumulation
    of wᵢxᵢ is partition-order-sensitive, while the decimal formulation
    is associative, partial-aggregates map-side, and hashes identically
    cross-engine. One scan, one shuffle carrying a handful of partials
    per task."""
    l = load_table(spark, sf_dir, "lineitem")
    q = dec("l_quantity", "decimal(8,2)")
    p = dec("l_extendedprice", "decimal(8,2)")
    return (
        l.groupBy("l_returnflag")
        .agg(
            (F.sum(q * p).cast("double") / F.sum(q).cast("double")).alias("wavg_price"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


def bitmap_distinct_words(df: DataFrame, id_col: str, *group_cols: str) -> DataFrame:
    """(group..., chunk, word) bitmap words for exact distinct counting.

    Pure-integer slotting, exact over the FULL long domain: arithmetic
    shiftright(id, 6) is floor-division by 64 (correct for negative ids,
    where ``id div 64`` truncates toward zero and would collide -1 with 63),
    and ``id & 63`` is the matching non-negative bit index — so shiftleft's
    count is always in [0, 63]. The earlier double-division formulation
    ((id / 64).cast(long)) lost precision above 2^53 and fed shiftleft a
    negative count for negative ids. Shared by agg_bitmap_distinct and the
    full-domain edge test, so the test exercises THIS expression, not a
    copy. Group keys may be names or aliased Columns (the sliding-window
    twin groups by a computed day)."""
    sel = df.select(
        *group_cols,
        F.shiftright(F.col(id_col), 6).alias("chunk"),
        F.expr(f"shiftleft(1L, CAST({id_col} & 63 AS INT))").alias("bit"),
    )
    keys = sel.columns[:-2]  # the projected group columns, by name
    return sel.groupBy(*keys, "chunk").agg(F.bit_or("bit").alias("word"))


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via chunked bitmaps — the roaring-bitmap
    pattern, expressed with built-in aggregates: user ids are packed into
    64-bit words (chunk = id div 64, bit = id mod 64), a bit_or aggregate
    merges each (group, chunk) word, and bit_count + a second sum yields
    the exact cardinality. Why this beats COUNT(DISTINCT) at 100 TB:
    Spark's exact distinct keeps every distinct VALUE in the aggregation
    hash map and (for multiple distincts) expands rows; the bitmap carries
    at most one LONG per 64-id chunk per group, the bit_or partials are
    mergeable map-side (same associativity story as the HLL rollup twin —
    this is its exact counterpart, the right choice when the id domain is
    dense integers), and the per-chunk words can be PERSISTED as an
    incremental layer exactly like agg_incremental_merge's partials. Two
    partial-aggregated shuffles, both carrying (group × chunks) rows,
    never raw events. The oracle is plain COUNT(DISTINCT) — matching
    hashes prove the bitmap arithmetic loses nothing."""
    e = load_table(spark, sf_dir, "events")
    words = bitmap_distinct_words(e, "user_id", "event_type")
    return (
        words.groupBy("event_type")
        .agg(F.sum(F.bit_count("word")).alias("n_users"))
        .orderBy("event_type")
    )


@register("agg_hll_rollup_reuse")  # rows-only: sketch estimates have no DuckDB twin
def agg_hll_rollup_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE-sketch rollup reuse — the pattern that makes distinct
    counting tractable at 100 TB: build per-(event_type, day) HLL sketches
    once (Spark 4's Datasketches hll_sketch_agg), then answer the coarser
    per-type question by UNIONING the daily sketches (hll_union_agg)
    instead of rescanning the fact. HLL registers are per-slot maxima, so
    union-of-disjoint-parts equals the directly-built whole sketch
    REGISTER-FOR-REGISTER — the entry emits both estimates and the test
    asserts exact equality plus the rsd accuracy bound vs true distinct
    counts. At scale the daily sketch table is the materialized rollup
    layer: days × types rows of ~KB sketches serving any date-range
    distinct query with zero fact scans."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    rollup = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("users_rollup"),
        F.count("*").alias("n_days"),
    )
    direct = e.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("users_direct")
    )
    return (
        rollup.join(direct, "event_type")
        .select("event_type", "users_rollup", "users_direct", "n_days")
        .orderBy("event_type")
    )


@register(
    "window_rank_distributions",
    oracle="""
    WITH r AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             PERCENT_RANK() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) AS pr,
             CUME_DIST() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice, o_orderkey) AS cd,
             NTH_VALUE(o_orderkey, 3) OVER (
               PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_key,
             o_orderpriority
      FROM orders)
    SELECT o_orderpriority, o_orderkey, pr, cd, third_key
    FROM r WHERE pr >= 0.99
    ORDER BY o_orderpriority, o_orderkey
    """,
)
def window_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window family — percent_rank, cume_dist, and a
    framed nth_value in ONE window node (same partition + ordering, so
    Catalyst computes all three in a single sort pass per partition). The
    (price, key) ordering is total, which is what makes both rank
    fractions and the nth row deterministic cross-engine; the pr >= 0.99
    filter keeps the assertable surface to the top percentile (the
    'flag the outlier tail' use these functions exist for). Scale note:
    this partitions RAW rows by a ~5-value key — correct for the API
    demonstration, but past memory-per-task scale the rank arithmetic
    moves to operators/ranking.py's range-partition + per-partition-offset
    formulation (with_group_row_number), exactly as agg_exact_median_ranked
    does; rank = f(row_number, count) makes the rewrite mechanical."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r = o.select(
        "o_orderpriority",
        "o_orderkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("o_orderkey", 3).over(wf).alias("third_key"),
    )
    return r.where(F.col("pr") >= 0.99).orderBy("o_orderpriority", "o_orderkey")


@register(
    "agg_mode_exact",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_quantity, COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag, l_quantity),
    m AS (
      SELECT l_returnflag, l_quantity, n,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY n DESC, l_quantity) AS rn
      FROM c)
    SELECT l_returnflag, l_quantity AS mode_qty, n AS mode_count
    FROM m WHERE rn = 1 ORDER BY l_returnflag
    """,
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode with a DETERMINISTIC tie-break (smallest value
    wins) — built-in F.mode is tie-nondeterministic, so this uses the
    histogram + struct-argmax pattern instead: one partial-aggregated
    count shuffle whose reduce side is groups × distinct values, then a
    constant-memory max(struct(n, -value)) per group — no window over raw
    rows, no per-group sort (dedup_keep_best's argmax discipline applied
    to the histogram)."""
    l = load_table(spark, sf_dir, "lineitem")
    c = l.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("n"))
    best = F.max(F.struct(F.col("n"), (-F.col("l_quantity")).alias("negq")))
    return (
        c.groupBy("l_returnflag")
        .agg(best.alias("b"))
        .select(
            "l_returnflag",
            (-F.col("b.negq")).alias("mode_qty"),
            F.col("b.n").alias("mode_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "events_attribution_split_touch",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS t,
             CAST(json_extract(props, '$.k') AS BIGINT) % 4 AS ch,
             CAST(value AS DECIMAL(8,2)) AS val
      FROM events),
    a AS (
      SELECT *,
             MIN(CASE WHEN event_type = 'view' THEN t * 4 + ch END)
               OVER (PARTITION BY user_id ORDER BY t
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS fv,
             MAX(CASE WHEN event_type = 'view' THEN t * 4 + ch END)
               OVER (PARTITION BY user_id ORDER BY t
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS lv
      FROM e),
    p AS (SELECT fv, lv, val FROM a WHERE event_type = 'purchase'),
    credits AS (
      SELECT COALESCE(fv % 4, -1) AS channel,
             CAST(CASE WHEN fv IS NULL OR fv % 4 = lv % 4 THEN val
                       ELSE val * CAST(0.50 AS DECIMAL(3,2)) END
                  AS DECIMAL(12,4)) AS credit
      FROM p
      UNION ALL
      SELECT lv % 4 AS channel,
             CAST(val * CAST(0.50 AS DECIMAL(3,2)) AS DECIMAL(12,4)) AS credit
      FROM p WHERE fv IS NOT NULL AND fv % 4 <> lv % 4)
    SELECT channel, COUNT(*) AS n_credits,
           CAST(SUM(credit) AS DOUBLE) AS attributed_value
    FROM credits GROUP BY channel ORDER BY channel
    """,
)
def events_attribution_split_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based multi-touch attribution with EXACT credit
    arithmetic — the split-credit model the first-touch entry's docstring
    rules out for fractional per-purchase denominators, made exact by
    choosing the one fractional model whose weights terminate in decimal:
    the first and last qualifying view each earn 50% (same channel or a
    single view → 100%; no view in the preceding hour → channel −1 takes
    the full value). Both endpoints come from the SAME range-frame window
    pass (min AND max of the t·4+ch encoding — one user-key sort shuffle
    computes both, no purchase×view join), and the two credit rows per
    purchase are a UNION of two projections rather than an
    explode-of-structs, keeping every branch a codegen'd expression.
    val·0.50 at DECIMAL scale 4 is exact in both engines, so the credit
    ledger sums associatively — the property that makes split-touch
    auditable at 100 TB where float credits drift per partitioning."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("t"),
        (F.get_json_object("props", "$.k").cast("long") % 4).alias("ch"),
        dec("value", "decimal(8,2)").alias("val"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-3600 * 1000 * 1000, Window.currentRow)
    )
    enc = F.when(F.col("event_type") == "view", F.col("t") * 4 + F.col("ch"))
    p = (
        base.withColumn("fv", F.min(enc).over(w))
        .withColumn("lv", F.max(enc).over(w))
        .where(F.col("event_type") == "purchase")
        .select("fv", "lv", "val")
    )
    half = F.expr("CAST(0.50 AS DECIMAL(3,2))")
    fv, lv, val = F.col("fv"), F.col("lv"), F.col("val")
    first_credit = p.select(
        F.coalesce(fv % 4, F.lit(-1)).alias("channel"),
        F.when(fv.isNull() | ((fv % 4) == (lv % 4)), val)
        .otherwise(val * half)
        .cast("decimal(12,4)")
        .alias("credit"),
    )
    last_credit = p.where(fv.isNotNull() & ((fv % 4) != (lv % 4))).select(
        (lv % 4).alias("channel"),
        (val * half).cast("decimal(12,4)").alias("credit"),
    )
    return (
        first_credit.unionByName(last_credit)
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_credits"),
            F.sum("credit").cast("double").alias("attributed_value"),
        )
        .orderBy("channel")
    )


@register(
    "events_session_funnel",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
    gaps AS (
      SELECT *, CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_type)
                          > 14400000000 THEN 1
                     WHEN LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_type)
                          IS NULL THEN 1
                     ELSE 0 END AS new_s
      FROM e),
    sess AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY t, event_type
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps),
    s1 AS (
      SELECT *, MIN(CASE WHEN event_type = 'view' THEN t END)
                  OVER (PARTITION BY user_id, sid) AS v
      FROM sess),
    s2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click' AND t > v THEN t END)
                  OVER (PARTITION BY user_id, sid) AS c
      FROM s1),
    s3 AS (
      SELECT user_id, sid,
             MIN(v) AS v, MIN(c) AS c,
             MIN(CASE WHEN event_type = 'purchase' AND t > c THEN t END) AS p
      FROM s2 GROUP BY user_id, sid),
    staged AS (
      SELECT CASE WHEN p IS NOT NULL THEN 3 WHEN c IS NOT NULL THEN 2
                  WHEN v IS NOT NULL THEN 1 ELSE 0 END AS reached
      FROM s3)
    SELECT stage, COUNT(*) AS n_sessions FROM (
      SELECT reached, u.stage
      FROM staged, UNNEST([1, 2, 3]) AS u(stage)
      WHERE reached >= u.stage)
    GROUP BY stage ORDER BY stage
    """,
)
def events_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion scoped to SESSIONS instead of a fixed clock
    window — the composition real product analytics runs: sessionize
    each user's stream (4-hour inactivity gap → running-sum session ids,
    the same gap discipline as events_sessionize_30m; the wider gap is
    what gives the sparse fixture full-depth conversions), then inside
    each session require the ordered chain view → later click → later
    purchase (events_funnel_conversion's chained-min trick), and report
    how many SESSIONS reach each stage. Scale shape: ONE user-key sort
    shuffle carries everything — the gap lag, the session-id running
    sum, and both stage-min windows reuse the same (user_id, t) sort
    order (Spark plans one Exchange + one Sort, three Window nodes);
    the per-session reduction is a partial-aggregated groupBy and the
    stage fan-out is a 3-element row-local explode of the ≤|sessions|
    table, never the events table. Ordering ties at equal timestamps
    are broken by event_type in BOTH engines so the lag/session split
    is deterministic; all times are integer microseconds."""
    e = load_table(spark, sf_dir, "events")
    base = e.select("user_id", "event_type", F.unix_micros("ts").alias("t"))
    wo = Window.partitionBy("user_id").orderBy("t", "event_type")
    gaps = base.withColumn(
        "new_s",
        F.when(
            (F.col("t") - F.lag("t").over(wo) > 14400 * 1000 * 1000)
            | F.lag("t").over(wo).isNull(),
            1,
        ).otherwise(0),
    )
    sess = gaps.withColumn(
        "sid", F.sum("new_s").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    ws = Window.partitionBy("user_id", "sid")
    s1 = sess.withColumn(
        "v", F.min(F.when(F.col("event_type") == "view", F.col("t"))).over(ws)
    )
    s2 = s1.withColumn(
        "c",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("t") > F.col("v")), F.col("t"))
        ).over(ws),
    )
    s3 = s2.groupBy("user_id", "sid").agg(
        F.min("v").alias("v"),
        F.min("c").alias("c"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("t") > F.col("c")),
                F.col("t"),
            )
        ).alias("p"),
    )
    staged = s3.select(
        F.when(F.col("p").isNotNull(), 3)
        .when(F.col("c").isNotNull(), 2)
        .when(F.col("v").isNotNull(), 1)
        .otherwise(0)
        .alias("reached")
    )
    return (
        staged.select("reached", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("stage"))
        .where(F.col("reached") >= F.col("stage"))
        .groupBy("stage")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy("stage")
    )


@register(
    "events_histogram_equidepth",
    oracle="""
    WITH h AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cv, COUNT(*) AS k
      FROM events GROUP BY event_type, cv),
    c AS (
      SELECT *, SUM(k) OVER (PARTITION BY event_type ORDER BY cv) AS cum,
                SUM(k) OVER (PARTITION BY event_type) AS n
      FROM h),
    edges AS (
      SELECT event_type,
             MIN(CASE WHEN cum >= (n + 3) // 4 THEN cv END) AS q1,
             MIN(CASE WHEN cum >= (2 * n + 3) // 4 THEN cv END) AS q2,
             MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN cv END) AS q3
      FROM c GROUP BY event_type),
    b AS (
      SELECT c.event_type, cv, k,
             1 + CASE WHEN cv > q1 THEN 1 ELSE 0 END
               + CASE WHEN cv > q2 THEN 1 ELSE 0 END
               + CASE WHEN cv > q3 THEN 1 ELSE 0 END AS bucket
      FROM c JOIN edges USING (event_type))
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
           CAST(SUM(k) AS BIGINT) AS n_rows, MIN(cv) AS cv_min, MAX(cv) AS cv_max
    FROM b GROUP BY event_type, bucket ORDER BY event_type, bucket
    """,
)
def events_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH (quantile) binning — the QuantileDiscretizer shape done
    exactly, completing the profiling pair with events_histogram_equiwidth:
    per event type, quartile edges are chosen by exact NEAREST-RANK over
    the VALUE HISTOGRAM (running count sum over distinct centivalues —
    the winsorize discipline: the window streams |distinct values| rows,
    never raw rows), then every histogram row lands in bucket 1..4 by
    three codegen'd comparisons against the broadcast edges. All
    arithmetic is integer — centivalues via explicit floor() on BOTH
    engines (Spark's double→long cast truncates toward zero while
    DuckDB's rounds; floor removes the difference), nearest ranks via
    ceil-division (i·n+3) div 4 — so bucket boundaries cannot flip on
    float drift, the property approxQuantile trades away. Tie-heavy data
    degrades gracefully: equal values share a bucket (counts uneven by
    exactly the tie mass), which is the correct exact-quantile answer."""
    e = load_table(spark, sf_dir, "events")
    h = (
        e.select("event_type", F.floor(F.col("value") * 100).alias("cv"))
        .groupBy("event_type", "cv")
        .agg(F.count("*").alias("k"))
    )
    edges = hist_nearest_ranks(
        h,
        "cv",
        "k",
        [
            ("q1", "(n + 3) DIV 4"),
            ("q2", "(2 * n + 3) DIV 4"),
            ("q3", "(3 * n + 3) DIV 4"),
        ],
    ).drop("n")
    b = h.join(F.broadcast(edges), "event_type").select(
        "event_type",
        "cv",
        "k",
        (
            F.lit(1)
            + (F.col("cv") > F.col("q1")).cast("int")
            + (F.col("cv") > F.col("q2")).cast("int")
            + (F.col("cv") > F.col("q3")).cast("int")
        ).alias("bucket"),
    )
    return (
        b.groupBy("event_type", F.col("bucket").cast("long").alias("bucket"))
        .agg(
            F.sum("k").cast("long").alias("n_rows"),
            F.min("cv").alias("cv_min"),
            F.max("cv").alias("cv_max"),
        )
        .orderBy("event_type", "bucket")
    )


@register(
    "join_scd2_pointintime",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events WHERE event_type <> 'purchase'),
    changes AS (
      SELECT user_id, event_id, ts, event_type FROM marked
      WHERE prev_type IS NULL OR event_type <> prev_type),
    iv AS (
      SELECT user_id, event_type AS status, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM changes),
    p AS (
      SELECT user_id, ts, CAST(value AS DECIMAL(8,2)) AS val
      FROM events WHERE event_type = 'purchase')
    SELECT COALESCE(iv.status, 'none') AS status, COUNT(*) AS n_purchases,
           CAST(SUM(p.val) AS DOUBLE) AS total_value
    FROM p LEFT JOIN iv
      ON p.user_id = iv.user_id AND p.ts >= iv.valid_from
     AND (iv.valid_to IS NULL OR p.ts < iv.valid_to)
    GROUP BY COALESCE(iv.status, 'none') ORDER BY status
    """,
)
def join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME lookup against a type-2 dimension — the join that
    makes SCD2 useful (events_scd2_intervals builds the intervals; this
    entry consumes them): each purchase is attributed to the status
    interval containing its timestamp. The oracle states the textbook
    interval form (fact ⋈ dim ON key AND ts ∈ [valid_from, valid_to)) —
    a theta join whose fan-out is fact × per-key interval count. The
    Spark plan NEVER materializes intervals: since [from, to) intervals
    tile each key's timeline, 'the containing interval' ≡ 'the LATEST
    change at-or-before ts', which is exactly the as-of discipline
    (operators/asof.py — union + one ordered window over the user key,
    one sort shuffle, no join fan-out, no LEAD pass to close intervals).
    Change-timestamp collisions resolve identically on both sides: the
    oracle's zero-width intervals match nothing, so only the change with
    the HIGHEST event id at a tied timestamp survives (it alone gets a
    later valid_to); the as-of side puts change_id first in the payload
    and asof_join's largest-payload-wins tie-break picks that same
    highest-id change (tie-collision test in tests/test_operators.py). Purchases are events, so every purchase has a
    covering interval — the aggregate drops nothing on either engine."""
    e = load_table(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.where(F.col("event_type") != "purchase")
        .withColumn("prev_type", F.lag("event_type").over(wseq))
        .where(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select(
            "user_id",
            F.col("event_id").alias("change_id"),
            F.col("ts").alias("change_ts"),
            F.col("event_type").alias("status"),
        )
    )
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", dec("value", "decimal(8,2)").alias("val")
    )
    # tie_cols: change_id alone orders equal-ts changes (event ids are
    # unique), so the running compare is (timestamp, long) — the string
    # status column rides the carried payload without ever being compared
    # (the r9 watch traced SCD2 drift to struct compares over the wide
    # payload).
    j = asof_join(
        p, changes, ["user_id"], "ts", "change_ts",
        value_cols=["change_id", "status"], tie_cols=["change_id"],
    )
    return (
        j.groupBy(F.coalesce(F.col("status_right"), F.lit("none")).alias("status"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("val").cast("double").alias("total_value"),
        )
        .orderBy("status")
    )


@register(
    "agg_weighted_median_udaf",
    oracle="""
    WITH v AS (
      SELECT l_returnflag,
             CAST(CAST(l_extendedprice AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem),
    h AS (
      SELECT l_returnflag, cents, SUM(w) AS wk
      FROM v GROUP BY l_returnflag, cents),
    c AS (
      SELECT *, SUM(wk) OVER (PARTITION BY l_returnflag ORDER BY cents) AS cum,
                SUM(wk) OVER (PARTITION BY l_returnflag) AS tot
      FROM h)
    SELECT l_returnflag, MIN(CASE WHEN 2 * cum >= tot THEN cents END)
             AS wmedian_cents
    FROM c GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_weighted_median_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUPED-AGG pandas UDF surface (the UDAF leg of the
    UDF/UDAF/UDTF triple — scalar pandas_udf, mapInPandas, applyInArrow,
    applyInPandasWithState, and the UDTF are covered elsewhere): per
    return flag, the WEIGHTED median price (weight = quantity) — a
    genuine UDAF case because no built-in aggregate takes a weight
    column, and the rank arithmetic (lower weighted median: smallest
    value whose cumulative weight reaches half the total) is holistic,
    not algebraic. The UDF receives each group's two columns as pandas
    Series via Arrow, sorts once, cumsums — integer cents in, integer
    cents out, so the oracle (the same rule as a histogram running-sum
    window) hash-matches exactly. Cost note recorded: a grouped-agg
    pandas UDF materializes each GROUP on one executor (fine at
    |groups| ≪ rows with bounded group width); the value-histogram
    window (agg_exact_quantile_interpolated) is the pure-relational
    plan when groups are huge — this entry exists to prove the API
    surface, docstring records when to choose which."""
    from pyspark.sql.functions import pandas_udf

    # (the 'float' annotation is the Series->scalar GROUPED_AGG marker
    # pyspark accepts; the declared "long" returnType governs the output)
    @pandas_udf("long")
    def wmedian(cents: pd.Series, w: pd.Series) -> float:
        agg = w.groupby(cents).sum().sort_index()
        cum = agg.cumsum()
        tot = int(agg.sum())
        return int(cum.index[(2 * cum >= tot).values.nonzero()[0][0]])

    l = load_table(spark, sf_dir, "lineitem")
    v = l.select(
        "l_returnflag",
        (dec("l_extendedprice", "decimal(8,2)") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    return (
        v.groupBy("l_returnflag")
        .agg(wmedian("cents", "w").alias("wmedian_cents"))
        .orderBy("l_returnflag")
    )


@register(
    "reco_copurchase_similarity",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    cnt AS (SELECT p, COUNT(*) AS c FROM items GROUP BY p),
    pairs AS (
      SELECT a.p AS part_a, b.p AS part_b, COUNT(*) AS cooc
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY part_a, part_b),
    scored AS (
      SELECT part_a, part_b, cooc, ca.c AS n_a, cb.c AS n_b,
             CAST(cooc * cooc AS DOUBLE) / CAST(ca.c * cb.c AS DOUBLE) AS sim2
      FROM pairs JOIN cnt ca ON part_a = ca.p JOIN cnt cb ON part_b = cb.p
      WHERE cooc >= 2)
    SELECT part_a, part_b, cooc, n_a, n_b, sim2
    FROM scored ORDER BY sim2 DESC, part_a, part_b LIMIT 20
    """,
)
def reco_copurchase_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering over the order basket — the
    market-basket primitive behind 'frequently bought together': parts
    co-occurring in the same order, scored by SQUARED cosine over binary
    occurrence vectors (cooc²/(n_a·n_b) — squaring removes the sqrt,
    whose libm rounding is not contractual across engines, while
    preserving the ranking; the division is one IEEE op over exact
    integer counts, bit-equal both sides). The oracle states the textbook
    basket self-join; the Spark plan uses the audience-overlap shape
    instead — one order-key collect_set shuffle + a row-local pair
    explode, so fan-out is quadratic only in the PER-ORDER basket size
    (≤7 here, bounded in any retail schema), never in orders or parts —
    then a broadcast of the tiny per-part count table onto the pair
    aggregate. Support floor cooc ≥ 2 (singleton co-occurrences of two
    rare items score a meaningless perfect 1.0); top-20 by
    (sim², part_a, part_b) via TakeOrdered — no global sort."""
    l = load_table(spark, sf_dir, "lineitem")
    # The distinct basket-item index feeds TWO consumers (the per-part
    # occurrence counts and the per-order basket collect) and Spark does
    # not reuse the exchange across the branches — without truncation the
    # fact scan + distinct shuffle run twice (guide §2.4: remove repeated
    # shuffles outright). Same multi-consumer localCheckpoint trade as
    # operators/dedup.py::minhash_lsh_pairs documents.
    items = (
        l.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    cnt = items.groupBy("p").agg(F.count("*").alias("c"))
    baskets = items.groupBy("o").agg(F.sort_array(F.collect_set("p")).alias("ps"))
    pairs = (
        baskets.select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            "ps",
                            lambda a: F.transform(F.col("ps"), lambda b: F.struct(
                                a.alias("part_a"), b.alias("part_b"))),
                        )
                    ),
                    lambda s: s["part_a"] < s["part_b"],
                )
            ).alias("pr")
        )
        .select("pr.part_a", "pr.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("cooc"))
        .where(F.col("cooc") >= 2)
    )
    scored = (
        pairs.join(
            F.broadcast(cnt.select(F.col("p").alias("part_a"), F.col("c").alias("n_a"))),
            "part_a",
        )
        .join(
            F.broadcast(cnt.select(F.col("p").alias("part_b"), F.col("c").alias("n_b"))),
            "part_b",
        )
        .select(
            "part_a", "part_b", "cooc", "n_a", "n_b",
            (
                (F.col("cooc") * F.col("cooc")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("sim2"),
        )
    )
    return scored.orderBy(F.col("sim2").desc(), "part_a", "part_b").limit(20)


@register(
    "events_longest_streak",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
             CASE WHEN event_type IS DISTINCT FROM
                       LAG(event_type) OVER (PARTITION BY user_id
                                             ORDER BY t, event_id)
                  THEN 1 ELSE 0 END AS chg
      FROM events),
    runs0 AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
                               ROWS UNBOUNDED PRECEDING) AS rid
      FROM s),
    runs AS (
      SELECT user_id, event_type, rid, COUNT(*) AS len
      FROM runs0 GROUP BY user_id, event_type, rid)
    SELECT event_type, CAST(MAX(len) AS BIGINT) AS max_streak,
           CAST(SUM(CASE WHEN len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_streaks_3plus,
           COUNT(*) AS n_runs
    FROM runs GROUP BY event_type ORDER BY event_type
    """,
)
def events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands streak detection — the engagement primitive
    behind 'longest run of consecutive identical actions' (login
    streaks, repeated-error bursts): runs are identified with the
    ONE-PARTITIONING form of the islands trick — a lag-change indicator
    summed into a running run id — instead of the textbook difference-
    of-two-row_numbers, which needs a SECOND window partitioned by
    (user, type) and therefore a second shuffle; here the change lag,
    the run-id running sum, and nothing else ride a single user-key
    sort (one Exchange, one Window node chain), then runs reduce by
    partial-aggregated groupBy. Per type: the longest streak, how many
    runs reach 3+, and total run count. Tie-break by event_id keeps run
    boundaries deterministic under timestamp collisions; IS DISTINCT
    FROM handles the first-row NULL lag identically in both engines."""
    e = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("t", "event_id")
    s = e.select(
        "user_id", "event_type", F.unix_micros("ts").alias("t"), "event_id"
    ).withColumn(
        "chg",
        (~F.col("event_type").eqNullSafe(F.lag("event_type").over(wo))).cast("int"),
    )
    runs = (
        s.withColumn(
            "rid", F.sum("chg").over(wo.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("user_id", "event_type", "rid")
        .agg(F.count("*").alias("len"))
    )
    return (
        runs.groupBy("event_type")
        .agg(
            F.max("len").cast("long").alias("max_streak"),
            F.sum((F.col("len") >= 3).cast("int")).cast("long").alias("n_streaks_3plus"),
            F.count("*").alias("n_runs"),
        )
        .orderBy("event_type")
    )


@register(
    "events_trend_grouped_map",
    oracle="""
    WITH v AS (
      SELECT event_type,
             epoch_us(ts) - MIN(epoch_us(ts)) OVER (PARTITION BY event_type)
               AS x,
             CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS y
      FROM events),
    m AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM v GROUP BY event_type)
    SELECT event_type, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
           CAST(sy * sxx - sx * sxy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS intercept
    FROM m ORDER BY event_type
    """,
)
def events_trend_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUPED-MAP pandas surface (groupBy().applyInPandas — the last
    uncovered leg of the Python API matrix next to scalar pandas_udf,
    GROUPED_AGG, mapInPandas, applyInArrow, applyInPandasWithState, and
    the UDTF): per event type, an OLS time trend of the value signal
    (slope + intercept), each group arriving as one pandas DataFrame and
    returning one summary row. EXACTNESS is the interesting part: the
    UDF accumulates the regression moments in PYTHON INTS (arbitrary
    precision — Σx² over microsecond offsets exceeds int64 and would
    silently lose bits as float64), and only the final two divisions
    produce doubles; the oracle does the same arithmetic in
    DECIMAL/HUGEINT, so the hashes match bit-for-bit where a numpy
    float-sum implementation would drift with batch order. Times are
    per-group min-anchored on both sides to bound magnitudes. The
    relational twin is one moment aggregate (agg_corr_exact's pattern) —
    docstring records that as the plan when groups are huge; this entry
    exists to prove the grouped-map surface end to end."""
    from pyspark.sql.functions import unix_micros

    def trend(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = [int(v) for v in pdf["t"]]
        x0 = min(xs)
        xs = [v - x0 for v in xs]
        ys = [int(v) for v in pdf["y"]]
        n = len(xs)
        sx = sum(xs)
        sy = sum(ys)
        sxx = sum(v * v for v in xs)
        sxy = sum(a * b for a, b in zip(xs, ys))
        den = n * sxx - sx * sx
        # den == 0 (single event, or all events on one timestamp) must emit
        # NULL like the oracle (DuckDB double/0 is NULL), not raise
        # ZeroDivisionError and kill the whole job (r12 review).
        return pd.DataFrame(
            [{
                "event_type": pdf["event_type"].iloc[0],
                "n": n,
                "slope": float(n * sxy - sx * sy) / float(den) if den else None,
                "intercept": (
                    float(sy * sxx - sx * sxy) / float(den) if den else None
                ),
            }]
        )

    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        unix_micros("ts").alias("t"),
        (dec("value", "decimal(8,2)") * 100).cast("long").alias("y"),
    )
    return (
        v.groupBy("event_type")
        .applyInPandas(trend, "event_type string, n long, slope double, intercept double")
        .orderBy("event_type")
    )


@register(
    "events_cumulative_reach",
    oracle="""
    WITH f AS (
      SELECT event_type, user_id,
             MIN(CAST(date_trunc('day', ts) AS DATE)) AS fday
      FROM events GROUP BY event_type, user_id),
    news AS (
      SELECT event_type, fday AS day, COUNT(*) AS cnt
      FROM f GROUP BY event_type, fday),
    spine AS (
      SELECT DISTINCT event_type, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events)
    SELECT s.event_type, s.day,
           CAST(SUM(COALESCE(n.cnt, 0))
                  OVER (PARTITION BY s.event_type ORDER BY s.day) AS BIGINT)
             AS users_cum
    FROM spine s LEFT JOIN news n
      ON s.event_type = n.event_type AND s.day = n.day
    ORDER BY s.event_type, s.day
    """,
)
def events_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative REACH — exact all-time distinct users per event type as
    of each active day (the growth curve next to the trailing-window
    sliding-bitmap entry): the naive form re-counts DISTINCT over an
    ever-growing prefix per day (quadratic re-scans); the scale form is
    FIRST-SEEN arithmetic — cumulative distinct ≡ running SUM of
    first-appearance counts, because each user enters the distinct set
    exactly once. One (type, user) partial aggregate for first days, a
    per-(type, day) count, and a running sum over the compact
    types×days spine — the window never touches fact rows. The same
    identity is why streaming reach needs only per-user first-seen
    state (events_stateful_dedup_first's shape), not a distinct set per
    window. Unique (type, day) spine rows make RANGE/ROWS framing
    agree, so both engines' running sums are identical."""
    e = load_table(spark, sf_dir, "events")
    f = e.groupBy("event_type", "user_id").agg(F.min(F.to_date("ts")).alias("fday"))
    news = f.groupBy("event_type", F.col("fday").alias("day")).agg(
        F.count("*").alias("cnt")
    )
    spine = e.select("event_type", F.to_date("ts").alias("day")).distinct()
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(news, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.sum(F.coalesce("cnt", F.lit(0))).over(w).cast("long").alias("users_cum"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Round 8: Markov transitions + RFM segmentation
# ---------------------------------------------------------------------------


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events),
    c AS (SELECT event_type AS from_type, next_type AS to_type,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE)
             / CAST(CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS DOUBLE)
             AS p
    FROM c ORDER BY from_type, to_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences —
    the behavioral model behind next-action prediction and anomaly scoring
    (a transition whose learned probability is tiny flags a bot or a broken
    flow). One user-keyed window (LEAD with the ts, event_id deterministic
    tie-break) -> one partial-aggregated groupBy on (from, to) — |types|^2
    rows at most — and the row-probability normalization runs as a window
    over that tiny aggregate, not the fact table. Exact bigint counts
    divide once into doubles (bit-equal cross-engine); at 100 TB the only
    full-data exchange is the one user-keyed sort shuffle, shared with
    every other sessionization entry."""
    e = load_table(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(wseq).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    wrow = Window.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wrow).cast("double")).alias("p"),
    ).orderBy("from_type", "to_type")


@register(
    "events_rfm_segmentation",
    oracle="""
    WITH p AS (
      SELECT user_id,
             MAX(EPOCH_US(ts)) AS recency_us,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(CAST(value AS DECIMAL(8,2))) AS DECIMAL(18,2)) AS money
      FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    q AS (
      SELECT user_id, freq, money,
             NTILE(4) OVER (ORDER BY recency_us DESC, user_id) AS r,
             NTILE(4) OVER (ORDER BY freq DESC, user_id) AS f,
             NTILE(4) OVER (ORDER BY money DESC, user_id) AS m
      FROM p)
    SELECT CAST(r * 100 + f * 10 + m AS BIGINT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(freq) AS BIGINT) AS total_purchases,
           CAST(SUM(money) AS DOUBLE) AS total_value
    FROM q GROUP BY segment ORDER BY segment
    """,
)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic marketing partition: each
    purchasing user scored into quartiles by Recency (latest purchase),
    Frequency (purchase count) and Monetary (exact decimal spend), segment
    label = R*100 + F*10 + M (111 = best-everything ... 444). Quartiles
    are NTILE(4) with user_id tie-breaks so assignment is deterministic in
    both engines; money stays DECIMAL through the sum (order-insensitive
    exact) and hits double only in the final reporting division-free cast.
    Scale note: the three unpartitioned NTILE windows run over the
    per-user AGGREGATE (|users| rows, already shuffled once by the
    groupBy), not the fact table; a skew-free percentile assignment at
    true scale would swap NTILE for a percentile_approx cut table the way
    the histogram entries document, trading exact quartile boundaries for
    a broadcast — the deterministic NTILE form is what a hash oracle can
    pin."""
    e = load_table(spark, sf_dir, "events")
    p = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.unix_micros("ts")).alias("recency_us"),
            F.count("*").cast("long").alias("freq"),
            F.sum(dec("value", "decimal(8,2)")).cast("decimal(18,2)").alias("money"),
        )
    )
    q = p.select(
        "user_id",
        "freq",
        "money",
        F.ntile(4).over(Window.orderBy(F.col("recency_us").desc(), "user_id")).alias("r"),
        F.ntile(4).over(Window.orderBy(F.col("freq").desc(), "user_id")).alias("f"),
        F.ntile(4).over(Window.orderBy(F.col("money").desc(), "user_id")).alias("m"),
    )
    return (
        q.select(
            (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).cast("long").alias("segment"),
            "freq",
            "money",
        )
        .groupBy("segment")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("freq").cast("long").alias("total_purchases"),
            F.sum("money").cast("double").alias("total_value"),
        )
        .orderBy("segment")
    )


@register(
    "events_time_weighted_avg",
    oracle="""
    WITH o AS (
      SELECT user_id, EPOCH_US(ts) AS t_us, CAST(value AS DECIMAL(8,2)) AS v,
             LEAD(EPOCH_US(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt_us
      FROM events),
    seg AS (
      SELECT user_id, CAST((nxt_us - t_us) // 1000000 AS DECIMAL(12,0)) AS dur,
             v FROM o WHERE nxt_us IS NOT NULL
                        AND (nxt_us - t_us) // 1000000 >= 1)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(dur) AS BIGINT) AS total_dur_s,
           CAST(CAST(SUM(CAST(v * dur AS DECIMAL(24,2))) AS DECIMAL(38,2)) AS DOUBLE)
             / CAST(CAST(SUM(dur) AS BIGINT) AS DOUBLE) AS twav
    FROM seg GROUP BY user_id ORDER BY user_id
    """,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED average (TWAP's general form) per user: each event's
    value is held until the user's next event and weighted by that holding
    duration — the correct mean for irregularly-sampled series, where the
    arithmetic mean over-weights bursts. One LEAD window per user (ts +
    event_id tie-break, deterministic in both engines), then an exact
    aggregate. Weights are WHOLE SECONDS (µs gap integer-div 10^6;
    sub-second holds drop — identical rule both engines): with the
    dataset's bounded time span this keeps every decimal sum's unscaled
    value below 2^53, so the final DECIMAL(38,2)→double conversion is the
    single correctly-rounded division both engines agree on — µs weights
    overflow that window and land 1 ulp apart (hash-checked the hard
    way). Products DECIMAL(8,2)×DECIMAL(12,0) summed in DECIMAL(38,2)
    (order-insensitive exact), surfaced as ONE double division of two
    exact quantities. Scale shape: one shuffle on user_id
    serves both the window and the aggregate (same key, Catalyst reuses
    the exchange); no global window, no collect."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.unix_micros("ts")
    o = e.select(
        "user_id",
        t_us.alias("t_us"),
        dec("value", "decimal(8,2)").alias("v"),
        F.lead(t_us).over(w).alias("nxt_us"),
    )
    dur_s = F.expr("(nxt_us - t_us) div 1000000")
    seg = o.where(F.col("nxt_us").isNotNull() & (dur_s >= 1)).select(
        "user_id",
        dur_s.cast("decimal(12,0)").alias("dur"),
        "v",
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_intervals"),
            F.sum("dur").cast("long").alias("total_dur_s"),
            F.sum((F.col("v") * F.col("dur")).cast("decimal(24,2)"))
            .cast("decimal(38,2)").alias("__wv"),
        )
        .select(
            "user_id",
            "n_intervals",
            "total_dur_s",
            (F.col("__wv").cast("double")
             / F.col("total_dur_s").cast("double")).alias("twav"),
        )
        .orderBy("user_id")
    )


@register(
    "skyline_price_quantity",
    oracle="""
    WITH p AS (SELECT DISTINCT CAST(l_extendedprice AS DECIMAL(8,2)) AS price,
                               CAST(l_quantity AS BIGINT) AS qty
               FROM lineitem),
    s AS (SELECT price, qty,
                 MAX(qty) OVER (ORDER BY price ASC, qty DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS prev
          FROM p)
    SELECT price, qty FROM s WHERE prev IS NULL OR qty > prev
    ORDER BY price, qty
    """,
)
def skyline_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D SKYLINE (Pareto frontier) over lineitem: the (price, quantity)
    pairs no other pair beats on both axes (lower-or-equal price AND
    higher-or-equal quantity, one strict) — the multi-criteria shortlist
    operator (Börzsönyi et al. 2001). The Spark plan is
    operators/ranking.py::skyline_2d — bin-pruned and PARTITION-PARALLEL,
    never the textbook single global sort: per-bin maxima (a tiny
    broadcast) prune every candidate below its lower-bins' running max,
    then a bin-PARTITIONED window settles in-bin dominance, so the wide
    work stays parallel at any scale. The oracle is the naive
    single-window formulation (provably the same set: a pair fails the
    running-max test iff a preceding pair dominates it). l_quantity is
    integral by generation (1..50), so CAST truncation == rounding."""
    from flusher_spark.operators.ranking import skyline_2d

    li = load_table(spark, sf_dir, "lineitem").select(
        dec("l_extendedprice", "decimal(8,2)").alias("price"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return skyline_2d(li, min_col="price", max_col="qty").orderBy("price", "qty")


@register(
    "scalar_business_days",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority,
             CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS e1,
             CAST(l.l_shipdate AS DATE) - DATE '1970-01-01' AS e2
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    f AS (
      SELECT o_orderpriority,
             (5 * ((e2 - e2 % 7) // 7) + LEAST(e2 % 7, 2) + GREATEST(e2 % 7 - 4, 0))
             -
             (5 * ((e1 - e1 % 7) // 7) + LEAST(e1 % 7, 2) + GREATEST(e1 % 7 - 4, 0))
               AS bdays
      FROM d)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(bdays) AS BIGINT) AS total_bdays,
           CAST(CAST(SUM(bdays) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_bdays
    FROM f GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def scalar_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUSINESS-DAY interval arithmetic — the SLA-latency scalar every
    ops/finance pipeline needs and no engine ships natively: weekdays
    elapsed from order date to ship date, per order priority. Pure
    integer epoch-day math (no dayofweek builtin — Spark's is 1=Sunday,
    DuckDB's 0=Sunday; a cross-engine trap) via a closed-form prefix
    count: weekdays-before-day-e = 5*(whole weeks) + clamp of the partial
    week, where epoch day 0 (1970-01-01) is a Thursday, so the partial
    week runs Thu,Fri=workdays then Sat,Sun=weekend then Mon..Wed. The
    interval count is the prefix-count DIFFERENCE — exact bigints, one
    final double division. Codegen'd end to end; the join shuffles on
    orderkey only."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.col("o_orderdate").cast("date").alias("d1")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("d2")
    )

    def prefix_weekdays(e):
        # weekdays in [1970-01-01, epoch day e): 5 per whole week from the
        # Thursday anchor, plus the partial week — residues run
        # Thu,Fri (work), Sat,Sun (weekend), Mon,Tue,Wed (work), so the
        # partial count is LEAST(r,2) + GREATEST(r-4,0); identical
        # expression in the oracle.
        wk = ((e - e % 7) / 7).cast("long")
        part = e % 7
        return 5 * wk + F.least(part, F.lit(2)) + F.greatest(part - 4, F.lit(0))

    j = o.join(li, o["o_orderkey"] == li["l_orderkey"])
    e1 = F.datediff(F.col("d1"), F.lit("1970-01-01"))
    e2 = F.datediff(F.col("d2"), F.lit("1970-01-01"))
    bdays = (prefix_weekdays(e2) - prefix_weekdays(e1)).alias("bdays")
    return (
        j.select("o_orderpriority", bdays)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("bdays").cast("long").alias("total_bdays"),
        )
        .select(
            "o_orderpriority",
            "n",
            "total_bdays",
            (F.col("total_bdays").cast("double") / F.col("n").cast("double"))
            .alias("avg_bdays"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "events_linreg_per_type",
    oracle="""
    WITH b AS (
      SELECT event_type,
             (epoch_us(ts) - 1704067200000000) // 3600000000 AS x,
             CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS y
      FROM events),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM b GROUP BY event_type)
    SELECT event_type, n AS n_events,
           CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
             AS slope_cents_per_hour,
           (CAST(sy AS DOUBLE)
            - (CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
               / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
              * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS intercept_cents
    FROM s ORDER BY event_type
    """,
)
def events_linreg_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary least squares (value trend over time per event
    type) from EXACT integer sufficient statistics — the distributed
    regression pattern: one partial-aggregated groupBy computes (n, Σx,
    Σy, Σxy, Σx²) as bigints (map-side combine, one shuffle of 5 longs per
    group), and slope/intercept fall out as driver-free closed forms. No
    REGR_SLOPE built-in is used on either engine: their double
    accumulation is order-dependent, which can't be hash-compared — here
    every sum is exact int64 and the only floating-point ops are the final
    divisions of identical integers (int64→double conversion and IEEE
    division are bit-identical on both engines; the cross-engine numerics
    rules this repo pins in tests/test_oracle_types). x is whole hours
    since 2024-01-01 (integer division of epoch micros — fixture ts all
    follow that epoch), y is exact cents via the DECIMAL(8,2) route.
    Magnitude audit: x ≤ 720 and y < 6e4 keep the SUMS comfortably in
    int64 at any realistic scale (Σxy < n·720·6e4, safe past n = 2e11 rows
    per group), but the CROSS PRODUCTS n·Σxy and Σx·Σy grow as n² — at
    sf1 (~2e5 rows/group) they already reach ~1.6e18 with only ~5x int64
    headroom, past which Spark (non-ANSI) would wrap silently while DuckDB
    errors. So both engines compute the cross products in 128-bit exact
    types (Spark DECIMAL(38,0) via the explicit decimal(20,0) casts below,
    DuckDB HUGEINT) — overflow-free to ~1e38 — and only then convert to
    double for the final division. At harness scale factors the converted
    integers stay ≤ 2^53, where the 128-bit→double conversions of both
    engines are exactly representable, keeping the hash compare bit-exact;
    beyond that each engine's conversion is correct to 1 ulp, which is the
    operator's stated precision. At 100 TB this is the map-reduce
    regression everyone actually ships — 5 longs of state per group, no
    iterative solver, no collect."""
    e = load_table(spark, sf_dir, "events")
    b = e.select(
        "event_type",
        F.expr("(unix_micros(ts) - 1704067200000000) div 3600000000").alias("x"),
        (dec("value", "decimal(8,2)") * 100).cast("long").alias("y"),
    )
    s = b.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    # 128-bit cross products (see magnitude audit above): the decimal(20,0)
    # casts promote the long·long products to DECIMAL(38,0) arithmetic,
    # mirroring the oracle's HUGEINT route.
    n_d = F.col("n").cast("decimal(20,0)")
    sx_d = F.col("sx").cast("decimal(20,0)")
    num = (n_d * F.col("sxy") - sx_d * F.col("sy")).cast("double")
    den = (n_d * F.col("sxx") - sx_d * F.col("sx")).cast("double")
    # try_divide: den = 0 when all of a type's events land in ONE hour
    # bucket — ANSI double division RAISES; NULL matches the oracle's
    # DuckDB x/0 (r12 review). n >= 1 always, so the intercept's /n stays.
    slope = F.try_divide(num, den)
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return s.select(
        "event_type",
        F.col("n").alias("n_events"),
        slope.alias("slope_cents_per_hour"),
        intercept.alias("intercept_cents"),
    ).orderBy("event_type")


@register(
    "events_interval_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS start_us,
             epoch_us(ts)
               + CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) * 1000000
               AS end_us
      FROM events),
    marked AS (
      SELECT user_id, event_id, start_us, end_us,
             CASE WHEN MAX(end_us) OVER (
                    PARTITION BY user_id ORDER BY start_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  IS NULL
               OR start_us > MAX(end_us) OVER (
                    PARTITION BY user_id ORDER BY start_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS new_island
      FROM iv),
    islands AS (
      SELECT user_id, start_us, end_us,
             SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY start_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
      FROM marked),
    per_island AS (
      SELECT user_id, island_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MAX(end_us) - MIN(start_us) AS covered
      FROM islands GROUP BY user_id, island_id)
    SELECT user_id,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(covered) AS BIGINT) AS covered_us
    FROM per_island GROUP BY user_id ORDER BY user_id
    """,
)
def events_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL UNION length per key (merge overlapping intervals — the
    coverage question speech/video segment pipelines ask: how much
    wall-clock does this user's media actually span once overlaps
    collapse?). Pure gaps-and-islands in one window pass: each event
    spans [ts, ts + value-cents seconds); a running MAX(end) over
    (user, start-order) marks island heads where a start clears every
    prior end, a running SUM of heads numbers the islands, and each
    island contributes max(end)−min(start). One shuffle on user_id, two
    window frames over the SAME (start_us, event_id) sort — sharing the
    order is load-bearing twice over: Spark plans both frames off one
    in-partition sort, and the island-membership runs are only
    well-defined when the cumulative SUM walks rows in the exact order
    the flags were computed in (numbering tied starts in any other
    order can splice a row into the previous island and double-count
    its span). Then an integer re-aggregate — vs the naive
    self-join-and-dedup formulation whose fan-out is quadratic in
    per-key density. All arithmetic is integer microseconds (exact
    cents × 10⁶), so both engines hash-match bit-for-bit."""
    e = load_table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("start_us"),
        (
            F.unix_micros("ts")
            + (dec("value", "decimal(8,2)") * 100).cast("long") * F.lit(1_000_000)
        ).alias("end_us"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("start_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_reach = F.max("end_us").over(w_prev)
    marked = iv.select(
        "user_id",
        "event_id",
        "start_us",
        "end_us",
        F.when(
            prev_reach.isNull() | (F.col("start_us") > prev_reach), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("new_island"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("start_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = marked.withColumn("island_id", F.sum("new_island").over(w_run))
    per_island = islands.groupBy("user_id", "island_id").agg(
        F.count("*").cast("long").alias("n_events"),
        (F.max("end_us") - F.min("start_us")).alias("covered"),
    )
    return (
        per_island.groupBy("user_id")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.count("*").cast("long").alias("n_islands"),
            F.sum("covered").cast("long").alias("covered_us"),
        )
        .orderBy("user_id")
    )


@register(
    "events_cusum_changepoint",
    oracle="""
    WITH b AS (
      SELECT event_type, ts, event_id,
             CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS y
      FROM events),
    w AS (
      SELECT event_type, ts, event_id, y,
             SUM(y) OVER (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS p,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             SUM(y) OVER (PARTITION BY event_type) AS s
      FROM b),
    c AS (
      SELECT event_type, ts, i, n,
             CAST(n AS HUGEINT) * CAST(p AS HUGEINT)
               - CAST(i AS HUGEINT) * CAST(s AS HUGEINT) AS cexact
      FROM w),
    r AS (
      SELECT event_type, ts, i, n, cexact,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ABS(cexact) DESC, ts, i) AS rk
      FROM c)
    SELECT event_type,
           CAST(n AS BIGINT) AS n_events,
           ts AS cp_ts,
           CAST(i AS BIGINT) AS cp_index,
           CAST(cexact AS DOUBLE) AS cusum_peak
    FROM r WHERE rk = 1 ORDER BY event_type
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM CHANGEPOINT detection per event type — "where did this
    metric's level shift" — from exact integer arithmetic: with y in
    cents, the classic cumulative sum of deviations from the mean,
    C_i = Σ_{j<=i}(y_j - S/n), is computed SCALED BY n as
    n·P_i - i·S (P = running prefix sum, S = group total), which keeps
    every comparison integer-exact — no mean division, no float
    accumulation — and the changepoint is the (ts, event_id)-earliest row
    maximizing |C_i|, the standard CUSUM location estimator for a single
    level shift. Like events_linreg_per_type, the n-scaled cross products
    grow as n², so both engines compute them in 128-bit exact types
    (Spark DECIMAL(38,0) via decimal(20,0) casts, DuckDB HUGEINT —
    DuckDB's window SUM over BIGINT is already HUGEINT) and convert to
    double only for the reported peak value — exactly representable at
    harness scales (≤ 2^53), correct to 1 ulp beyond. One shuffle on
    event_type serves all three windows (running sum, row number, group
    totals share the partition key; the argmax rank re-sorts in place).
    At 100 TB this is the single-pass changepoint screen run per metric
    before alerting — no iterative segmentation, no collect."""
    e = load_table(spark, sf_dir, "events")
    b = e.select(
        "event_type",
        "ts",
        "event_id",
        (dec("value", "decimal(8,2)") * 100).cast("long").alias("y"),
    )
    w_ord = Window.partitionBy("event_type").orderBy("ts", "event_id")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy("event_type")
    w = b.select(
        "event_type",
        "ts",
        F.sum("y").over(w_run).alias("p"),
        F.row_number().over(w_ord).alias("i"),
        F.count("*").over(w_all).alias("n"),
        F.sum("y").over(w_all).alias("s"),
    )
    cexact = (
        F.col("n").cast("decimal(20,0)") * F.col("p")
        - F.col("i").cast("decimal(20,0)") * F.col("s")
    )
    c = w.select("event_type", "ts", "i", "n", cexact.alias("cexact"))
    w_rk = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cexact")).desc(), "ts", "i"
    )
    return (
        c.withColumn("rk", F.row_number().over(w_rk))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_events"),
            F.col("ts").alias("cp_ts"),
            F.col("i").cast("long").alias("cp_index"),
            F.col("cexact").cast("double").alias("cusum_peak"),
        )
        .orderBy("event_type")
    )


@register(
    "events_l_diversity",
    oracle="""
    WITH per AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             user_id,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2, 3)
    SELECT event_type, day,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MAX(cnt) AS BIGINT) AS max_user_rows,
           (COUNT(*) >= 5) AS l_ok,
           (2 * MAX(cnt) <= SUM(cnt)) AS c_ok
    FROM per GROUP BY event_type, day ORDER BY event_type, day
    """,
)
def events_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-DIVERSITY audit over released event aggregates — the privacy gate
    that complements corpus_k_anonymity's group-SIZE check with a group-
    CONTENT check: a (event_type, day) cell is safe to release only if it
    mixes enough distinct individuals. Per quasi-identifier cell this
    reports n_rows, the number of DISTINCT users (distinct l-diversity:
    ``l_ok`` ⇔ ≥ l=5 distinct users — a cell failing it attributes its
    rows to a handful of people), and the top user's row count with a
    (c,l)-style dominance flag (``c_ok`` ⇔ the busiest user holds at most
    half the cell: decided by INTEGER cross-multiplication ``2·max ≤ n``,
    never a float ratio — the cross-engine rule this repo pins for
    threshold booleans). Two partial-aggregated groupBys — (QI, user)
    counts, then the per-cell fold — both map-side combinable; COUNT
    (DISTINCT) never materializes a distinct set per cell, it is the
    second groupBy's row count. At 100 TB this shape (re-aggregate a
    keyed count table) is the standard way to audit billions of cells
    without a distinct-set blow-up."""
    e = load_table(spark, sf_dir, "events")
    per = (
        e.select(
            "event_type",
            F.to_date("ts").cast("string").alias("day"),
            "user_id",
        )
        .groupBy("event_type", "day", "user_id")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        per.groupBy("event_type", "day")
        .agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_users"),
            F.max("cnt").cast("long").alias("max_user_rows"),
            (F.count("*") >= F.lit(5)).alias("l_ok"),
            (F.lit(2) * F.max("cnt") <= F.sum("cnt")).alias("c_ok"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "events_stream_static_join",
    oracle="""
    WITH prof AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS user_n_events
      FROM events GROUP BY user_id)
    SELECT e.event_id, e.user_id,
           CAST(CAST(e.value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
           prof.user_n_events,
           CASE WHEN prof.user_n_events >= 70 THEN 'heavy'
                WHEN prof.user_n_events >= 60 THEN 'mid'
                ELSE 'light' END AS user_tier
    FROM events e JOIN prof USING (user_id)
    WHERE e.event_type = 'purchase'
    """,
)
def events_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC enrichment join — the Structured Streaming capability
    the stream-stream family doesn't cover: a live fact stream joined to a
    slowly-changing batch dimension (here a per-user activity profile
    aggregated batch-side from the same table the stream replays). The
    static side is a plain DataFrame: Spark re-plans it per micro-batch
    (so a dimension refresh lands on the next trigger), broadcasts it when
    small, and the join itself is STATELESS — no watermark, no state
    store, append mode — which is why this is the default enrichment
    pattern at any scale (state cost is zero; the stream never waits).
    Executed as a real 4-micro-batch file-source stream
    (_stage_event_stream); the batch oracle is the equivalent static
    join, exact because a stateless inner join emits precisely the
    matched pairs regardless of batch boundaries. Cents via the exact
    DECIMAL route; tier thresholds decided on integer counts."""
    from flusher_spark.streaming.windows import stream_events

    e = load_table(spark, sf_dir, "events")
    profile = (
        e.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("user_n_events"))
        .withColumn(
            "user_tier",
            F.when(F.col("user_n_events") >= 70, "heavy")
            .when(F.col("user_n_events") >= 60, "mid")
            .otherwise("light"),
        )
    )
    path = _stage_event_stream(spark, sf_dir)
    stream = (
        stream_events(spark, path)
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            (dec("value", "decimal(8,2)") * 100).cast("long").alias("cents"),
        )
    )
    return _run_stream_entry(
        spark,
        lambda: stream.join(profile, "user_id").select(
            "event_id", "user_id", "cents", "user_n_events", "user_tier"
        ),
        "cat_stream_static",
        "append",
    )
