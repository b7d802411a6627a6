"""Relational operators on the raw TPC-H-ish tables (SURVEY §2.2-§2.5).

These exercise the projection/filter/aggregate/window/top-k primitives
the graph services compose. q1/q3/q5 are the TPC-H-shaped headline
queries used by bench.py — they are the 100 TB stress shapes (wide agg,
selective join, multi-join star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from codegraph_spark.operators.topk import top_k_per_group
from codegraph_spark.sources.tables import load_table


# --- q1: pricing summary (TPC-H Q1 shape; flagship) ----------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupBy-2 + 8 aggregates over lineitem with a pushed-down date
    filter. Catalyst does map-side partial aggregation; the shuffle
    carries only (2-col key × 8 partials)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
       ROUND(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
       ROUND(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS sum_disc_price,
       ROUND(CAST(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DOUBLE), 2) AS sum_charge,
       ROUND(CAST(avg(l_quantity) AS DOUBLE), 2) AS avg_qty,
       ROUND(CAST(avg(l_extendedprice) AS DOUBLE), 2) AS avg_price,
       ROUND(CAST(avg(l_discount) AS DOUBLE), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-01-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- q3: shipping priority (selective join + agg + top-k) -----------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    # customer scales with data size → no broadcast hint; the planner
    # broadcasts from file stats while the filtered side fits (it does
    # at every test sf) and AQE falls back to a shuffle join at the
    # scales where a hint would OOM the executors.
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .withColumn("o_orderdate", F.col("o_orderdate").cast("string"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


_Q3_SQL = """
SELECT l_orderkey,
       CAST(o_orderdate AS VARCHAR) AS o_orderdate,
       o_orderpriority,
       ROUND(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- q5: local supplier volume (multi-join star) ---------------------------
def q5_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join. Fixed-cardinality dims (nation 25, region 5)
    are broadcast-hinted; customer/supplier scale with data size, so
    their strategy is left to stats + AQE (broadcast while small,
    shuffle join at 100 TB). The one big shuffle is lineitem⋈orders."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.groupBy("n_name", "r_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


_Q5_SQL = """
SELECT n_name, r_name,
       ROUND(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name, r_name
ORDER BY revenue DESC, n_name
"""


# --- q6: forecasting revenue change (TPC-H Q6 shape) ------------------------
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure predicate + single aggregate — the fully-pushed-down scan
    shape: every filter reaches the parquet reader (date range,
    discount band, quantity cap), no join, no shuffle beyond the final
    1-row combine. The what-if revenue query of the TPC-H suite."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_Q6_SQL = """
SELECT ROUND(CAST(sum(l_extendedprice * l_discount) AS DOUBLE), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24
"""


# --- p2: FindNodeByProperty analog (query.go:40-50) ------------------------
def p2_point_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 5000))
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
    )


_P2_SQL = """
SELECT c_custkey, c_name, ROUND(CAST(c_acctbal AS DOUBLE), 2) AS acctbal
FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000
"""


# --- p4: property-existence predicate (system_test.go:332-341) -------------
def p4_not_null_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.col("o_orderdate").isNotNull()
            & F.col("o_orderpriority").isNotNull()
            & (F.col("o_orderstatus") == "O")
        )
        .select("o_orderkey", "o_orderpriority")
    )


_P4_SQL = """
SELECT o_orderkey, o_orderpriority
FROM orders
WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL AND o_orderstatus = 'O'
"""


# --- o6: per-group top-k (documents/indexer.go:132-137 batch form) ---------
def o6_top5_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    top = top_k_per_group(
        orders,
        ["o_custkey"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=5,
    )
    return top.select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))


_O6_SQL = """
SELECT o_custkey, o_orderkey, ROUND(CAST(o_totalprice AS DOUBLE), 2) AS totalprice
FROM (
    SELECT *, row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
) WHERE rn <= 5
"""


# --- a3: multi-branch DISTINCT aggregate (documents/indexer.go:179-188) ----
def a3_count_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count("*").alias("n_customers"),
            F.concat_ws(",", F.array_sort(F.collect_set(F.col("c_nationkey").cast("string"))))
            .alias("nation_keys"),
        )
    )


_A3_SQL = """
SELECT c_mktsegment,
       count(DISTINCT c_nationkey) AS n_nations,
       count(*) AS n_customers,
       array_to_string(list_sort(list(DISTINCT CAST(c_nationkey AS VARCHAR))), ',') AS nation_keys
FROM customer GROUP BY c_mktsegment
"""


# --- a6: complexity-summary shape (query/advanced.go:213-239) ---------------
def a6_stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("total_items"),
        F.round(F.avg("l_quantity"), 4).alias("avg_quantity"),
        F.round(F.max("l_quantity"), 2).alias("max_quantity"),
        F.sum(F.when(F.col("l_quantity") > 40, 1).otherwise(0)).alias("high_quantity_count"),
    )


_A6_SQL = """
SELECT count(*) AS total_items,
       ROUND(CAST(avg(l_quantity) AS DOUBLE), 4) AS avg_quantity,
       ROUND(CAST(max(l_quantity) AS DOUBLE), 2) AS max_quantity,
       CAST(sum(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END) AS BIGINT) AS high_quantity_count
FROM lineitem
"""


# --- a8: first-seen dedup (scip_parser.go:103-133 window form) --------------
def a8_first_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


_A8_SQL = """
SELECT user_id, event_id, event_type
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events)
WHERE rn = 1
"""


# --- o7_moving_avg: frame-window running statistics ---------------------------
def o7_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer 3-order moving average of order value (ROWS 2
    PRECEDING frame, ordered by date with orderkey tiebreak) — the
    sliding-frame window surface. Partitioned by customer, so the
    window never concentrates data (a globally-ordered frame would be
    the single-partition scale bug). Averages divide by the actual
    frame size at the partition head, matching SQL AVG frame
    semantics. The frame aggregates integer CENTS, not doubles:
    engines implement sliding frames differently (recompute vs
    subtract-on-evict running sums), so a float frame-sum is not
    bit-stable across them — an integer frame-sum is, and one final
    division gives the identical double everywhere."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    base = orders.select("o_orderkey", "o_custkey", "o_orderdate", cents.alias("cents"))
    # floor-of-cents, not ROUND: a half-cent average (x.xx5) rounds
    # differently across engines (Spark re-decimalizes the double via
    # shortest-repr BigDecimal, DuckDB rounds the raw double) — floor
    # has no boundary ambiguity on the identical quotient double.
    return base.select(
        "o_orderkey",
        "o_custkey",
        (
            F.floor(F.sum("cents").over(w) / F.count(F.lit(1)).over(w)) / 100.0
        ).alias("mavg_price"),
    )


_O7_SQL = """
SELECT o_orderkey, o_custkey,
       FLOOR(CAST(sum(cents) OVER w AS DOUBLE)
             / (count(*) OVER w)) / 100.0 AS mavg_price
FROM (
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
)
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


# --- p7_set_ops: INTERSECT / EXCEPT surface -----------------------------------
def p7_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations over (brand, type) assortments: pairs offered in
    BOTH small (<10) and large (>40) sizes, minus pairs that ever sell
    above 998 — INTERSECT then EXCEPT, each compiled by Catalyst to a
    distinct-aggregated join (left-semi / left-anti) on the pair key:
    the same one-shuffle-per-op shape as any keyed join, no quadratic
    comparison. All three inputs prune to two columns at the scan."""
    part = load_table(spark, sf_dir, "part")
    small = part.filter(F.col("p_size") < 10).select("p_brand", "p_type").distinct()
    large = part.filter(F.col("p_size") > 40).select("p_brand", "p_type").distinct()
    pricey = (
        part.filter(F.col("p_retailprice") > 998).select("p_brand", "p_type").distinct()
    )
    return small.intersect(large).exceptAll(pricey).orderBy("p_brand", "p_type")


_P7_SQL = """
(SELECT DISTINCT p_brand, p_type FROM part WHERE p_size < 10
 INTERSECT
 SELECT DISTINCT p_brand, p_type FROM part WHERE p_size > 40)
EXCEPT
SELECT DISTINCT p_brand, p_type FROM part WHERE p_retailprice > 998
ORDER BY p_brand, p_type
"""


# --- join_bloom_semi: bloom-prefiltered semi-join reduction -------------------
def join_bloom_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems whose order is urgent AND expensive, rolled up per
    return flag — served through the bloom semi-join reduction
    (operators/bloomjoin.py): the fact table is prefiltered by a 2 KiB
    broadcast bitmap of the ~14%-selective order-key set BEFORE the
    exact semi-join shuffle, so at scale the shuffle moves the
    surviving fraction, not the whole fact table. The exact join then
    removes bloom false positives, making the result identical to a
    plain EXISTS (the oracle)."""
    from codegraph_spark.operators.bloomjoin import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    )
    hit = bloom_semi_join(li, "l_orderkey", orders, "o_orderkey")
    return (
        hit.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


_BLOOM_SEMI_SQL = """
SELECT l_returnflag, count(*) AS n_items,
       ROUND(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty
FROM lineitem l
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_orderkey = l.l_orderkey
      AND o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 150000
)
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "join_bloom_semi": join_bloom_semi,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_supplier_volume": q5_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "p2_point_filter": p2_point_filter,
    "p4_not_null_filter": p4_not_null_filter,
    "p7_set_ops": p7_set_ops,
    "o6_top5_orders_per_customer": o6_top5_orders_per_customer,
    "o7_moving_avg": o7_moving_avg,
    "a3_count_distinct_multi": a3_count_distinct_multi,
    "a6_stats_summary": a6_stats_summary,
    "a8_first_event_per_user": a8_first_event_per_user,
}

ORACLES = {
    "q1_pricing_summary": _Q1_SQL,
    "join_bloom_semi": _BLOOM_SEMI_SQL,
    "q3_shipping_priority": _Q3_SQL,
    "q5_supplier_volume": _Q5_SQL,
    "q6_forecast_revenue": _Q6_SQL,
    "p2_point_filter": _P2_SQL,
    "p4_not_null_filter": _P4_SQL,
    "p7_set_ops": _P7_SQL,
    "o6_top5_orders_per_customer": _O6_SQL,
    "o7_moving_avg": _O7_SQL,
    "a3_count_distinct_multi": _A3_SQL,
    "a6_stats_summary": _A6_SQL,
    "a8_first_event_per_user": _A8_SQL,
}
