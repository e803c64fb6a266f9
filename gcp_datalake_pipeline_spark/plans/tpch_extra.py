"""Additional TPC-H-shaped queries adapted to the testdata schema:
correlated EXISTS/IN subqueries, HAVING over grouped facts, disjunctive
multi-column predicates, scalar-subquery thresholds, and an HLL sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.plans.queries import (
    cents,
    load_table,
    money_2dp,
    register,
    rev_micro,
)


@register(
    "q4_priority_with_late_items",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="""TPC-H Q4 shape: correlated EXISTS -> left_semi join.
    Scale: the semi join shuffles both sides on orderkey once; the date
    filter prunes the probe side at the scan.""",
)
def q4_priority_with_late_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    # EXISTS(item with l_shipdate > o_orderdate) == the order's MAX
    # l_shipdate exceeds o_orderdate (the comparand is constant per
    # order), so pre-aggregate lineitem to one (orderkey, max_shipdate)
    # row before the join: map-side combine collapses the ~4 items/order
    # BEFORE the exchange (guide §2.3 — aggregate before you shuffle),
    # and each order matches at most one row, so the inner join is
    # duplication-free and value-identical to the left_semi.
    li_max = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("_max_ship"))
    )
    late = orders.join(
        li_max,
        (orders.o_orderkey == li_max.l_orderkey)
        & (li_max._max_ship > orders.o_orderdate),
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "q14_red_part_revenue_share",
    """
    SELECT ROUND(100.0 * SUM(CASE WHEN p_name LIKE 'red%'
                                  THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                                  ELSE 0 END)
                 / SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))),
                 4) AS red_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-07-01'
    """,
    doc="""TPC-H Q14 shape: conditional-aggregate ratio over a dim join.
    Scale: part broadcasts; single scan of the date-pruned lineitem.""",
)
def q14_red_part_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    # Limb sums (plain long aggregation) instead of two decimal sums:
    # the per-row revenue unit is projected once, and the red share is
    # still an exact-integer ratio — the recombined limb totals are the
    # same integers the decimal sums produced, so the single double
    # division is bit-identical to the oracle's HUGEINT ratio.
    from gcp_datalake_pipeline_spark.plans.queries import exact_int_sum

    pre = li.select("l_partkey", rev_micro().alias("_rev_u")).join(
        F.broadcast(part.select("p_partkey", "p_name")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    red_u = F.when(F.col("p_name").like("red%"), F.col("_rev_u")).otherwise(
        F.lit(0).cast("long")
    )
    return pre.select(F.col("_rev_u"), red_u.alias("_red_u")).agg(
        F.round(
            F.lit(100.0)
            * exact_int_sum(F.col("_red_u")).cast("double")
            / exact_int_sum(F.col("_rev_u")).cast("double"),
            4,
        ).alias("red_share_pct")
    )


@register(
    "q18_large_volume_customers",
    """
    SELECT c_custkey, c_name, o_orderkey,
           ROUND(o_totalprice, 2) AS totalprice, qty_sum
    FROM (
      SELECT l_orderkey, SUM(l_quantity) AS qty_sum FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 100
    ) big
    JOIN orders ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY qty_sum DESC, o_orderkey
    LIMIT 100
    """,
    doc="""TPC-H Q18 shape: HAVING over a grouped fact feeding joins + top-k.
    Scale: the groupBy(orderkey) pre-aggregates lineitem down before any
    join; quantity sums are integral doubles so the HAVING threshold and
    sort are exact.""",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty_sum"))
        .filter(F.col("qty_sum") > 100)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            "qty_sum",
        )
        .orderBy(F.col("qty_sum").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    """
    SELECT ((ABS(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))) + 50) // 100) * (CASE WHEN SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) < 0 THEN -1 ELSE 1 END) / 100.0 AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity >= 10)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20 AND l_quantity >= 5)
       OR (p_name LIKE 'small%' AND l_discount > 0.05)
    """,
    doc="""TPC-H Q19 shape: disjunctive mixed-table predicates on a join.
    Scale: part broadcasts; the disjunction evaluates post-join (no
    pushdown possible across tables) inside one codegen stage.""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & (F.col("l_quantity") >= 10)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(5, 20)
            & (F.col("l_quantity") >= 5)
        )
        | (F.col("p_name").like("small%") & (F.col("l_discount") > 0.05))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        # single evaluation of the unit expression per surviving row
        .select(rev_micro().alias("_rev_u"))
        .agg(money_2dp(F.col("_rev_u"), 10000).alias("revenue"))
    )


@register(
    "q22_wealthy_inactive_customers",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0 AS total_balance
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
    doc="""TPC-H Q22 shape: scalar-subquery threshold + anti join.
    Scale: the avg is one tiny aggregate broadcast as a literal; the anti
    join prunes with the date filter first.""",
)
def q22_wealthy_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal"))
        .first()[0]
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        cust.filter(F.col("c_acctbal") > avg_bal)
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_2dp(cents("c_acctbal"), 100).alias("total_balance"),
        )
    )


@register(
    "q6_revenue_forecast",
    """
    SELECT ((ABS(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
              * CAST(ROUND(l_discount * 100) AS BIGINT))) + 50) // 100)
             / 100.0 AS revenue_delta
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="""TPC-H Q6 shape: pure scan-filter-aggregate, the pushdown
    benchmark — every predicate reaches the parquet reader.""",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        money_2dp(
            cents("l_extendedprice") * cents("l_discount"), 10000
        ).alias("revenue_delta")
    )


@register(
    "q2_cheapest_part_per_type",
    """
    SELECT p.p_type, p.p_partkey, ROUND(p.p_retailprice, 2) AS price
    FROM part p
    JOIN (SELECT p_type, MIN(p_retailprice) AS mn FROM part GROUP BY p_type) m
      ON p.p_type = m.p_type AND p.p_retailprice = m.mn
    """,
    doc="""TPC-H Q2 shape: correlated-min subquery -> groupBy + self-join
    back on (key, min). Ties keep all achieving rows (same in both
    engines; no LIMIT so no tie-break needed).""",
)
def q2_cheapest_part_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").alias("p")
    mins = (
        load_table(spark, sf_dir, "part")
        .groupBy(F.col("p_type").alias("mt"))
        .agg(F.min("p_retailprice").alias("mn"))
    )
    return (
        part.join(
            mins,
            (F.col("p.p_type") == F.col("mt"))
            & (F.col("p.p_retailprice") == F.col("mn")),
        )
        .select(
            F.col("p.p_type").alias("p_type"),
            "p_partkey",
            F.round(F.col("p.p_retailprice"), 2).alias("price"),
        )
    )


@register(
    "building_and_urgent_customers_intersect",
    """
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    doc="INTERSECT set op (distinct semantics both sides).",
)
def building_and_urgent_customers_intersect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    building = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    return urgent.intersect(building)


@register(
    "order_value_percentiles",
    """
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders GROUP BY o_orderstatus
    """,
    doc="""Exact interpolated percentiles per status (Spark `percentile` ==
    DuckDB `quantile_cont`, verified bit-equal). The sketch-based
    approx_percentile is the 100 TB variant.""",
)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", 0.5), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", 0.9), 4).alias("p90"),
            F.round(F.percentile("o_totalprice", 0.99), 4).alias("p99"),
        )
    )


@register(
    "nations_per_region_agg",
    """
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="Ordered string aggregation (collect_list -> sort -> join).",
)
def nations_per_region_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@register(
    "customer_balance_percent_rank",
    """
    SELECT c_custkey, c_mktsegment,
           ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal, c_custkey), 6) AS bal_pr,
           NTILE(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal, c_custkey) AS bal_quartile
    FROM customer
    """,
    doc="Rank-family windows: percent_rank + ntile within segment.",
)
def customer_balance_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("bal_pr"),
        F.ntile(4).over(w).alias("bal_quartile"),
    )


@register(
    "approx_distinct_users_hll",
    None,  # HLL estimates are engine-specific; pytest bounds it vs exact
    doc="""HyperLogLog sketch: approx_count_distinct users per event_type —
    the 100 TB substitute for exact multi-distinct (fixed-size sketch,
    map-side mergeable). Verified within rsd bounds against the exact count
    in pytest.""",
)
def approx_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
