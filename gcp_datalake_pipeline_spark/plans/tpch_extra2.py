"""Second batch of TPC-H-shaped adaptations: nation-pair volume (q7),
profit by nation x year (q9), customer order-count histogram (q13), top
supplier by revenue (q15), small-quantity revenue (q17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.plans.queries import (
    cents,
    load_table,
    money_2dp,
    register,
    rev_micro,
)


@register(
    "q7_nation_pair_volume",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           EXTRACT(YEAR FROM l_shipdate) AS ship_year,
           ((ABS(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))) + 50) // 100) * (CASE WHEN SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) < 0 THEN -1 ELSE 1 END) / 100.0 AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name != sn.n_name
    GROUP BY 1, 2, 3
    """,
    doc="""TPC-H Q7 shape: cross-nation trade volume, nation dim joined
    twice under different roles. Scale: both nation aliases broadcast;
    one orderkey shuffle.""",
)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One long unit (projected once) rides the orderkey shuffle instead
    # of two doubles (guide §2.3).
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", rev_micro().alias("_rev_u")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    pair = ["NATION_1", "NATION_2"]
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == cn.c_nk)
        .join(F.broadcast(sn), supp.s_nationkey == sn.s_nk)
        .filter(
            F.col("cust_nation").isin(pair)
            & F.col("supp_nation").isin(pair)
            & (F.col("cust_nation") != F.col("supp_nation"))
        )
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            money_2dp(F.col("_rev_u"), 10000).alias("revenue")
        )
    )


@register(
    "q9_profit_by_nation_year",
    """
    SELECT n_name, EXTRACT(YEAR FROM o_orderdate) AS order_year,
           ((ABS(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                     * (100 - CAST(ROUND(l_tax * 100) AS BIGINT)))) + 5000) // 10000)
             / 100.0 AS profit_proxy
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY 1, 2
    """,
    doc="""TPC-H Q9 shape (no partsupp table in the schema, so cost is a
    tax-based proxy): profit per supplier nation per order year.""",
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Project the exact profit unit before the orderkey shuffle: one
    # long instead of three doubles per lineitem row (guide §2.3).
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (rev_micro() * (100 - cents("l_tax"))).alias("_profit_u"),
    )
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            money_2dp(F.col("_profit_u"), 1000000).alias("profit_proxy")
        )
    )


@register(
    "q13_customer_order_histogram",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority != '5-LOW'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    doc="""TPC-H Q13 shape: two-level aggregation — orders per customer
    (left join keeps order-less customers at 0) then the distribution.""",
)
def q13_customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey, ((ABS(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))) + 50) // 100) * (CASE WHEN SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) < 0 THEN -1 ELSE 1 END) / 100.0
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    doc="""TPC-H Q15 shape: top supplier via scalar-max subquery (keeps
    ties, so no LIMIT nondeterminism). Rounded revenue on both sides
    before the equality compare.""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.select("l_suppkey", rev_micro().alias("_rev_u"))
        .groupBy("l_suppkey")
        .agg(money_2dp(F.col("_rev_u"), 10000).alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue")).first()[0]
    return (
        rev.filter(F.col("total_revenue") == max_rev)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q21_sole_latest_shipper",
    """
    WITH per_supp AS (
      SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_last
      FROM lineitem GROUP BY l_orderkey, l_suppkey
    ),
    per_order AS (
      SELECT l_orderkey,
             MAX(supp_last) AS order_last,
             COUNT(*) AS n_supps
      FROM per_supp GROUP BY l_orderkey
    ),
    latest AS (
      SELECT p.l_orderkey, p.l_suppkey
      FROM per_supp p JOIN per_order o ON p.l_orderkey = o.l_orderkey
      WHERE o.n_supps >= 2 AND p.supp_last = o.order_last
        AND 1 = (SELECT COUNT(*) FROM per_supp q
                 WHERE q.l_orderkey = p.l_orderkey AND q.supp_last = o.order_last)
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM latest JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """,
    doc="""TPC-H Q21 shape (adapted: no commit dates in schema): for
    multi-supplier orders, the unique supplier who shipped last — a
    double-correlated exists/uniqueness condition, expressed with grouped
    maxima + a uniqueness count instead of correlated subqueries.""",
)
def q21_sole_latest_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_last")
    )
    # Window formulation: order_last / n_supps / n_at_max all ride ONE
    # exchange on l_orderkey (same partitioning -> Catalyst reuses it),
    # where the agg+self-join shape re-shuffled the per-supplier rows a
    # second time and joined them back — 2 lineitem-scale exchanges
    # total instead of 3.
    w = Window.partitionBy("l_orderkey")
    x = per_supp.select(
        "*",
        F.max("supp_last").over(w).alias("order_last"),
        F.count(F.lit(1)).over(w).alias("n_supps"),
    ).filter(
        (F.col("n_supps") >= 2) & (F.col("supp_last") == F.col("order_last"))
    )
    # uniqueness: exactly one supplier at the order max (same
    # partitioning again -> still no new exchange)
    latest = x.withColumn("n_at_max", F.count(F.lit(1)).over(w)).filter(
        F.col("n_at_max") == 1
    )
    return (
        latest.join(F.broadcast(supp), latest.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "orders_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS (status-only, priority-only, grand total).",
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT ((2 * SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) + 7) // 14) / 100.0 AS avg_yearly
    FROM lineitem JOIN (
      SELECT l_partkey AS pk, 0.2 * AVG(l_quantity) AS threshold
      FROM lineitem GROUP BY l_partkey
    ) t ON l_partkey = pk
    WHERE l_quantity < threshold
    """,
    doc="""TPC-H Q17 shape: correlated per-part average threshold.
    Float-compare note: the 0.2*avg threshold and l_quantity are compared
    raw in both engines; avg over doubles is summed in arbitrary order, but
    quantities are integers 1..50 stored as doubles, so the sum (and
    threshold) is exact in both engines.""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    thresholds = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("threshold")
    )
    return (
        li.join(thresholds, li.l_partkey == thresholds.pk)
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg((F.floor(
            (2 * F.sum(cents("l_extendedprice").cast("decimal(30,0)")) + 7) / F.lit(14)
        ).cast("double") / F.lit(100.0)).alias("avg_yearly"))
    )
