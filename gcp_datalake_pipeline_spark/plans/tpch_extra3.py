"""Third batch of TPC-H-shaped adaptations — completes the full 22-query
family: market share (q8), value concentration (q11), priority counts by
line class (q12), part-supplier variety (q16), excess-volume shippers
(q20). The schema has no partsupp table and lineitem carries no
shipmode/commitdate, so q11/q12/q20 substitute lineitem-derived proxies
with the same relational shape (scalar-subquery HAVING, CASE-sum pivot,
correlated share filter) — the shapes are what the engine is exercising.

Scale notes apply to every query here: all dimension joins broadcast
(nation/region/supplier/part are tiny relative to facts at any SF); the
only shuffles are the fact-side groupBys on their natural keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.plans.queries import (
    cents,
    load_table,
    register,
    rev_micro,
)


@register(
    "q8_nation_market_share",
    """
    SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year,
           ROUND(SUM(CASE WHEN sn.n_name = 'NATION_1'
                          THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                          ELSE 0 END)
                 / SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))),
                 4) AS mkt_share
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE r_name = 'AMERICA'
    GROUP BY 1
    """,
    doc="""TPC-H Q8 shape: NATION_1 suppliers' share of revenue sold into
    the AMERICA-region customer market, per order year. Nation joined
    twice under different roles (customer side restricted via region,
    supplier side feeding the CASE numerator).

    Scale: region/nation/supplier broadcast; the orderkey and custkey
    shuffles are the only exchanges and the CASE-sum share is a map-side
    partial agg on ~7 year groups.""",
)
def q8_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One long revenue unit rides the orderkey shuffle instead of two
    # doubles (guide §2.3); limb sums below replace the decimal sums.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", rev_micro().alias("_rev_u")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cn = (
        nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        )
        .filter(F.col("r_name") == "AMERICA")
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    # Limb sums at plain-long speed; the recombined totals are the same
    # exact integers the decimal sums produced, so the single double
    # division matches the oracle's HUGEINT ratio bit-for-bit.
    from gcp_datalake_pipeline_spark.plans.queries import exact_int_sum

    n1_u = F.when(
        F.col("supp_nation") == "NATION_1", F.col("_rev_u")
    ).otherwise(F.lit(0).cast("long"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == cn.c_nk)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == sn.s_nk)
        .select(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.col("_rev_u"),
            n1_u.alias("_n1_u"),
        )
        .groupBy("order_year")
        .agg(
            F.round(
                exact_int_sum(F.col("_n1_u")).cast("double")
                / exact_int_sum(F.col("_rev_u")).cast("double"),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "q11_part_value_concentration",
    """
    WITH pv AS (
      SELECT l_partkey AS p_partkey,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS raw_cents
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY 1
    )
    SELECT p_partkey, ROUND(raw_cents / 100.0, 2) AS part_value
    FROM pv
    WHERE raw_cents > (SELECT AVG(raw_cents) FROM pv) * 1.25
    """,
    doc="""TPC-H Q11 shape (no partsupp table, so part value is the
    lineitem revenue shipped by ASIA-region suppliers): parts whose value
    exceeds 1.25x the average part value — the scalar-subquery HAVING
    threshold is the shape under test. (Region- rather than single-nation-
    restricted so the gate is non-degenerate at every test SF.)

    Scale: supplier/nation/region broadcast; one partkey shuffle builds
    pv; the average re-aggregates pv's already-reduced rows and broadcasts
    back as a 1-row cross join — no second pass over lineitem.""",
)
def q11_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One long cents unit per row into the partkey shuffle; limb sums
    # below replace the decimal sum (same exact integers recombined).
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", cents("l_extendedprice").alias("_price_c")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    sn = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("s_suppkey")
    )
    from gcp_datalake_pipeline_spark.plans.queries import exact_int_sum

    pv = (
        li.join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(exact_int_sum(F.col("_price_c")).alias("raw_cents"))
    )
    total = pv.agg(F.avg(F.col("raw_cents").cast("double")).alias("_avg"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("raw_cents").cast("double") > F.col("_avg") * 1.25)
        .select(
            "p_partkey",
            F.round(F.col("raw_cents") / F.lit(100.0), 2).alias("part_value"),
        )
    )


@register(
    "q12_priority_by_returnflag",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY 1
    """,
    doc="""TPC-H Q12 shape (no shipmode column, so the line class is
    l_returnflag): per line class, how many shipped lines belonged to
    urgent/high-priority orders vs the rest, over a 2-year ship window —
    the CASE-sum pivot against a date-range scan filter.

    Scale: the shipdate range predicate pushes to the parquet scan; one
    orderkey shuffle; 3 output groups via map-side partial agg.""",
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )


@register(
    "q16_part_supplier_variety",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      JOIN part ON l_partkey = p_partkey
    WHERE p_brand != 'Brand#1' AND p_size IN (6, 10, 20, 30, 40, 50)
    GROUP BY 1, 2, 3
    """,
    doc="""TPC-H Q16 shape (partsupp reconstructed as the distinct
    (partkey, suppkey) pairs observed in lineitem): how many distinct
    suppliers serve each (brand, type, size) bucket, excluding one brand
    and restricting sizes.

    Scale: the distinct pair set is one partkey+suppkey shuffle whose
    map-side dedup collapses ~30 lines per pair before the exchange; part
    broadcasts; countDistinct lands on small group keys.""",
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(6, 10, 20, 30, 40, 50)
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_shippers",
    """
    WITH spq AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty,
             SUM(SUM(l_quantity)) OVER (PARTITION BY l_partkey) AS part_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%widget%'
        AND l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate <  TIMESTAMP '1999-01-01'
      GROUP BY 1, 2
    )
    SELECT DISTINCT s_name, n_name
    FROM spq
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE qty > 0.5 * part_qty
    """,
    doc="""TPC-H Q20 shape (availqty proxied by shipped volume): suppliers
    who shipped the MAJORITY of some widget part's 1998 volume — the
    correlated more-than-half-of-part filter realized as a windowed share,
    then the semi-join up to supplier/nation names.

    Scale: p_name and shipdate predicates push to the scans; part
    broadcasts; one (partkey, suppkey) shuffle, and the per-part total
    reuses that exchange's partitioning (window on the groupBy's prefix
    key adds no second shuffle on the fact).""",
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    widget = part.filter(F.col("p_name").like("%widget%")).select("p_partkey")
    spq = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .join(F.broadcast(widget), li.l_partkey == widget.p_partkey)
        # One exchange serves both the pair aggregate and the per-part
        # window: hash-partitioning on l_partkey alone satisfies the
        # groupBy's clustered-distribution requirement (a subset of its
        # keys) AND the window's partitionBy — without this, Spark plans
        # a (partkey, suppkey) exchange plus a second partkey exchange.
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .withColumn(
            "part_qty", F.sum("qty").over(Window.partitionBy("l_partkey"))
        )
    )
    return (
        spq.filter(F.col("qty") > 0.5 * F.col("part_qty"))
        .join(F.broadcast(supp), spq.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name")
        .distinct()
    )
