"""ETL-semantics queries: the reference's write-path operators (J4 dim
get-or-create, A2 last-wins dedup, U1/U3 MERGE) re-expressed as pure
queries over the testdata so the driver's oracle gate covers them too.
(The stateful versions run against the Parquet catalog in
tests/test_pipelines.py; these capture the same relational cores.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.plans.queries import load_table, register


@register(
    "etl_dim_surrogate_assignment",
    """
    SELECT p_brand, ROW_NUMBER() OVER (ORDER BY p_brand) AS brand_id
    FROM (SELECT DISTINCT p_brand FROM part)
    """,
    doc="""J4 core: deterministic surrogate-key assignment for a dimension —
    distinct values ordered by natural key, ids dense from 1 (SURVEY.md
    §7.3.2: ids depend only on the value set, not partitioning).""",
)
def etl_dim_surrogate_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = Window.orderBy("p_brand")
    return (
        part.select("p_brand")
        .distinct()
        .select("p_brand", F.row_number().over(w).cast("long").alias("brand_id"))
    )


@register(
    "etl_last_wins_dedup",
    """
    SELECT user_id, event_type, value AS last_value
    FROM (
      SELECT user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="""A2 core: last-wins dedup on a natural key ordered by arrival —
    the mandatory pre-MERGE step (Delta MERGE rejects duplicate source
    keys; the reference gets this implicitly from per-row re-upserts).""",
)
def etl_last_wins_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts_ns").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("value").alias("last_value"))
    )


@register(
    "etl_merge_upsert",
    """
    WITH target AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01'
    ),
    source AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    )
    SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
           COALESCE(s.o_orderstatus, t.o_orderstatus) AS merged_status,
           -- U3 quirk: totalprice plays 'carrier_id' — frozen on match,
           -- taken from source only on insert
           COALESCE(t.o_totalprice, s.o_totalprice) AS frozen_price,
           (t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL) AS was_updated
    FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
    """,
    doc="""U1/U3 core as a pure query: MERGE = full-outer coalesce — source
    wins on updated columns, target survives on frozen columns (the
    vehiculo carrier_id quirk), inserts pass through.""",
)
def etl_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    target = orders.filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    source = orders.filter(F.col("o_orderdate") >= cutoff).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t, s = target.alias("t"), source.alias("s")
    return t.join(s, F.col("t.o_orderkey") == F.col("s.o_orderkey"), "full_outer").select(
        F.coalesce(F.col("t.o_orderkey"), F.col("s.o_orderkey")).alias("o_orderkey"),
        F.coalesce(F.col("s.o_orderstatus"), F.col("t.o_orderstatus")).alias(
            "merged_status"
        ),
        F.coalesce(F.col("t.o_totalprice"), F.col("s.o_totalprice")).alias(
            "frozen_price"
        ),
        (
            F.col("t.o_orderkey").isNotNull() & F.col("s.o_orderkey").isNotNull()
        ).alias("was_updated"),
    )


@register(
    "orders_cube",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets over status x priority.",
)
def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "active_inactive_customers_except",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    """,
    doc="EXCEPT set op: customers minus recently-active customers.",
)
def active_inactive_customers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.subtract(recent)  # EXCEPT (distinct) semantics


@register(
    "events_moving_avg",
    """
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)
             AS moving_avg,
           ROUND(LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                 4) AS prev_value
    FROM events
    """,
    doc="Sliding window frame (ROWS 3 PRECEDING) + lag per user.",
)
def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    order = [F.col("ts_ns"), F.col("event_id")]
    w_avg = (
        Window.partitionBy("user_id").orderBy(*order).rowsBetween(-3, 0)
    )
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w_avg), 4).alias("moving_avg"),
        F.round(F.lag("value").over(w_lag), 4).alias("prev_value"),
    )
