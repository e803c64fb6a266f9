"""Event-analytics gate queries: time-series gap-fill (hypertable
`time_bucket_gapfill` + LOCF shape), funnel conversion, and cohort
retention — the standard product-analytics trio over the `events` table,
each cross-validated value-for-value against a DuckDB formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators.quality import (
    corr_matrix_oracle_sql,
)
from gcp_datalake_pipeline_spark.operators.temporal import gapfill
from gcp_datalake_pipeline_spark.plans.queries import load_table, register


@register(
    "events_daily_gapfill",
    """
    WITH agg AS (
      SELECT user_id,
             date_trunc('day', ts) AS day,
             COUNT(*)              AS n_events,
             ROUND(SUM(value), 2)  AS day_value
      FROM events
      WHERE event_type = 'purchase'
      GROUP BY user_id, date_trunc('day', ts)
    ),
    spans AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM agg GROUP BY user_id
    ),
    spine AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM spans
    )
    SELECT s.user_id,
           CAST(s.day AS TIMESTAMP)   AS day,
           COALESCE(a.n_events, 0)    AS n_events,
           COALESCE(a.day_value, 0.0) AS day_value,
           LAST_VALUE(a.day_value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )                          AS locf_value
    FROM spine s LEFT JOIN agg a ON s.user_id = a.user_id AND s.day = a.day
    """,
    doc="""Gap-filled daily purchase series per user: every day between a
    user's first and last purchase gets a row; absent days read 0 events /
    0.0 value, and locf_value carries the last observed daily total
    forward. Engine side is operators/temporal.gapfill (per-key
    sequence()+explode spine, ONE user_id shuffle shared by the join and
    the LOCF window — never a global date range, so one long-lived key
    can't inflate every key's series). Oracle regenerates the spine with
    DuckDB generate_series + IGNORE NULLS window.""",
)
def events_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("day_value"),
        )
    )
    # Thread the raw daily value through value_cols (zero-filled, exactly
    # the oracle's COALESCE(a.day_value, 0)) separately from the LOCF copy,
    # so an observed day whose SUM were NULL reads 0.0 — never the carried
    # value — without inferring observedness from n_events.
    filled = gapfill(
        agg.withColumn("_day_value_raw", F.col("day_value")),
        key="user_id",
        bucket_col="day",
        step="1 day",
        value_cols=["n_events", "_day_value_raw"],
        locf_cols=["day_value"],
    )
    return filled.select(
        "user_id",
        "day",
        "n_events",
        F.col("_day_value_raw").alias("day_value"),
        F.col("day_value").alias("locf_value"),
    )


@register(
    "funnel_signup_click_purchase",
    """
    WITH s AS (
      SELECT user_id, MIN(epoch_us(ts)) AS signup_us
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS click_us
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) >= s.signup_us
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS purchase_us
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.click_us
      GROUP BY e.user_id
    )
    SELECT s.user_id,
           s.signup_us,
           c.click_us,
           p.purchase_us,
           1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
             + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS funnel_stage
    FROM s LEFT JOIN c ON s.user_id = c.user_id
           LEFT JOIN p ON s.user_id = p.user_id
    """,
    doc="""Ordered funnel signup -> click -> purchase: per signed-up user,
    the first click at-or-after signup and the first purchase at-or-after
    that click (strictly ordered — a purchase before the first click does
    not count), plus the stage reached (1-3). Plan: three stage
    aggregations, each a map-side-combined min on user_id; every join and
    groupBy hashes on user_id, so AQE reuses one exchange layout
    end-to-end. Stage N's input is stage N-1's output — at 100 TB the
    funnel narrows monotonically, so later stages shuffle strictly less.
    Timestamps compared in microseconds (DuckDB truncates the parquet
    nanos).""",
)
def funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts_ns div 1000").alias("ts_us")
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("signup_us"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts_us") >= F.col("signup_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("click_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") >= F.col("click_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("purchase_us"))
    )
    return (
        s.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "signup_us",
            "click_us",
            "purchase_us",
            (
                F.lit(1)
                + F.when(F.col("click_us").isNull(), 0).otherwise(1)
                + F.when(F.col("purchase_us").isNull(), 0).otherwise(1)
            ).alias("funnel_stage"),
        )
    )


@register(
    "cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT CAST(f.cohort_day AS TIMESTAMP)                    AS cohort_day,
           datediff('day', f.cohort_day, date_trunc('day', e.ts)) AS day_offset,
           COUNT(DISTINCT e.user_id)                          AS active_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY f.cohort_day, datediff('day', f.cohort_day, date_trunc('day', e.ts))
    """,
    doc="""Cohort retention triangle: users grouped by first-activity day,
    counted distinct on each subsequent day offset. Plan: first-touch agg
    on user_id (map-side combine), join back on user_id (same hash as the
    agg — AQE-coalesced), then a distinct count keyed on the small
    (cohort, offset) grid. The distinct expands to (cohort, offset,
    user_id) partial dedup before the final count, so the wide shuffle
    carries already-deduplicated keys.""",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@register(
    "lineitem_corr_matrix",
    corr_matrix_oracle_sql(
        "lineitem", ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]
    ),
    doc="""Exact Pearson correlation matrix over the lineitem measures:
    sufficient statistics accumulate as exact DECIMALs (order-free, so
    cross-engine float summation cannot diverge) and only the final
    closed form runs in double. Scale: ONE scan, all sums map-side
    combined into a single row; never DuckDB's/Spark's streaming CORR,
    whose accumulation order is engine-dependent.""",
)
def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators.quality import corr_matrix

    return corr_matrix(
        load_table(spark, sf_dir, "lineitem"),
        ["l_discount", "l_extendedprice", "l_quantity", "l_tax"],
    )


@register(
    "events_ntile_cume",
    """
    SELECT event_id, event_type,
           NTILE(4) OVER w AS quartile,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
    doc="""Distribution-rank window breadth (SURVEY §2.8): per-type value
    quartiles (NTILE) and cumulative distribution (CUME_DIST) with a
    unique (value, event_id) order so both are deterministic. Scale:
    one hash-partitioned window by event_type — no global sort.""",
)
def events_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
