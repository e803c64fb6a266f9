"""Temporal-join gate queries: the engine's as-of join and bounded range
join cross-validated against DuckDB's native ASOF JOIN / inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators.temporal import (
    as_of_join,
    range_join_within,
)
from gcp_datalake_pipeline_spark.plans.queries import load_table, register


@register(
    "asof_click_before_error",
    """
    SELECT a.event_id,
           a.user_id,
           b.event_id AS click_event_id,
           epoch_us(a.ts) - epoch_us(b.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'error') a
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
      ON a.user_id = b.user_id AND a.ts >= b.ts
    """,
    doc="""As-of join: for every 'error' event, the latest 'click' by the
    same user at-or-before it (NULL when none). Engine implementation is
    the union+last_value composition (one shuffle, operators/temporal.py);
    oracle is DuckDB's native ASOF LEFT JOIN — two independent
    formulations agreeing on nanosecond timestamps.""",
)
def asof_click_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts_ns")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("ts_ns").alias("click_ts_ns"),
    )
    joined = as_of_join(
        errors,
        clicks,
        key="user_id",
        left_ts="ts_ns",
        right_ts="click_ts_ns",
        right_cols=["click_event_id", "click_ts_ns"],
        suffix="",
    )
    # DuckDB reads the parquet nanosecond timestamps truncated to
    # microseconds, so the comparable gap is between us-truncated stamps.
    us = lambda c: F.expr(f"{c} div 1000")
    return joined.select(
        "event_id",
        "user_id",
        "click_event_id",
        (us("ts_ns") - us("click_ts_ns")).alias("gap_us"),
    )


@register(
    "events_within_minute_pairs",
    """
    SELECT a.event_id AS event_a, b.event_id AS event_b, a.user_id,
           abs(epoch_us(a.ts) - epoch_us(b.ts)) AS gap_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= CAST(60000000 AS BIGINT)
    """,
    doc="""Bounded range join: same-user event pairs within 60 s. Engine
    side rewrites the inequality join as a bucketed equi-join
    (operators/temporal.py); oracle states the naive inequality join.""",
)
def events_within_minute_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts_ns"
    )
    ev = ev.withColumn("ts_us", F.expr("ts_ns div 1000")).drop("ts_ns")
    pairs = range_join_within(
        ev,
        ev,
        key="user_id",
        left_ts="ts_us",
        right_ts="ts_us",
        tolerance=60 * 1_000_000,
        how_filter=F.col("event_id") < F.col("event_id_r"),
    )
    return pairs.select(
        F.col("event_id").alias("event_a"),
        F.col("event_id_r").alias("event_b"),
        "user_id",
        F.abs(F.col("ts_us") - F.col("ts_us_r")).alias("gap_us"),
    )
