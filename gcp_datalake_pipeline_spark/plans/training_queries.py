"""Round-3 training-corpus + warehouse-maintenance gate queries:
domain-mixture rebalancing, tokenizer vocabulary building, equi-width
histograms, unpivot (wide->long), and incremental aggregate refresh —
each with a value-level DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators import sampling
from gcp_datalake_pipeline_spark.operators.incremental import (
    partial_aggregate,
    refresh_aggregate,
)
from gcp_datalake_pipeline_spark.plans.queries import (
    cents,
    load_table,
    money_2dp,
    register,
)

_MIX_SHARES = {"en": 0.4, "zh": 0.15, "es": 0.15, "de": 0.15, "fr": 0.15}


@register(
    "domain_mixture_rebalance",
    sampling.mixture_rebalance_oracle_sql("lang", _MIX_SHARES),
    doc="""Domain/language mixture rebalancing (the data-mixture step of a
    training pipeline): solve for the largest corpus satisfying a target
    per-language share (S = floor(min n_l/T_l)), then hash-sample each
    language to its share. Output is the per-language plan plus the
    REALIZED kept counts after the md5-bucket filter, so the oracle checks
    both the arithmetic and the sampling membership. Scale: plan is a
    tiny per-stratum aggregate broadcast onto the corpus; membership is a
    narrow md5 filter — no corpus shuffle, no driver collect.""",
)
def domain_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sampled, plan = sampling.mixture_rebalance(docs, "lang", _MIX_SHARES)
    return _plan_with_kept(plan, sampled)


def _plan_with_kept(plan: DataFrame, sampled: DataFrame) -> DataFrame:
    """Shared gate shape of the mixture samplers: the plan plus the
    REALIZED kept counts after the membership filter."""
    kept = sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("kept_rows"))
    return plan.join(kept, "lang", "left").select(
        "lang",
        "n_rows",
        "keep_buckets",
        F.coalesce("kept_rows", F.lit(0)).alias("kept_rows"),
    )


@register(
    "vocab_top_tokens",
    """
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(text, '\\s+')) AS token
      FROM documents
    )
    SELECT token, COUNT(*) AS n
    FROM toks
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 500
    """,
    doc="""Tokenizer vocabulary building: global top-500 whitespace tokens
    by frequency (tiebreak: token text, so the LIMIT boundary is
    deterministic). The word-count shape at 100 TB: explode is narrow,
    the count is map-side combined on the token key, and only the
    per-partition top-500 reaches the final exchange (TakeOrderedAndProject
    keeps k rows per partition).""",
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators.text import TOKEN_SPLIT_RE

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.split(F.col("text"), TOKEN_SPLIT_RE)).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(500)
    )


@register(
    "order_value_histogram",
    """
    WITH stats AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
    )
    SELECT LEAST(CAST(FLOOR((o_totalprice - lo) / ((hi - lo) / 20)) AS BIGINT),
                 19)                                            AS bin,
           ROUND(lo + LEAST(CAST(FLOOR((o_totalprice - lo) / ((hi - lo) / 20))
                                 AS BIGINT), 19) * ((hi - lo) / 20), 2)
                                                                AS bin_lo,
           COUNT(*)                                             AS n_orders
    FROM orders, stats
    GROUP BY 1, 2
    """,
    doc="""Equi-width histogram (20 bins) over order value: global min/max
    as a broadcast scalar, bin index as a narrow expression, counts
    map-side combined on <=20 keys. The profiling primitive for numeric
    columns; both sides run the identical IEEE double arithmetic so bin
    boundaries agree bit-for-bit.""",
)
def order_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / 20
    bin_ = F.least(
        F.floor((F.col("o_totalprice") - F.col("lo")) / width).cast("long"),
        F.lit(19),
    )
    return (
        orders.crossJoin(F.broadcast(stats))
        .groupBy(
            bin_.alias("bin"),
            F.round(F.col("lo") + bin_ * width, 2).alias("bin_lo"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "pricing_summary_unpivot",
    """
    WITH agg AS (
      SELECT l_returnflag, l_linestatus,
             ROUND(SUM(l_quantity), 2)      AS sum_qty,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_price,
             CAST(COUNT(*) AS DOUBLE)       AS n_items
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus, 'sum_qty' AS metric, sum_qty AS value
    FROM agg
    UNION ALL
    SELECT l_returnflag, l_linestatus, 'sum_price', sum_price FROM agg
    UNION ALL
    SELECT l_returnflag, l_linestatus, 'n_items', n_items FROM agg
    """,
    doc="""Unpivot / melt (wide -> long): the inverse of the pivot gate
    query, via Spark's native unpivot operator (Expand node: each input
    row fans out to one row per metric — narrow, no shuffle after the
    aggregate). Oracle states the long layout as a UNION ALL.""",
)
def pricing_summary_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        money_2dp(cents("l_extendedprice"), 100).alias("sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_items"),
    )
    return agg.unpivot(
        ["l_returnflag", "l_linestatus"],
        ["sum_qty", "sum_price", "n_items"],
        "metric",
        "value",
    )


@register(
    "incremental_orders_by_month",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0      AS revenue,
           COUNT(*)                         AS n_orders
    FROM orders
    GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE)
    """,
    doc="""Incremental aggregate maintenance (operators/incremental.py):
    the engine materializes the monthly aggregate over orders BEFORE
    1998-01-01, then refreshes it with the 1998+ delta by merging partial
    states — untouched months pass through verbatim (left_anti), affected
    months combine partials (broadcast delta keys). The oracle is the
    full recompute over all orders: the incremental path must be
    indistinguishable from it. At 100 TB the refresh reads O(delta +
    affected groups), not the history.""",
)
def incremental_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    # DATE on both sides: Spark's date_trunc returns TIMESTAMP while
    # DuckDB's returns DATE — cast, exactly as orders_by_month does.
    month = F.date_trunc("month", "o_orderdate").cast("date")
    base = partial_aggregate(
        orders.filter(F.col("o_orderdate") < cut).withColumn("month", month),
        ["month"],
        {"revenue": "o_totalprice"},
        "n_orders",
    )
    delta = partial_aggregate(
        orders.filter(F.col("o_orderdate") >= cut).withColumn("month", month),
        ["month"],
        {"revenue": "o_totalprice"},
        "n_orders",
    )
    merged = refresh_aggregate(base, delta, ["month"], ["revenue"], "n_orders")
    return merged.select(
        "month", F.round("revenue", 2).alias("revenue"), "n_orders"
    )


@register(
    "mixture_temperature",
    sampling.temperature_mixture_oracle_sql("lang"),
    doc="""Temperature-scaled mixture resampling (Conneau et al., XLM-R,
    arXiv:1911.02116): stratum shares proportional to n^tau computed
    FROM the corpus (no explicit targets), tau=0.5 — the multilingual
    balancing step that upsamples tail languages relative to the head.
    The whole plan is in-engine sqrt/floor arithmetic (sqrt is IEEE
    correctly-rounded in both engines, so every floor boundary agrees
    cross-engine); output is the per-language plan plus REALIZED kept
    counts after the md5-bucket filter, so the oracle pins the
    arithmetic AND the sampling membership. Scale: one strata-sized
    aggregate broadcast onto the corpus, narrow md5 filter — no corpus
    shuffle, no driver collect.""",
)
def mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sampled, plan = sampling.temperature_mixture(docs, "lang", tau=0.5)
    return _plan_with_kept(plan, sampled).orderBy("lang")
