"""ETL-semantics queries: the reference's write-path operators (J4 dim
get-or-create, A2 last-wins dedup, U1/U3 MERGE) re-expressed as pure
queries over the testdata so the driver's oracle gate covers them too.
(The stateful versions run against the Parquet catalog in
tests/test_pipelines.py; these capture the same relational cores.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.plans.queries import (
    cents,
    load_table,
    money_2dp,
    register,
)

_SCRATCH: dict[str, str] = {}


def _scratch_root(key: str) -> str:
    """Scratch-catalog dir for a self-materializing registry query: ONE
    mkdtemp per (query, sf) per process, registered for atexit removal —
    a bench/verify sweep that calls the query N times reuses the first
    dir (the query skips re-materialization when its table exists) and
    leaves nothing behind at exit (VERDICT r8 #3). The dir cannot be
    removed eagerly: the returned DataFrame reads it lazily."""
    import atexit
    import shutil
    import tempfile

    if key not in _SCRATCH:
        d = tempfile.mkdtemp(prefix=f"{key}_")
        _SCRATCH[key] = d
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    return _SCRATCH[key]


@register(
    "etl_dim_surrogate_assignment",
    """
    SELECT p_brand, ROW_NUMBER() OVER (ORDER BY p_brand) AS brand_id
    FROM (SELECT DISTINCT p_brand FROM part)
    """,
    doc="""J4 core: deterministic surrogate-key assignment for a dimension —
    distinct values ordered by natural key, ids dense from 1 (SURVEY.md
    §7.3.2: ids depend only on the value set, not partitioning). Runs the
    SHARDED assigner (operators/dims.py assign_dense_ids: range-partition +
    per-shard row_number + exclusive-scan offsets — no single-task global
    window), which must reproduce the global ROW_NUMBER oracle exactly.""",
)
def etl_dim_surrogate_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators.dims import assign_dense_ids

    part = load_table(spark, sf_dir, "part")
    return assign_dense_ids(
        part.select("p_brand").distinct(), ["p_brand"], "brand_id"
    ).select("p_brand", "brand_id")


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
    "etl_merge_upsert_atomic",
    """
    WITH b1 AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '1997-01-01'
    ),
    b2 AS (
      SELECT o_orderkey, lower(o_orderstatus) AS o_orderstatus,
             ROUND(o_totalprice + 1, 2) AS o_totalprice
      FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    )
    SELECT COALESCE(b2.o_orderkey, b1.o_orderkey) AS o_orderkey,
           COALESCE(b2.o_orderstatus, b1.o_orderstatus) AS status,
           COALESCE(b2.o_totalprice, b1.o_totalprice) AS price
    FROM b1 FULL OUTER JOIN b2 ON b1.o_orderkey = b2.o_orderkey
    """,
    doc="""The U1 merge run through the REAL storage engine under a REAL
    TransactionalCatalog transaction: batch 1 seeds the table, batch 2
    (overlapping 1996 keys, visibly mutated) merges inside a
    transaction+commit, and the result is read back through a FRESH
    catalog object resolving the committed manifest — so the atomic
    commit protocol itself (staged write -> intent resolution under the
    commit flock -> pointer swap -> manifest-resolved read) sits under
    the driver's value-level oracle, not only pytest. The oracle is the
    merge's relational semantics: full-outer coalesce, source wins on
    update columns, inserts pass through.""",
)
def etl_merge_upsert_atomic(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    root = _scratch_root(f"etl_merge_atomic_{os.path.basename(sf_dir)}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("orders_m"):  # warm rerun reuses the committed lake
        orders = load_table(spark, sf_dir, "orders")
        b1 = orders.filter(
            F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
        ).select("o_orderkey", "o_orderstatus", "o_totalprice")
        b2 = orders.filter(
            F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
        ).select(
            "o_orderkey",
            F.lower("o_orderstatus").alias("o_orderstatus"),
            F.round(F.col("o_totalprice") + 1, 2).alias("o_totalprice"),
        )
        with cat.transaction("seed"):
            cat.merge_upsert(b1, "orders_m", key_cols=["o_orderkey"])
        with cat.transaction("merge-batch-2"):
            cat.merge_upsert(b2, "orders_m", key_cols=["o_orderkey"])
    reader = TransactionalCatalog(spark=spark, root=root)
    return reader.read("orders_m").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )


@register(
    "etl_quarantine_reasons",
    """
    WITH dirty AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE c_name END AS c_name,
             CASE WHEN c_custkey % 17 = 0 THEN '' ELSE c_mktsegment END AS c_mktsegment,
             CASE WHEN c_custkey % 19 = 0 THEN NULL ELSE c_acctbal END AS c_acctbal
      FROM customer
    )
    SELECT c_custkey,
           CASE WHEN c_name IS NULL OR trim(c_name) = '' THEN 'missing_name'
                WHEN c_mktsegment IS NULL OR trim(c_mktsegment) = ''
                     THEN 'missing_segment'
                WHEN c_acctbal IS NULL THEN 'missing_acctbal'
                ELSE 'valid' END AS disposition
    FROM dirty
    """,
    doc="""§2.11 validate-then-split under the oracle gate: deterministic
    dirt (keys divisible by 13/17/19 lose a required field) is pushed
    through the REAL quarantine operator (operators/quarantine.py
    validate_split — ordered rules, first failing rule wins, the
    reference's per-row error accounting) and the valid/quarantine streams
    are recombined as per-row dispositions. Scale: pure narrow CASE logic,
    zero shuffles.""",
)
def etl_quarantine_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators.quarantine import (
        Rule,
        validate_split,
    )

    cust = load_table(spark, sf_dir, "customer")
    dirty = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 13 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_name"))
        .alias("c_name"),
        F.when(F.col("c_custkey") % 17 == 0, F.lit(""))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        F.when(F.col("c_custkey") % 19 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    blankish = lambda c: F.col(c).isNull() | (F.trim(F.col(c)) == "")  # noqa: E731
    rules = [
        Rule("missing_name", blankish("c_name")),
        Rule("missing_segment", blankish("c_mktsegment")),
        Rule("missing_acctbal", F.col("c_acctbal").isNull()),
    ]
    valid, quar = validate_split(dirty, rules)
    return valid.select(
        "c_custkey", F.lit("valid").alias("disposition")
    ).unionByName(
        quar.select("c_custkey", F.col("error_reason").alias("disposition"))
    )


@register(
    "gold_current_state",
    """
    WITH latest AS (
      SELECT o_custkey, o_orderdate, o_totalprice, o_orderstatus
      FROM (
        SELECT o_custkey, o_orderdate, o_totalprice, o_orderstatus,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
      ) WHERE rn = 1
    )
    SELECT c.c_custkey, c.c_name, n.n_name,
           l.o_orderdate AS last_order_date,
           l.o_totalprice AS last_order_price,
           l.o_orderstatus AS last_order_status
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    LEFT JOIN latest l ON l.o_custkey = c.c_custkey
    """,
    doc="""Gold current-state view under the oracle gate: the REAL
    pipelines/gold.py _latest_per helper (window dedup, rank 1) plus a
    broadcast dim join — the exact shape of vehicle_current_state over the
    driver-visible star schema. Scale: one shuffle on the entity key for
    the window; dims broadcast; history deduped BEFORE the join so the
    entity table never fans out.""",
)
def gold_current_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.pipelines.gold import _latest_per

    latest = _latest_per(
        load_table(spark, sf_dir, "orders"),
        "o_custkey",
        ["o_orderdate", "o_orderkey"],
    ).select("o_custkey", "o_orderdate", "o_totalprice", "o_orderstatus")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        cust.join(
            F.broadcast(nation),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .join(latest, F.col("o_custkey") == F.col("c_custkey"), "left")
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("o_orderdate").alias("last_order_date"),
            F.col("o_totalprice").alias("last_order_price"),
            F.col("o_orderstatus").alias("last_order_status"),
        )
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


@register(
    "etl_scd2_history",
    """
    WITH snap AS (
      SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal, c_mktsegment
      FROM customer
    )
    SELECT c_custkey, c_name, acctbal, c_mktsegment,
           TIMESTAMP '2024-01-01' AS valid_from,
           CASE WHEN c_custkey % 7 = 0 THEN TIMESTAMP '2024-02-01'
                ELSE CAST(NULL AS TIMESTAMP) END AS valid_to,
           c_custkey % 7 <> 0 AS is_current
    FROM snap
    UNION ALL
    SELECT c_custkey, c_name, acctbal + 100.0, c_mktsegment,
           TIMESTAMP '2024-02-01', CAST(NULL AS TIMESTAMP), TRUE
    FROM snap WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey + 1000000, c_name, acctbal, c_mktsegment,
           TIMESTAMP '2024-02-01', CAST(NULL AS TIMESTAMP), TRUE
    FROM snap WHERE c_custkey % 13 = 0
    """,
    doc="""SCD Type-2 historization (operators/scd.py scd2_apply): two
    snapshot batches applied from empty — batch 2 changes acctbal for
    custkey%7 keys (+100.0) and introduces custkey%13 new keys. History
    must show: one closed row per changed key (valid_to = batch-2 stamp),
    one open row with the new value, untouched open rows for unchanged
    keys, and fresh open rows for new keys. The oracle states the expected
    history declaratively; the engine derives it through two real
    full-outer-join + conditional-explode merge passes — per batch ONE
    hash join on the business key (the same exchange a plain upsert
    needs), never a MERGE loop or per-row path.""",
)
def etl_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators.scd import scd2_apply

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.round("c_acctbal", 2).alias("acctbal"),
        "c_mktsegment",
    )
    keys, tracked = ["c_custkey"], ["c_name", "acctbal", "c_mktsegment"]
    batch2 = cust.withColumn(
        "acctbal",
        F.when(F.col("c_custkey") % 7 == 0, F.col("acctbal") + 100.0).otherwise(
            F.col("acctbal")
        ),
    ).unionByName(
        cust.filter(F.col("c_custkey") % 13 == 0).withColumn(
            "c_custkey", F.col("c_custkey") + 1000000
        )
    )
    h1 = scd2_apply(None, cust, keys, tracked, "2024-01-01")
    return scd2_apply(h1, batch2, keys, tracked, "2024-02-01")


@register(
    "etl_scd2_asof",
    """
    SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal, c_mktsegment
    FROM customer
    """,
    doc="""Point-in-time read over the SCD2 history (operators/scd.py
    scd2_asof): the same two-batch history as etl_scd2_history, queried
    AS OF 2024-01-15 — between the batches — must reproduce the batch-1
    snapshot exactly: changed keys show their pre-change acctbal (their
    +100.0 row only opens at 2024-02-01), batch-2-new keys are absent,
    and no key appears twice (the closed/open range filter must pick
    exactly one version). The oracle is simply the original customer
    snapshot, which is what the lake looked like at that instant. The
    as-of read itself is a narrow filter over the history scan — no
    join, no shuffle.""",
)
def etl_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators.scd import scd2_apply, scd2_asof

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.round("c_acctbal", 2).alias("acctbal"),
        "c_mktsegment",
    )
    keys, tracked = ["c_custkey"], ["c_name", "acctbal", "c_mktsegment"]
    batch2 = cust.withColumn(
        "acctbal",
        F.when(F.col("c_custkey") % 7 == 0, F.col("acctbal") + 100.0).otherwise(
            F.col("acctbal")
        ),
    ).unionByName(
        cust.filter(F.col("c_custkey") % 13 == 0).withColumn(
            "c_custkey", F.col("c_custkey") + 1000000
        )
    )
    h1 = scd2_apply(None, cust, keys, tracked, "2024-01-01")
    h2 = scd2_apply(h1, batch2, keys, tracked, "2024-02-01")
    return scd2_asof(h2, "2024-01-15")


# -- data-quality auditing (deequ-style, declarative) ----------------------

from gcp_datalake_pipeline_spark.operators import quality  # noqa: E402

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]


@register(
    "dq_profile_orders",
    quality.profile_oracle_sql("orders", _PROFILE_COLS),
    doc="""Single-pass table profile (nulls / exact distincts / min/max
    as strings) for four orders columns: every statistic rides ONE
    aggregation's map-side partials; the report itself is bounded (one
    row per column).""",
)
def dq_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.profile_table(
        load_table(spark, sf_dir, "orders"), _PROFILE_COLS
    )


@register(
    "dq_orders_constraints",
    """
    SELECT 'o_custkey_not_null' AS "check",
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'o_orderkey_unique',
           CAST(COALESCE((SELECT SUM(c) FROM (
               SELECT COUNT(*) AS c FROM orders
               GROUP BY o_orderkey HAVING COUNT(*) > 1)), 0) AS BIGINT)
    UNION ALL
    SELECT 'o_totalprice_nonneg',
           CAST(SUM(CASE WHEN o_totalprice IS NOT NULL AND o_totalprice < 0
               THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_custkey_fk',
           (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
                SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    """,
    doc="""Declarative constraint audit over orders: not-null, key
    uniqueness, value range, FK into customer. The whole suite runs as
    ONE Spark action (union of one-row count branches); row-local checks
    fuse into one aggregation pass; unique adds one keyed groupBy; the
    FK anti-join's broadcast is AQE-sized (customer is small here).""",
)
def dq_orders_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return quality.validate_constraints(
        orders,
        [
            quality.Check("o_custkey_not_null", "not_null", col="o_custkey"),
            quality.Check("o_orderkey_unique", "unique", cols=("o_orderkey",)),
            quality.Check(
                "o_totalprice_nonneg", "in_range", col="o_totalprice", lo=0.0
            ),
            quality.Check(
                "o_custkey_fk",
                "fk",
                col="o_custkey",
                ref=customer,
                ref_col="c_custkey",
            ),
        ],
    )


@register(
    "etl_pruned_scan",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="""File-skipping read through the REAL storage engine: orders
    lands in a TransactionalCatalog one staged dir per order-year (each
    write collects its _file_stats.json footer min/max sidecar), then a
    1996-only aggregate reads via catalog.read(predicates=[...]) — the
    stats prune the scan to the 1996 dir's files BEFORE Spark sees them
    (Delta/Iceberg data skipping; at 100 TB a year-selective query opens
    1/7 of the lake instead of every footer). The query RAISES if the
    skip did not actually happen (pruned_files must drop files), so the
    driver's value gate also pins the IO contract; the oracle is the
    plain filtered aggregate — pruning must be value-invisible.""",
)
def etl_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime
    import os

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    root = _scratch_root(f"etl_pruned_scan_{os.path.basename(sf_dir)}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("orders_lake"):  # warm rerun reuses the staged lake
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice"
        )
        years = sorted(
            r["y"]
            for r in orders.select(
                F.year("o_orderdate").alias("y")
            ).distinct().collect()
        )
        for y in years:
            with cat.transaction(f"orders-{y}"):
                cat.append(
                    orders.where(F.year("o_orderdate") == y).coalesce(1),
                    "orders_lake",
                )
    preds = [
        ("o_orderdate", ">=", datetime.datetime(1996, 1, 1)),
        ("o_orderdate", "<", datetime.datetime(1997, 1, 1)),
    ]
    kept, total = cat.pruned_files("orders_lake", preds)
    if not kept or len(kept) >= total:
        raise RuntimeError(
            f"file skipping did not engage: kept {len(kept)}/{total} files"
        )
    return (
        cat.read("orders_lake", predicates=preds)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            money_2dp(cents("o_totalprice"), 100).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "etl_zorder_scan",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
    FROM orders
    WHERE o_orderkey < 6000
      AND o_totalprice < 30000
      AND o_orderdate >= TIMESTAMP '1999-01-01'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="""MULTI-dimensional file skipping through the real storage
    engine: a bounded orders subset (o_orderkey < 6000 — sf-invariant
    size) lands in a TransactionalCatalog in orderkey-striped appends
    (min/max wide on every other column), then compact(zorder_by=
    [o_totalprice, o_orderdate]) rewrites it Morton-clustered — every
    file a tight rectangle in BOTH dimensions. The query RAISES unless
    a price-only predicate AND a date-only predicate EACH skip files
    (the property single-column clustering cannot deliver), then
    aggregates through the combined-predicate pruned read. Oracle =
    the plain filtered aggregate; clustering must be value-invisible.
    At 100 TB this is Delta's OPTIMIZE ZORDER: selective multi-column
    lookups open a handful of files via footer-stats sidecars.""",
)
def etl_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime
    import os

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    root = _scratch_root(f"etl_zorder_scan_{os.path.basename(sf_dir)}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("orders_zlake"):  # warm rerun reuses the lake
        orders = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 6000)
            .select(
                "o_orderkey", "o_orderdate", "o_orderpriority",
                "o_totalprice",
            )
        )
        for i in range(4):
            with cat.transaction(f"orders-stripe-{i}"):
                cat.append(
                    orders.where(F.col("o_orderkey") % 4 == i).coalesce(1),
                    "orders_zlake",
                )
        cat.compact(
            "orders_zlake",
            target_file_bytes=6 * 1024,
            zorder_by=["o_totalprice", "o_orderdate"],
        )
    p_price = ("o_totalprice", "<", 30000.0)
    p_date = ("o_orderdate", ">=", datetime.datetime(1999, 1, 1))
    for pred in (p_price, p_date):
        kept, total = cat.pruned_files("orders_zlake", [pred])
        if not kept or len(kept) >= total:
            raise RuntimeError(
                f"z-order skipping did not engage on {pred[0]}:"
                f" kept {len(kept)}/{total} files"
            )
    return (
        cat.read("orders_zlake", predicates=[p_price, p_date])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            money_2dp(cents("o_totalprice"), 100).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "etl_check_constraints",
    """
    SELECT o_orderstatus,
           count(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
    FROM orders
    WHERE o_orderkey < 6000
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="""Write-time CHECK constraints through the real storage engine:
    a price-nonnegativity check is PRE-REGISTERED on an empty table
    (the pipeline-definition shape), a clean orders batch lands, and a
    corrupted batch (negated prices) is appended — the engine must
    reject it with CheckViolation and roll the staged files back. The
    query RAISES if the bad batch is accepted, and the oracle (the
    clean batch's plain aggregate) catches the quieter failure mode
    too: any leaked bad row doubles a group's count and flips the
    value hash. At 100 TB this is the Delta CHECK-constraint gate —
    bad loads die before the pointer swap, never after.""",
)
def etl_check_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark.transactions import (
        CheckViolation,
        TransactionalCatalog,
    )

    root = _scratch_root(f"etl_check_constraints_{os.path.basename(sf_dir)}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("orders_chk"):  # warm rerun reuses the lake
        orders = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 6000)
            .select("o_orderkey", "o_orderstatus", "o_totalprice")
        )
        cat.add_check("orders_chk", "price_nonneg", "o_totalprice >= 0")
        cat.append(orders, "orders_chk")
        bad = orders.withColumn("o_totalprice", -F.col("o_totalprice"))
        try:
            cat.append(bad, "orders_chk")
        except CheckViolation:
            pass
        else:
            raise RuntimeError("CHECK constraint accepted a violating batch")
    return (
        cat.read("orders_chk")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            money_2dp(cents("o_totalprice"), 100).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "etl_delete_where",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
    FROM orders
    WHERE o_orderkey < 6000
      AND NOT (o_orderdate >= TIMESTAMP '1996-01-01'
               AND o_orderdate < TIMESTAMP '1997-01-01')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="""Row-level DELETE through the real storage engine: a bounded
    orders subset lands one staged dir per order-year, then
    delete_where removes 1996 — file stats pick the 1996 files as the
    only candidates, ONLY those rewrite, and every other year's files
    carry into the new snapshot BY HARDLINK. The query RAISES unless
    at least one surviving file is a hardlink of its pre-delete inode
    (the zero-copy contract), then aggregates the surviving rows; the
    oracle is the plain anti-filter — at 100 TB this is the GDPR
    delete: rewrite three files, never the lake.""",
)
def etl_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime
    import os

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    root = _scratch_root(f"etl_delete_where_{os.path.basename(sf_dir)}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("orders_dlake"):  # warm rerun reuses the lake
        orders = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 6000)
            .select(
                "o_orderkey", "o_orderdate", "o_orderpriority",
                "o_totalprice",
            )
        )
        years = sorted(
            r["y"]
            for r in orders.select(
                F.year("o_orderdate").alias("y")
            ).distinct().collect()
        )
        for y in years:
            with cat.transaction(f"orders-{y}"):
                cat.append(
                    orders.where(F.year("o_orderdate") == y).coalesce(1),
                    "orders_dlake",
                )
        pre_inodes = {
            os.stat(os.path.join(d, f)).st_ino
            for d in cat._data_dirs("orders_dlake")
            for f in cat._dir_parquet_files(d)
        }
        deleted = cat.delete_where(
            "orders_dlake",
            [
                ("o_orderdate", ">=", datetime.datetime(1996, 1, 1)),
                ("o_orderdate", "<", datetime.datetime(1997, 1, 1)),
            ],
        )
        if deleted <= 0:
            raise RuntimeError("delete_where removed no rows")
        carried = sum(
            1
            for d in cat._data_dirs("orders_dlake")
            for f in cat._dir_parquet_files(d)
            if os.stat(os.path.join(d, f)).st_ino in pre_inodes
        )
        if carried == 0:
            raise RuntimeError(
                "delete rewrote every file — hardlink carry did not engage"
            )
    return (
        cat.read("orders_dlake")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            money_2dp(cents("o_totalprice"), 100).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "etl_metadata_aggregates",
    """
    SELECT count(*) AS n_rows,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           count(*) FILTER (WHERE o_totalprice < 30000) AS n_cheap,
           min(o_orderdate) AS min_date,
           max(o_orderdate) AS max_date,
           count(*) FILTER (WHERE o_orderdate >= TIMESTAMP '1997-01-01')
             AS n_recent
    FROM orders
    WHERE o_orderkey < 6000
    """,
    doc="""Metadata-optimized aggregates through the real storage
    engine: a bounded orders subset lands in striped appends, then the
    COUNT, the predicate COUNTs, and MIN/MAX are answered by
    count_rows/min_max — folding the stats sidecars, scanning only
    undecidable files (the Delta SELECT COUNT(*)/MIN/MAX shape,
    generalized to predicates). The order date lands as a true
    TIMESTAMP (with-local-zone) column, so the session's
    TIMESTAMP_MICROS parquet output (session.py) must surface footer
    stats the sidecar can fold — min/max dates and a temporal-predicate
    count ride the same metadata path as the numerics (the INT96
    legacy format would silently degrade all three to scans; pytest
    pins the zero-I/O property, this gate pins the values). The oracle
    is the plain SQL aggregate: if the metadata fold ever drifted from
    the data by one row or one value, the hash flips. At 100 TB these
    are the dashboard queries that must not cost a table scan.""",
)
def etl_metadata_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime
    import os

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    root = _scratch_root(f"etl_metadata_aggs_{os.path.basename(sf_dir)}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("orders_mlake"):  # warm rerun reuses the lake
        orders = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 6000)
            .select(
                "o_orderkey",
                "o_orderpriority",
                "o_totalprice",
                # force TimestampType (with-local-zone): the testdata
                # column reads as NTZ, which always wrote stats; the
                # TIMESTAMP_MICROS session conf is what makes THIS
                # variant metadata-visible
                F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            )
        )
        for i in range(4):
            with cat.transaction(f"orders-stripe-{i}"):
                cat.append(
                    orders.where(F.col("o_orderkey") % 4 == i).coalesce(1),
                    "orders_mlake",
                )
    n = cat.count_rows("orders_mlake")
    mn, mx = cat.min_max("orders_mlake", "o_totalprice")
    n_cheap = cat.count_rows(
        "orders_mlake", [("o_totalprice", "<", 30000.0)]
    )
    dmn, dmx = cat.min_max("orders_mlake", "o_orderdate")
    n_recent = cat.count_rows(
        "orders_mlake",
        [("o_orderdate", ">=", datetime.datetime(1997, 1, 1))],
    )
    return spark.createDataFrame(
        [(n, float(mn), float(mx), n_cheap, dmn, dmx, n_recent)],
        "n_rows long, min_price double, max_price double, n_cheap long,"
        " min_date timestamp, max_date timestamp, n_recent long",
    )


@register(
    "etl_dml_roundtrip",
    """
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_orderpriority,
             ROUND(o_totalprice, 2) AS o_totalprice
      FROM orders WHERE o_orderkey < 3000
    ),
    merged AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 2 = 0 THEN lower(o_orderstatus)
                  ELSE o_orderstatus END AS o_orderstatus,
             o_orderpriority,
             CASE WHEN o_orderkey % 2 = 0 THEN ROUND(o_totalprice + 10, 2)
                  ELSE o_totalprice END AS o_totalprice
      FROM base
    ),
    kept AS (
      SELECT * FROM merged
      WHERE NOT (o_orderpriority = '1-URGENT' OR o_totalprice < 1000)
    )
    SELECT o_orderstatus,
           count(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
    FROM kept GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="""The SQL front door end to end, from an EMPTY catalog: every
    statement goes through the strict-grammar façade — CREATE TABLE
    (typed empty relation, a pure manifest commit), two INSERT INTO ...
    SELECTs (route to Catalog.append: one new staged dir each, never a
    rewrite), MERGE INTO ... USING ... ON k = k (routes to
    merge_upsert, source wins on matched rows, no audit-column
    injection), and a DELETE with a top-level OR (routes to the
    stats-pruned hardlink-carrying rewrite, candidates = union of the
    branches). The query RAISES unless each statement reports the
    expected row count; the oracle reconstructs the same create->
    insert->merge->delete pipeline declaratively, so one leaked/
    dropped/double-applied row anywhere in the chain flips the value
    hash. This is the reference's upsert-centric write path
    (services/empresa.ts:92-106) re-expressed as warehouse SQL over
    the transactional lake.""",
)
def etl_dml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    tag = os.path.basename(sf_dir).replace(".", "_")  # view-name safe
    root = _scratch_root(f"etl_dml_roundtrip_{tag}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("orders_sql"):  # warm rerun reuses the lake
        base = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 3000)
            .select(
                "o_orderkey",
                "o_orderstatus",
                "o_orderpriority",
                F.round("o_totalprice", 2).alias("o_totalprice"),
            )
        )
        base.createOrReplaceTempView(f"dml_base_{tag}")
        crt = execute_dml(
            cat,
            "CREATE TABLE orders_sql (o_orderkey BIGINT, "
            "o_orderstatus STRING, o_orderpriority STRING, "
            "o_totalprice DOUBLE)",
        )
        if crt != {"table": "orders_sql", "created": True}:
            raise RuntimeError(f"CREATE TABLE did not engage: {crt}")
        seed = execute_dml(
            cat,
            f"INSERT INTO orders_sql SELECT * FROM dml_base_{tag} "
            "WHERE o_orderkey % 3 != 0",
        )
        n_seed = seed["inserted"]
        ins = execute_dml(
            cat,
            f"INSERT INTO orders_sql SELECT * FROM dml_base_{tag} "
            "WHERE o_orderkey % 3 = 0",
        )
        mrg = execute_dml(
            cat,
            "MERGE INTO orders_sql USING "
            f"(SELECT o_orderkey, lower(o_orderstatus) AS o_orderstatus, "
            f"o_orderpriority, round(o_totalprice + 10, 2) AS o_totalprice "
            f"FROM dml_base_{tag} WHERE o_orderkey % 2 = 0) m "
            "ON orders_sql.o_orderkey = m.o_orderkey "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
        )
        dele = execute_dml(
            cat,
            "DELETE FROM orders_sql WHERE (o_orderpriority = '1-URGENT') "
            "OR (o_totalprice < 1000)",
        )
        n_base = n_seed + ins["inserted"]
        if ins["inserted"] <= 0 or mrg["merged"] <= 0 or dele["deleted"] <= 0:
            raise RuntimeError(
                f"DML chain did not engage: {ins} {mrg} {dele}"
            )
        if cat.count_rows("orders_sql") != n_base - dele["deleted"]:
            raise RuntimeError("DML chain row accounting is inconsistent")
    return (
        cat.read("orders_sql")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            money_2dp(cents("o_totalprice"), 100).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "etl_update_where",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                           AND o_orderdate < TIMESTAMP '1997-01-01'
                          THEN o_totalprice + 1000
                          ELSE o_totalprice END), 2) AS total_price
    FROM orders
    WHERE o_orderkey < 6000
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="""Row-level UPDATE through the real storage engine: the same
    year-striped lake as etl_delete_where, but update_where adds 1000
    to every 1996 order's price — only the 1996 files rewrite (the
    query RAISES unless other years' files survive as hardlinks of
    their pre-update inodes), every row survives, and the oracle is
    the plain CASE WHEN aggregate. A leaked unmodified 1996 row or a
    modified non-1996 row flips the value hash.""",
)
def etl_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime
    import os

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    root = _scratch_root(f"etl_update_where_{os.path.basename(sf_dir)}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("orders_ulake"):  # warm rerun reuses the lake
        orders = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 6000)
            .select(
                "o_orderkey", "o_orderdate", "o_orderpriority",
                "o_totalprice",
            )
        )
        years = sorted(
            r["y"]
            for r in orders.select(
                F.year("o_orderdate").alias("y")
            ).distinct().collect()
        )
        for y in years:
            with cat.transaction(f"orders-{y}"):
                cat.append(
                    orders.where(F.year("o_orderdate") == y).coalesce(1),
                    "orders_ulake",
                )
        pre_inodes = {
            os.stat(os.path.join(d, f)).st_ino
            for d in cat._data_dirs("orders_ulake")
            for f in cat._dir_parquet_files(d)
        }
        updated = cat.update_where(
            "orders_ulake",
            [
                ("o_orderdate", ">=", datetime.datetime(1996, 1, 1)),
                ("o_orderdate", "<", datetime.datetime(1997, 1, 1)),
            ],
            {"o_totalprice": "o_totalprice + 1000"},
        )
        if updated <= 0:
            raise RuntimeError("update_where touched no rows")
        carried = sum(
            1
            for d in cat._data_dirs("orders_ulake")
            for f in cat._dir_parquet_files(d)
            if os.stat(os.path.join(d, f)).st_ino in pre_inodes
        )
        if carried == 0:
            raise RuntimeError(
                "update rewrote every file — hardlink carry did not engage"
            )
    return (
        cat.read("orders_ulake")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            money_2dp(cents("o_totalprice"), 100).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "etl_bloom_scan",
    """
    SELECT doc_id, n_chars
    FROM documents
    WHERE doc_id IN (3, 17, 41)
    ORDER BY doc_id
    """,
    doc="""Bloom-filter point-lookup through the real storage engine:
    documents lands in a TransactionalCatalog hash-scattered across 8
    files (every file's doc_id [min, max] spans the whole key space, so
    min/max stats prune NOTHING on a point predicate — the shape of a
    GDPR id-lookup on a 100 TB corpus), then CREATE BLOOMFILTER INDEX
    ON (doc_id) builds per-file bitmap sidecars in one distributed
    JVM-hashed pass (blooms.py). The query RAISES unless (a) min/max
    alone provably keeps every file and (b) the bloom probe skips
    files anyway — the I/O contract — then answers the IN-lookup
    through the pruned read. Oracle = the plain filtered projection;
    a bloom is a superset guarantee, so indexing must be
    value-invisible.""",
)
def etl_bloom_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark import blooms, filestats
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    root = _scratch_root(f"etl_bloom_scan_{os.path.basename(sf_dir)}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("docs_lake"):  # warm rerun reuses the staged lake
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "n_chars"
        )
        cat.overwrite(docs.repartition(8), "docs_lake")
        cat.set_bloom_index("docs_lake", ["doc_id"])
    preds = [("doc_id", "in", [3, 17, 41])]
    dnf = [preds]
    # (a) min/max stats alone keep EVERY file (scattered ids)...
    minmax_kept = total = 0
    for d in cat._data_dirs("docs_lake"):
        files = cat._dir_parquet_files(d)
        total += len(files)
        minmax_kept += len(
            filestats.prune_files_dnf(
                filestats.read_dir_stats(d), files, dnf
            )
        )
    if minmax_kept != total:
        raise RuntimeError(
            f"premise broken: min/max already pruned "
            f"({minmax_kept}/{total} kept) — the bloom is not being tested"
        )
    # ...(b) the bloom prunes anyway
    kept, _ = cat.pruned_files("docs_lake", preds)
    if len(kept) >= total:
        raise RuntimeError(
            f"bloom skipping did not engage: kept {len(kept)}/{total} files"
        )
    return (
        cat.read("docs_lake", predicates=preds)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "etl_table_changes",
    """
    SELECT CAST(2 AS INTEGER) AS commit_version, 'insert' AS change_type,
           count(*) AS n_rows, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
    FROM orders WHERE o_orderkey < 6000 AND year(o_orderdate) >= 1997
    UNION ALL
    SELECT CAST(3 AS INTEGER), 'delete',
           count(*), SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0
    FROM orders WHERE o_orderkey < 6000 AND o_orderpriority = '1-URGENT'
    ORDER BY commit_version
    """,
    doc="""Change Data Feed through the real storage engine: a bounded
    orders subset lands as v1, an orderdate-split append lands as v2,
    and a priority-targeted DELETE lands as v3 — then
    table_changes(v1..current) recovers the row-level feed from the
    versioned manifests (inode-identity file diff + multiset except
    over ONLY the changed files; Delta CDF semantics without runtime
    capture). The query RAISES unless the append commit's feed read
    exactly the appended files (the bounded-I/O contract), then
    returns per-commit insert/delete row counts and totals. Oracle =
    the same aggregates computed directly from the source rows the
    commits inserted/deleted — the feed must reconstruct history
    exactly.""",
)
def etl_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    root = _scratch_root(f"etl_table_changes_{os.path.basename(sf_dir)}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("orders_cdc"):  # warm rerun reuses the staged lake
        orders = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 6000)
            .select(
                "o_orderkey", "o_orderdate", "o_orderpriority",
                "o_totalprice",
            )
        )
        base = orders.where(F.year("o_orderdate") < 1997)
        tail = orders.where(F.year("o_orderdate") >= 1997)
        cat.overwrite(base.coalesce(2), "orders_cdc")        # v1
        cat.append(tail.coalesce(2), "orders_cdc")           # v2
        cat.delete_where(                                    # v3
            "orders_cdc", [("o_orderpriority", "=", "1-URGENT")]
        )
    # bounded-I/O contract: the append commit's feed reads EXACTLY the
    # files the append published (hardlink-identical files never load)
    appended = [
        os.path.realpath(os.path.join(d, f))
        for _ino, d, f in cat._version_file_inodes("orders_cdc", 2)
        if _ino
        not in {i for i, _d, _f in cat._version_file_inodes("orders_cdc", 1)}
    ]
    feed_v2 = cat.table_changes("orders_cdc", 1, 2)
    read_files = {
        os.path.realpath(p.replace("file:", ""))
        for p in feed_v2.inputFiles()
    }
    if read_files != set(appended):
        raise RuntimeError(
            f"append feed read {len(read_files)} files, expected the "
            f"{len(appended)} appended files only"
        )
    return (
        cat.table_changes("orders_cdc", 1)
        .groupBy(
            F.col("_commit_version").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
        )
        .agg(
            F.count("*").alias("n_rows"),
            money_2dp(cents("o_totalprice"), 100).alias("total_price"),
        )
        .orderBy("commit_version")
    )


@register(
    "etl_table_changes_updates",
    """
    SELECT 'delete' AS change_type, count(*) AS n_rows,
           round(sum(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice * 2
                          ELSE o_totalprice END), 2) AS total_price
    FROM orders WHERE o_orderkey < 6000 AND o_orderstatus = 'F'
    UNION ALL
    SELECT 'update_postimage', count(*), round(sum(o_totalprice * 2), 2)
    FROM orders WHERE o_orderkey < 6000 AND o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT 'update_preimage', count(*), SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0
    FROM orders WHERE o_orderkey < 6000 AND o_orderpriority = '1-URGENT'
    ORDER BY change_type
    """,
    doc="""Column-level change feed (Delta CDF's update_preimage /
    update_postimage distinction): a bounded orders subset lands as
    v1, an UPDATE doubles urgent orders' totals at v2, and a DELETE
    removes finished orders at v3 — then table_changes(key_cols=
    [o_orderkey]) relabels v2's same-key delete+insert pairs as the
    update's pre/post images while v3's lone deletes keep their label.
    A consumer can diff pre vs post per key to see WHICH columns
    changed. Returns per-change-type row counts and totals; oracle =
    the same aggregates computed directly from the rows each commit
    touched (post-update prices feed the delete totals — history must
    reconstruct exactly).""",
)
def etl_table_changes_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    root = _scratch_root(
        f"etl_table_changes_upd_{os.path.basename(sf_dir)}"
    )
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("orders_cdu"):  # warm rerun reuses the staged lake
        orders = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 6000)
            .select(
                "o_orderkey", "o_orderstatus", "o_orderpriority",
                "o_totalprice",
            )
        )
        cat.overwrite(orders.coalesce(2), "orders_cdu")           # v1
        cat.update_where(                                         # v2
            "orders_cdu",
            [("o_orderpriority", "=", "1-URGENT")],
            {"o_totalprice": "o_totalprice * 2"},
        )
        cat.delete_where(                                         # v3
            "orders_cdu", [("o_orderstatus", "=", "F")]
        )
    return (
        cat.table_changes("orders_cdu", 1, key_cols=["o_orderkey"])
        .groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count("*").alias("n_rows"),
            money_2dp(cents("o_totalprice"), 100).alias("total_price"),
        )
        .orderBy("change_type")
    )


@register(
    "etl_matview_refresh",
    """
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderkey = (
                    SELECT min(o_orderkey) FROM orders
                    WHERE o_orderkey < 6000
                      AND NOT (o_orderpriority = '1-URGENT'
                               AND year(o_orderdate) < 1996))
                    THEN 11111.0 ELSE o_totalprice END), 2) AS total_price,
           count(*) AS n_orders
    FROM orders
    WHERE o_orderkey < 6000
      AND NOT (o_orderpriority = '1-URGENT' AND year(o_orderdate) < 1996)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="""Incrementally maintained materialized view through the real
    storage engine: a bounded orders subset lands split across two
    commits, a priority+date DELETE lands as a third, and the view —
    materialized after the FIRST commit only, UNDER THE _kb BUCKET
    LAYOUT — catches up via REFRESHes that apply the change feed as
    signed partials (insert=+, delete=-; operators/matview.py over
    table_changes + refresh_aggregate), each rewriting ONLY the
    buckets holding affected groups. A final one-order UPDATE feeds a
    one-group refresh whose inode pin RAISES unless every other
    bucket's files survived hardlink-identical (refresh cost must be
    O(affected groups), not O(view)). The query also RAISES unless
    each refresh applied a delta and a catch-up refresh is a no-op,
    then returns the view's rows (sums rounded at the READ — the view
    stores exact partials). Oracle = the same aggregate computed
    directly over the logical final state; the invariant is refresh ==
    full recompute after any DML sequence.""",
)
def etl_matview_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime
    import os

    from gcp_datalake_pipeline_spark.operators.matview import (
        create_materialized_view,
        refresh_materialized_view,
    )
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    root = _scratch_root(f"etl_matview_{os.path.basename(sf_dir)}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("orders_mv_src"):  # warm rerun reuses the lake
        orders = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 6000)
            .select(
                "o_orderkey", "o_orderdate", "o_orderpriority",
                "o_totalprice",
            )
        )
        cat.overwrite(
            orders.where(F.year("o_orderdate") < 1997).coalesce(2),
            "orders_mv_src",
        )
        create_materialized_view(
            cat,
            "orders_mv",
            "orders_mv_src",
            ["o_orderpriority"],
            {"total_price": "o_totalprice"},
            "n_orders",
            num_buckets=8,
        )
        cat.append(
            orders.where(F.year("o_orderdate") >= 1997).coalesce(2),
            "orders_mv_src",
        )
        r1 = refresh_materialized_view(cat, "orders_mv")
        cat.delete_where(
            "orders_mv_src",
            [
                ("o_orderpriority", "=", "1-URGENT"),
                ("o_orderdate", "<", datetime.datetime(1996, 1, 1)),
            ],
        )
        r2 = refresh_materialized_view(cat, "orders_mv")
        if r1["applied"] == 0 or r2["applied"] == 0:
            raise RuntimeError(
                f"matview refresh applied no delta ({r1}, {r2})"
            )
        # one-order update -> one-group refresh: the bounded-write
        # inode pin (refresh re-stages only the affected group's
        # bucket; the rest hardlink-carry)
        def bucket_inodes():
            d = cat._data_dirs("orders_mv")[0]
            return {
                b: sorted(
                    os.stat(os.path.join(d, b, f)).st_ino
                    for f in os.listdir(os.path.join(d, b))
                    if f.endswith(".parquet")
                )
                for b in os.listdir(d)
                if b.startswith("_kb=")
            }

        k0 = cat.read("orders_mv_src").agg(
            F.min("o_orderkey")
        ).first()[0]
        before = bucket_inodes()
        cat.update_where(
            "orders_mv_src",
            [("o_orderkey", "=", int(k0))],
            {"o_totalprice": "11111.0"},
        )
        r3 = refresh_materialized_view(cat, "orders_mv")
        if r3["applied"] != 1:
            raise RuntimeError(
                f"one-group refresh applied {r3['applied']} deltas"
            )
        after = bucket_inodes()
        restaged = [b for b in before if after.get(b) != before[b]]
        if len(restaged) > 1:
            raise RuntimeError(
                f"one-group refresh re-staged {len(restaged)} buckets "
                f"({restaged}); the refresh is not bucket-bounded"
            )
    caught_up = refresh_materialized_view(cat, "orders_mv")
    if caught_up["applied"] != 0:
        raise RuntimeError(
            f"matview was not caught up after its refreshes: {caught_up}"
        )
    return (
        cat.read("orders_mv")
        .select(
            "o_orderpriority",
            F.round("total_price", 2).alias("total_price"),
            "n_orders",
        )
        .orderBy("o_orderpriority")
    )


@register(
    "etl_scd2_changes",
    """
    SELECT o_orderkey, round(total_price, 2) AS total_price,
           valid_from, valid_to, is_current
    FROM (
      SELECT o_orderkey, o_totalprice AS total_price,
             TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
             TIMESTAMP '2024-01-02 00:00:00' AS valid_to,
             FALSE AS is_current
      FROM orders WHERE o_orderkey < 3000 AND o_orderstatus = 'O'
      UNION ALL
      SELECT o_orderkey, o_totalprice,
             TIMESTAMP '2024-01-01 00:00:00',
             TIMESTAMP '2024-01-03 00:00:00', FALSE
      FROM orders WHERE o_orderkey < 3000 AND o_orderstatus = 'F'
      UNION ALL
      SELECT o_orderkey, o_totalprice * 2,
             TIMESTAMP '2024-01-02 00:00:00', NULL, TRUE
      FROM orders WHERE o_orderkey < 3000 AND o_orderstatus = 'O'
      UNION ALL
      SELECT o_orderkey, o_totalprice,
             TIMESTAMP '2024-01-01 00:00:00', NULL, TRUE
      FROM orders
      WHERE o_orderkey < 3000 AND o_orderstatus NOT IN ('O', 'F')
    )
    ORDER BY o_orderkey, valid_from
    """,
    doc="""SCD Type-2 change-feed consumer (streaming/cdf.py
    apply_changes_scd2 — Delta Live Tables' APPLY CHANGES ... STORED AS
    SCD TYPE 2): a bounded orders subset seeds a bucketed history
    replica opened at t0; a pump folds an UPDATE window (open-status
    orders' totals double) closing each old image at t1 and opening
    the new one; a second pump folds a DELETE window
    (finished orders) closing those rows at t2 with no successor.
    Untouched keys keep their single open row. The query RAISES unless
    both pumps applied rows and a catch-up pump is a no-op, then
    returns the full history. Oracle = the history reconstructed
    directly from the source rows and the pumps' literal effective
    timestamps — per key, the engine's fold must produce exactly the
    close/open transitions the DML sequence implies.""",
)
def etl_scd2_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime
    import os

    from gcp_datalake_pipeline_spark.streaming.cdf import (
        apply_changes_scd2,
        bootstrap_scd2_target,
        pump_table_changes,
    )
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    root = _scratch_root(f"etl_scd2_changes_{os.path.basename(sf_dir)}")
    cat = TransactionalCatalog(spark=spark, root=root)
    t0 = datetime.datetime(2024, 1, 1)
    t1 = datetime.datetime(2024, 1, 2)
    t2 = datetime.datetime(2024, 1, 3)

    def pump(eff):
        return pump_table_changes(
            cat,
            "orders_scd_src",
            "scd",
            lambda feed: apply_changes_scd2(
                cat, feed, "orders_hist", ["o_orderkey"], effective_ts=eff
            ),
        )

    if not cat.exists("orders_scd_src"):  # warm rerun reuses the lake
        orders = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 3000)
            .select(
                "o_orderkey", "o_orderstatus",
                F.col("o_totalprice").alias("total_price"),
            )
        )
        cat.overwrite(orders.coalesce(2), "orders_scd_src")
        pump_table_changes(cat, "orders_scd_src", "scd")  # register
        bootstrap_scd2_target(
            cat, "orders_scd_src", "orders_hist", ["o_orderkey"],
            effective_ts=t0, num_buckets=8,
        )
        cat.update_where(
            "orders_scd_src",
            [("o_orderstatus", "=", "O")],
            {"total_price": "total_price * 2"},
        )
        r1 = pump(t1)
        cat.delete_where(
            "orders_scd_src", [("o_orderstatus", "=", "F")]
        )
        r2 = pump(t2)
        if r1["applied"] == 0 or r2["applied"] == 0:
            raise RuntimeError(f"scd2 pump applied no rows ({r1}, {r2})")
    caught_up = pump(t2)
    if caught_up["applied"] != 0 or caught_up["from"] != caught_up["to"]:
        raise RuntimeError(f"scd2 consumer not caught up: {caught_up}")
    return (
        cat.read("orders_hist")
        .select(
            "o_orderkey",
            F.round("total_price", 2).alias("total_price"),
            "valid_from",
            "valid_to",
            "is_current",
        )
        .orderBy("o_orderkey", "valid_from")
    )


@register(
    "etl_matview_minmax",
    """
    WITH doomed AS (
      SELECT o_orderkey FROM orders WHERE o_orderkey < 6000
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
    )
    SELECT o_orderpriority,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price,
           count(*) AS n_orders,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders
    WHERE o_orderkey < 6000
      AND o_orderkey <> (SELECT o_orderkey FROM doomed)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="""MIN/MAX materialized view surviving a retraction
    (operators/matview.py): the view materializes over the first half
    of a bounded orders subset, one REFRESH folds the second half's
    append (pure-insert feed — MIN/MAX partials combine exactly), then
    a DELETE retracts the row holding the CURRENT GLOBAL MAX price and
    the next refresh must converge by recomputing extremes for ONLY
    the retracted group (bucket-scoped when the source is co-bucketed;
    every other group keeps its partials). Oracle = the post-delete
    aggregate with real MIN/MAX computed directly — one group's
    max_price provably changed.""",
)
def etl_matview_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark.operators.matview import (
        create_materialized_view,
        refresh_materialized_view,
    )
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    root = _scratch_root(f"etl_matview_mm_{os.path.basename(sf_dir)}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("orders_mm_src"):  # warm rerun reuses the lake
        orders = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 6000)
            .select(
                "o_orderkey", "o_orderdate", "o_orderpriority",
                "o_totalprice",
            )
        )
        cat.overwrite(
            orders.where(F.year("o_orderdate") < 1997).coalesce(2),
            "orders_mm_src",
        )
        create_materialized_view(
            cat,
            "orders_mm",
            "orders_mm_src",
            ["o_orderpriority"],
            {"total_price": "o_totalprice"},
            "n_orders",
            num_buckets=8,
            mins={"min_price": "o_totalprice"},
            maxs={"max_price": "o_totalprice"},
        )
        cat.append(
            orders.where(F.year("o_orderdate") >= 1997).coalesce(2),
            "orders_mm_src",
        )
        r1 = refresh_materialized_view(cat, "orders_mm")
        if r1["applied"] == 0:
            raise RuntimeError(f"insert-only refresh applied nothing: {r1}")
        if r1["src_buckets_read"] is not None:
            raise RuntimeError(
                f"pure-insert refresh took the recompute leg: {r1}"
            )
        # retract the row holding the current global-max price — one
        # group's max_price MUST move, exercising the recompute leg
        doomed = (
            cat.read("orders_mm_src")
            .orderBy(F.desc("o_totalprice"), "o_orderkey")
            .select("o_orderkey")
            .first()[0]
        )
        cat.delete_where("orders_mm_src", [("o_orderkey", "=", int(doomed))])
        r2 = refresh_materialized_view(cat, "orders_mm")
        if r2["applied"] == 0:
            raise RuntimeError(f"delete-leg refresh applied nothing: {r2}")
    # EVERY run: an idle catch-up refresh is a no-op and the view
    # reflects the post-delete extremes (the oracle checks values)
    if refresh_materialized_view(cat, "orders_mm")["applied"] != 0:
        raise RuntimeError("idle refresh applied a phantom delta")
    return (
        cat.read("orders_mm")
        .select(
            "o_orderpriority",
            F.round("total_price", 2).alias("total_price"),
            "n_orders",
            F.round("min_price", 2).alias("min_price"),
            F.round("max_price", 2).alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "etl_stream_changes",
    """
    SELECT o_orderkey, o_orderstatus,
           round(CASE WHEN o_orderstatus = 'O'
                      THEN o_totalprice * 2
                      ELSE o_totalprice END, 2) AS total_price
    FROM orders
    WHERE o_orderkey < 6000
      AND NOT (o_orderstatus = 'F' AND o_totalprice < 50000)
      AND o_orderkey <> (
            SELECT min(o_orderkey) FROM orders
            WHERE o_orderkey < 6000
              AND NOT (o_orderstatus = 'F' AND o_totalprice < 50000))
    ORDER BY o_orderkey
    """,
    doc="""Exactly-once change-feed consumption through the real storage
    engine (streaming/cdf.py): a bounded orders subset seeds a source
    table; a registered consumer bootstraps a keyed replica UNDER THE
    _kb BUCKET LAYOUT (bootstrap_changes_target), then four pumps fold
    an append, a predicate DELETE, an in-place UPDATE, and a one-key
    DELETE through apply_changes_into — each window's keyed CDC apply
    committing atomically with the consumer watermark, rewriting ONLY
    the buckets the window touched. The query RAISES unless every pump
    applied change rows, the one-key pump left every other bucket's
    files hardlink-identical (the bounded-write inode pin — a pump
    must cost O(changes), not O(replica)), and a final catch-up pump
    is a zero-commit no-op; then returns the replica. Oracle = the
    source's logical final state computed directly; the invariant is
    replica == source after any DML sequence, with no window ever
    applied twice (the watermark expect-check).""",
)
def etl_stream_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark.streaming.cdf import (
        apply_changes_into,
        bootstrap_changes_target,
        pump_table_changes,
    )
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    root = _scratch_root(f"etl_stream_changes_{os.path.basename(sf_dir)}")
    cat = TransactionalCatalog(spark=spark, root=root)

    def apply(feed):
        return apply_changes_into(cat, feed, "orders_replica", ["o_orderkey"])

    def bucket_inodes():
        d = cat._data_dirs("orders_replica")[0]
        return {
            b: sorted(
                os.stat(os.path.join(d, b, f)).st_ino
                for f in os.listdir(os.path.join(d, b))
                if f.endswith(".parquet")
            )
            for b in os.listdir(d)
            if b.startswith("_kb=")
        }

    if not cat.exists("orders_cdc_src"):  # warm rerun reuses the lake
        orders = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 6000)
            .select(
                "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
            )
        )
        cat.overwrite(
            orders.where(F.year("o_orderdate") < 1996).coalesce(2),
            "orders_cdc_src",
        )
        pump_table_changes(cat, "orders_cdc_src", "replica")
        # bootstrap contract: the feed starts AFTER the watermark, so
        # the replica copies the registered snapshot first — under the
        # key-hash bucket layout so pumps rewrite only touched buckets
        bootstrap_changes_target(
            cat, "orders_cdc_src", "orders_replica", ["o_orderkey"],
            num_buckets=8,
        )
        cat.append(
            orders.where(F.year("o_orderdate") >= 1996).coalesce(2),
            "orders_cdc_src",
        )
        r1 = pump_table_changes(cat, "orders_cdc_src", "replica", apply)
        cat.delete_where(
            "orders_cdc_src",
            [("o_orderstatus", "=", "F"), ("o_totalprice", "<", 50000.0)],
        )
        r2 = pump_table_changes(cat, "orders_cdc_src", "replica", apply)
        cat.update_where(
            "orders_cdc_src",
            [("o_orderstatus", "=", "O")],
            {"o_totalprice": "o_totalprice * 2"},
        )
        r3 = pump_table_changes(cat, "orders_cdc_src", "replica", apply)
        if r1["applied"] == 0 or r2["applied"] == 0 or r3["applied"] == 0:
            raise RuntimeError(
                f"change-feed pump applied no rows ({r1}, {r2}, {r3})"
            )
        # one-key pump: the 100 TB write contract — every bucket the
        # window did not touch keeps hardlink-identical files
        k0 = cat.read("orders_cdc_src").agg(
            F.min("o_orderkey")
        ).first()[0]
        before = bucket_inodes()
        cat.delete_where("orders_cdc_src", [("o_orderkey", "=", int(k0))])
        r4 = pump_table_changes(cat, "orders_cdc_src", "replica", apply)
        if r4["applied"] != 1:
            raise RuntimeError(f"one-key pump applied {r4['applied']} rows")
        after = bucket_inodes()
        restaged = [b for b in before if after.get(b) != before[b]]
        if len(restaged) > 1:
            raise RuntimeError(
                f"one-key pump re-staged {len(restaged)} buckets "
                f"({restaged}); the apply is not bucket-bounded"
            )
    v = cat._read_manifest(strict=False)["version"]
    caught_up = pump_table_changes(cat, "orders_cdc_src", "replica", apply)
    if (
        caught_up["applied"] != 0
        or caught_up["from"] != caught_up["to"]
        or cat._read_manifest(strict=False)["version"] != v
    ):
        raise RuntimeError(
            f"consumer was not caught up after its pumps: {caught_up}"
        )
    return (
        cat.read("orders_replica")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("total_price"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "etl_orc_roundtrip",
    """
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM documents GROUP BY lang ORDER BY lang
    """,
    doc="""ORC source/sink roundtrip: documents land as ORC (Spark's
    second columnar format — schema, types, and values preserved), are
    read back via the ORC reader, and aggregate identically to the
    parquet original (the oracle reads parquet — any roundtrip loss
    breaks the gate). Scale: ORC write/read are the same distributed
    columnar scans as parquet; the gate pins format interop, not a new
    execution path.""",
)
def etl_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    tag = os.path.basename(sf_dir).replace(".", "_")
    root = _scratch_root(f"etl_orc_roundtrip_{tag}")
    path = f"{root}/documents_orc"
    if not os.path.exists(f"{path}/_SUCCESS"):
        load_table(spark, sf_dir, "documents").write.mode("overwrite").orc(
            path
        )
    back = spark.read.orc(path)
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("lang")
    )


@register(
    "etl_dv_dml",
    """
    WITH base AS (
      SELECT o_orderkey, o_orderdate, o_orderpriority, o_totalprice
      FROM orders WHERE o_orderkey < 6000
    ),
    after_del AS (
      SELECT * FROM base
      WHERE NOT (o_orderdate >= TIMESTAMP '1996-01-01'
                 AND o_orderdate < TIMESTAMP '1997-01-01')
    ),
    after_upd AS (
      SELECT o_orderkey,
             CASE WHEN o_totalprice > 200000 THEN '9-DV'
                  ELSE o_orderpriority END AS o_orderpriority,
             o_totalprice
      FROM after_del
    )
    SELECT o_orderpriority,
           count(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
    FROM after_upd
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="""Merge-on-read DML through deletion vectors (Delta's DV
    shape): a bounded orders subset lands one staged dir per
    order-year, then a DELETE (drop 1996) and an UPDATE (re-prioritize
    expensive orders) both run with mode="dv" — matched row POSITIONS
    land in vector sidecars and the update's images append; the gate
    RAISES unless every pre-DML data file survives BY INODE (zero
    files rewritten — the 100 TB contract: a point delete costs
    O(matched rows), not O(candidate files)), unless the metadata
    count (count_rows, vector-aware) equals the scan count, unless
    the change feed reports the delete window as deletes, and unless
    OPTIMIZE (compact) folds the vectors away (dv_count == 0) while
    preserving every value — the oracle replays the DELETE as an
    anti-filter and the UPDATE as a CASE over the survivors.""",
)
def etl_dv_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime
    import os

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    root = _scratch_root(f"etl_dv_dml_{os.path.basename(sf_dir)}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("orders_dv"):  # warm rerun reuses the lake
        orders = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 6000)
            .select("o_orderkey", "o_orderdate", "o_orderpriority",
                    "o_totalprice")
        )
        years = sorted(
            r["y"]
            for r in orders.select(
                F.year("o_orderdate").alias("y")
            ).distinct().collect()
        )
        for y in years:
            with cat.transaction(f"orders-dv-{y}"):
                cat.append(
                    orders.where(F.year("o_orderdate") == y).coalesce(1),
                    "orders_dv",
                )
        pre = {
            os.stat(os.path.join(d, f)).st_ino
            for d in cat._data_dirs("orders_dv")
            for f in cat._dir_parquet_files(d)
        }
        v0 = cat.versions()[-1]["version"]
        n_del = cat.delete_where(
            "orders_dv",
            [
                ("o_orderdate", ">=", datetime.datetime(1996, 1, 1)),
                ("o_orderdate", "<", datetime.datetime(1997, 1, 1)),
            ],
            mode="dv",
        )
        if n_del <= 0:
            raise RuntimeError("dv delete removed no rows")
        n_upd = cat.update_where(
            "orders_dv",
            [("o_totalprice", ">", 200000.0)],
            {"o_orderpriority": "'9-DV'"},
            mode="dv",
        )
        if n_upd <= 0:
            raise RuntimeError("dv update changed no rows")
        post = {
            os.stat(os.path.join(d, f)).st_ino
            for d in cat._data_dirs("orders_dv")
            for f in cat._dir_parquet_files(d)
        }
        if not pre <= post:
            raise RuntimeError(
                "merge-on-read DML rewrote a data file — vectors must "
                "leave every pre-DML inode in place"
            )
        if cat.dv_count("orders_dv") != n_del + n_upd:
            raise RuntimeError("pending-delete count does not match DML")
        if cat.count_rows("orders_dv") != cat.read("orders_dv").count():
            raise RuntimeError("vector-aware metadata count drifted")
        feed = cat.table_changes("orders_dv", v0, v0 + 1)
        if feed.where(F.col("_change_type") == "delete").count() != n_del:
            raise RuntimeError("change feed missed the vector deletes")
        if not cat.compact("orders_dv", min_dirs=2):
            raise RuntimeError("compact refused to fold pending vectors")
        if cat.dv_count("orders_dv") != 0:
            raise RuntimeError("compact left pending vectors behind")
    return (
        cat.read("orders_dv")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            money_2dp(cents("o_totalprice"), 100).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "etl_rename_column",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_usd
    FROM orders
    WHERE o_orderkey < 6000
      AND NOT (o_orderdate >= TIMESTAMP '1996-01-01'
               AND o_orderdate < TIMESTAMP '1997-01-01')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="""Metadata-only schema evolution (Delta column mapping): a
    bounded orders subset lands one dir per order-year, then RENAME
    COLUMN relabels o_totalprice -> price_usd and o_orderdate ->
    order_ts and DROP COLUMN retires o_orderstatus — all pure manifest
    commits. The gate RAISES unless every data file survives BY INODE
    (zero bytes moved — the 100 TB contract: renaming a column of a
    petabyte table is one JSON swap), unless file skipping still
    engages for a predicate spelled with the NEW name (the stats
    sidecars stay keyed by the files' physical names and the read
    path translates), unless the metadata count equals the scan
    count, and unless the dropped column is gone from the logical
    schema. A DELETE phrased against the renamed timestamp column
    then prunes and rewrites exactly as before the rename; the oracle
    replays it against the ORIGINAL names — identical values under
    either naming proves the mapping is pure relabeling.""",
)
def etl_rename_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime
    import os

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    root = _scratch_root(f"etl_rename_column_{os.path.basename(sf_dir)}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("orders_rc"):  # warm rerun reuses the lake
        orders = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 6000)
            .select("o_orderkey", "o_orderdate", "o_orderpriority",
                    "o_totalprice", "o_orderstatus")
        )
        years = sorted(
            r["y"]
            for r in orders.select(
                F.year("o_orderdate").alias("y")
            ).distinct().collect()
        )
        for y in years:
            with cat.transaction(f"orders-rc-{y}"):
                cat.append(
                    orders.where(F.year("o_orderdate") == y).coalesce(1),
                    "orders_rc",
                )
        pre = {
            os.stat(os.path.join(d, f)).st_ino
            for d in cat._data_dirs("orders_rc")
            for f in cat._dir_parquet_files(d)
        }
        cat.rename_column("orders_rc", "o_totalprice", "price_usd")
        cat.rename_column("orders_rc", "o_orderdate", "order_ts")
        cat.drop_column("orders_rc", "o_orderstatus")
        post = {
            os.stat(os.path.join(d, f)).st_ino
            for d in cat._data_dirs("orders_rc")
            for f in cat._dir_parquet_files(d)
        }
        if post != pre:
            raise RuntimeError(
                "RENAME/DROP COLUMN moved data — must be metadata-only"
            )
        if "o_orderstatus" in cat.read("orders_rc").columns:
            raise RuntimeError("dropped column still visible")
        window = [
            ("order_ts", ">=", datetime.datetime(1996, 1, 1)),
            ("order_ts", "<", datetime.datetime(1997, 1, 1)),
        ]
        kept, total = cat.pruned_files("orders_rc", window)
        if not kept or len(kept) >= total:
            raise RuntimeError(
                "file skipping did not engage under the renamed column"
            )
        if cat.delete_where("orders_rc", window) <= 0:
            raise RuntimeError("delete under the renamed column removed 0")
        if cat.count_rows("orders_rc") != cat.read("orders_rc").count():
            raise RuntimeError("metadata count drifted after the rename")
    return (
        cat.read("orders_rc")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("price_usd"), 2).alias("total_usd"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "etl_recluster",
    """
    SELECT o_orderpriority, count(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
    FROM orders
    WHERE o_orderkey < 8000 AND o_orderstatus <> 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="""Online bucket-count evolution (ALTER TABLE ... CLUSTERED BY
    ... INTO m BUCKETS on a live table, transactions.py recluster): a
    bounded orders subset lands bucketed on o_orderkey INTO 8, folds to
    4 (divisor fast path — pure hardlink move, zero rows rewritten,
    inode-preserving so the change feed across the commit is EMPTY,
    asserted in-query), splits to 12 (map-only re-placement, no
    shuffle), then a real DELETE lands through the NEW layout. Oracle =
    the post-delete aggregate straight off parquet — any row lost or
    duplicated by either re-bucketing breaks the gate. At 100 TB this
    is the lifecycle op that fixes a day-one bucket count without an
    outage.""",
)
def etl_recluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    tag = os.path.basename(sf_dir).replace(".", "_")
    root = _scratch_root(f"etl_recluster_{tag}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("orders_rb"):  # warm rerun reuses the lake
        orders = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 8000)
            .select(
                "o_orderkey", "o_orderstatus", "o_orderpriority",
                "o_totalprice",
            )
        )
        cat.overwrite_bucketed(orders, "orders_rb", 8, ["o_orderkey"])
        v0 = cat._read_manifest(strict=False)["version"]
        r1 = cat.recluster("orders_rb", 4)
        if r1["strategy"] != "fold":
            raise RuntimeError(f"8->4 must fold, got {r1}")
        v1 = cat._read_manifest(strict=False)["version"]
        if cat.table_changes("orders_rb", v0, v1).count() != 0:
            raise RuntimeError(
                "fold produced a non-empty change feed (inodes moved)"
            )
        r2 = cat.recluster("orders_rb", 12)
        if r2["strategy"] != "split":
            raise RuntimeError(f"4->12 must split, got {r2}")
        if cat.delete_where(
            "orders_rb", [("o_orderstatus", "=", "F")]
        ) <= 0:
            raise RuntimeError("post-recluster delete removed nothing")
    return (
        cat.read("orders_rb")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            money_2dp(cents("o_totalprice"), 100).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "etl_changes_across_rename",
    """
    SELECT 'delete' AS change_type,
           count(*) AS n_rows,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
    FROM orders WHERE o_orderkey < 700 AND o_orderstatus = 'F'
    UNION ALL
    SELECT 'insert',
           count(*),
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0
    FROM orders WHERE o_orderkey >= 700 AND o_orderkey < 1400
    ORDER BY change_type
    """,
    doc="""Change feed following a table rename (transactions.py
    table_changes(follow_renames=True)): a bounded orders subset lands
    as one table, a DELETE retires its 'F' rows, ALTER TABLE RENAME TO
    moves the identity, and a second half appends under the NEW name.
    One feed spanning the whole window — opted into the renamed[new]=
    old name-lineage chain — must carry exactly the delete and the
    post-rename insert (the rename commit itself contributes nothing;
    the default un-opted call must still refuse, asserted in-query).
    Oracle = the same deletes/inserts recomputed straight off parquet.
    At 100 TB this keeps long-lived consumers alive across the table
    renames an evolving lake performs routinely.""",
)
def etl_changes_across_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    tag = os.path.basename(sf_dir).replace(".", "_")
    root = _scratch_root(f"etl_chg_rename_{tag}")
    cat = TransactionalCatalog(spark=spark, root=root)
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    marker = os.path.join(root, "_window.json")
    if not os.path.exists(marker):
        import json

        orders = load_table(spark, sf_dir, "orders").select(*cols)
        cat.overwrite(
            orders.where(F.col("o_orderkey") < 700).coalesce(2),
            "orders_cr_src",
        )
        v0 = cat._read_manifest(strict=False)["version"]
        if cat.delete_where(
            "orders_cr_src", [("o_orderstatus", "=", "F")]
        ) <= 0:
            raise RuntimeError("pre-rename delete removed nothing")
        cat.rename_table("orders_cr_src", "orders_cr_dst")
        cat.append(
            orders.where(
                (F.col("o_orderkey") >= 700) & (F.col("o_orderkey") < 1400)
            ).coalesce(2),
            "orders_cr_dst",
        )
        v1 = cat._read_manifest(strict=False)["version"]
        with open(marker, "w") as f:
            json.dump({"v0": v0, "v1": v1}, f)
    else:
        import json

        with open(marker) as f:
            w = json.load(f)
        v0, v1 = w["v0"], w["v1"]
    # EVERY run: the un-opted window must still refuse at the rename
    try:
        cat.table_changes("orders_cr_dst", v0, v1).count()
    except ValueError as e:
        if "follow_renames" not in str(e):
            raise
    else:
        raise RuntimeError(
            "feed crossed a rename without follow_renames=True"
        )
    feed = cat.table_changes(
        "orders_cr_dst", v0, v1, follow_renames=True
    )
    return (
        feed.groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count("*").alias("n_rows"),
            money_2dp(cents("o_totalprice"), 100).alias("total_price"),
        )
        .orderBy("change_type")
    )


@register(
    "etl_update_rebucket",
    """
    SELECT o_orderpriority, count(*) AS n_orders,
           CAST(sum(CASE WHEN o_orderstatus = 'F'
                         THEN o_orderkey + 1000000
                         WHEN o_orderstatus = 'O'
                         THEN o_orderkey + 2000000
                         ELSE o_orderkey END) AS BIGINT) AS key_sum,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
    FROM orders WHERE o_orderkey < 6000
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="""UPDATE on a BUCKET-KEY column moves the matched rows to
    their recomputed _kb placement in the same commit (transactions.py
    update_where): a bounded orders subset lands bucketed on
    o_orderkey INTO 6, a copy-on-write UPDATE shifts the 'F' keys by
    +1e6 and a merge-on-read (DV) UPDATE shifts the 'O' keys by +2e6 —
    both re-derive placement, asserted in-query by the invariant
    _kb == pmod(xxhash64(o_orderkey), 6) over every surviving row, so
    bucket-pruned merges/probes keep finding the moved rows. Oracle =
    the same key shifts recomputed straight off parquet. At 100 TB
    this is the difference between an in-place key fix and a
    DELETE+INSERT outage on a bucketed fact table.""",
)
def etl_update_rebucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    tag = os.path.basename(sf_dir).replace(".", "_")
    root = _scratch_root(f"etl_upd_rebucket_{tag}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("orders_ur"):  # warm rerun reuses the lake
        from gcp_datalake_pipeline_spark.dml_sql import execute_dml

        orders = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 6000)
            .select(
                "o_orderkey", "o_orderstatus", "o_orderpriority",
                "o_totalprice",
            )
        )
        cat.overwrite_bucketed(orders, "orders_ur", 6, ["o_orderkey"])
        got = execute_dml(
            cat,
            "UPDATE orders_ur SET o_orderkey = o_orderkey + 1000000 "
            "WHERE o_orderstatus = 'F'",
        )
        if got["updated"] <= 0:
            raise RuntimeError("rewrite-mode key move matched nothing")
        if cat.update_where(
            "orders_ur",
            [("o_orderstatus", "=", "O")],
            {"o_orderkey": "o_orderkey + 2000000"},
            mode="dv",
        ) <= 0:
            raise RuntimeError("dv-mode key move matched nothing")
    # EVERY run: placement invariant over every surviving row (_kb is
    # hive-derived from the path, so this checks the physical layout)
    strays = (
        cat.read("orders_ur")
        .filter(
            F.col("_kb")
            != F.pmod(F.xxhash64("o_orderkey"), F.lit(6)).cast("int")
        )
        .count()
    )
    if strays:
        raise RuntimeError(f"{strays} rows stranded in a stale bucket")
    return (
        cat.read("orders_ur")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            money_2dp(cents("o_totalprice"), 100).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


_QUANTILES = [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]


@register(
    "dq_orders_quantiles",
    quality.exact_quantiles_oracle_sql("orders", "o_totalprice", _QUANTILES),
    doc="""EXACT discrete quantiles of o_totalprice via distributed
    selection (quality.exact_quantiles): one histogram fold (exchange
    carries distinct values, map-side combined), one bounded range
    shuffle of the histogram, O(num_partitions) driver routing, one
    Arrow cumsum pass over only the targeted partitions. Positional
    definition (1-based ceil(q*n)) stated identically on both sides —
    bit-exact, no float summation. The scale story vs the built-ins:
    Spark's exact percentile accumulates a value->count map in executor
    memory; this never holds more than a partition's histogram
    slice.""",
)
def dq_orders_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.exact_quantiles(
        load_table(spark, sf_dir, "orders"), "o_totalprice", _QUANTILES
    )


@register(
    "etl_widen_column",
    """
    WITH base AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 6000
      UNION ALL SELECT 6000000000, 123.45
    )
    SELECT count(*) AS n_orders,
           max(o_orderkey) AS max_key,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
    FROM base
    """,
    doc="""Metadata-only type widening (ALTER TABLE ... ALTER COLUMN c
    TYPE <wider>; transactions.py widen_column — Delta's type-widening
    shape): a bounded orders subset lands with an INT order key, a
    beyond-int32 key append REFUSES under the narrow schema (asserted
    in-query), the widening commits with every data inode untouched
    (asserted), and the same append then lands — the committed-schema
    scan promotes the old files' int32 values natively. Oracle = the
    subset plus the wide row, aggregated straight off parquet.""",
)
def etl_widen_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    tag = os.path.basename(sf_dir).replace(".", "_")
    root = _scratch_root(f"etl_widen_{tag}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("orders_w"):
        cat.overwrite(
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 6000)
            .select(
                F.col("o_orderkey").cast("int").alias("o_orderkey"),
                "o_totalprice",
            )
            .coalesce(2),
            "orders_w",
        )
        wide = spark.createDataFrame(
            [(6000000000, 123.45)], "o_orderkey bigint, o_totalprice double"
        )
        try:
            cat.append(wide, "orders_w")
        except Exception:
            pass
        else:
            raise RuntimeError(
                "a beyond-int32 key landed under the narrow schema"
            )
        pre = {
            os.stat(os.path.join(d, f)).st_ino
            for d in cat._data_dirs("orders_w")
            for f in cat._dir_parquet_files(d)
        }
        cat.widen_column("orders_w", "o_orderkey", "bigint")
        post = {
            os.stat(os.path.join(d, f)).st_ino
            for d in cat._data_dirs("orders_w")
            for f in cat._dir_parquet_files(d)
        }
        if post != pre:
            raise RuntimeError("widening moved data — must be metadata-only")
        cat.append(wide, "orders_w")
    return cat.read("orders_w").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max("o_orderkey").alias("max_key"),
        money_2dp(cents("o_totalprice"), 100).alias("total_price"),
    )


@register(
    "etl_identity_inserts",
    """
    WITH b1 AS (
      SELECT o_orderkey AS okey, o_totalprice AS price,
             ROW_NUMBER() OVER (ORDER BY o_orderkey, o_totalprice) AS id
      FROM orders WHERE o_orderkey < 700
    ),
    n1 AS (SELECT count(*) AS n FROM b1),
    b2 AS (
      SELECT o_orderkey AS okey, o_totalprice AS price,
             (SELECT n FROM n1)
             + ROW_NUMBER() OVER (ORDER BY o_orderkey, o_totalprice) AS id
      FROM orders WHERE o_orderkey >= 700 AND o_orderkey < 1400
    )
    SELECT id, okey, round(price, 2) AS price
    FROM (
      SELECT * FROM b1 WHERE okey >= 200
      UNION ALL SELECT * FROM b2
    )
    ORDER BY id
    """,
    doc="""GENERATED ALWAYS AS IDENTITY through the SQL front door
    (dml_sql._insert_identity): two INSERT...SELECT batches mint dense
    ids from the expect-checked high-water mark (sharded deterministic
    ranking over the inserted values — no single-task window), a DELETE
    between them proves ids are never reused, and supplying the column
    explicitly refuses (asserted in-query). Oracle reconstructs the
    exact ids as per-batch ROW_NUMBER over the same value order plus
    the batch offset.""",
)
def etl_identity_inserts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    tag = os.path.basename(sf_dir).replace(".", "_")
    root = _scratch_root(f"etl_identity_{tag}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("orders_id"):
        load_table(spark, sf_dir, "orders").createOrReplaceTempView(
            "orders_src_iv"
        )
        execute_dml(
            cat,
            "CREATE TABLE orders_id (id BIGINT GENERATED ALWAYS AS "
            "IDENTITY, okey BIGINT, price DOUBLE)",
        )
        execute_dml(
            cat,
            "INSERT INTO orders_id (okey, price) SELECT o_orderkey, "
            "o_totalprice FROM orders_src_iv WHERE o_orderkey < 700",
        )
        execute_dml(cat, "DELETE FROM orders_id WHERE okey < 200")
        execute_dml(
            cat,
            "INSERT INTO orders_id (okey, price) SELECT o_orderkey, "
            "o_totalprice FROM orders_src_iv WHERE o_orderkey >= 700 "
            "AND o_orderkey < 1400",
        )
    # EVERY run: GENERATED ALWAYS refuses an explicit id
    try:
        execute_dml(
            cat, "INSERT INTO orders_id (id, okey, price) VALUES (1, 1, 1.0)"
        )
    except ValueError as e:
        if "GENERATED ALWAYS" not in str(e):
            raise
    else:
        raise RuntimeError("explicit identity insert did not refuse")
    return (
        cat.read("orders_id")
        .select("id", "okey", F.round("price", 2).alias("price"))
        .orderBy("id")
    )


@register(
    "etl_unique_constraint",
    """
    SELECT count(*) AS n_rows,
           count(DISTINCT o_orderkey) AS n_keys,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
    FROM orders WHERE o_orderkey < 1400
    """,
    doc="""Write-enforced UNIQUE / PRIMARY KEY (transactions.py
    add_unique_constraint — the enforcement Delta declines): a bounded
    orders subset lands, UNIQUE(o_orderkey) registers (validating the
    existing rows), a second disjoint batch appends, and then BOTH a
    key-colliding insert and an intra-batch-duplicate insert must
    refuse WITHOUT publishing a version (asserted in-query; the probe
    is one column-pruned semi-join, bucket-pruned when co-bucketed).
    UPDATE on the constrained column is CHECKED, not refused (r13,
    _check_update_keys): a post-SET collision with an unrewritten key
    refuses, a fresh key value lands (round-tripped in-query so the
    state stays oracle-stable). Oracle = the surviving rows straight
    off parquet — n_rows == n_keys is the enforced invariant.""",
)
def etl_unique_constraint(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark.transactions import (
        CheckViolation,
        TransactionalCatalog,
    )

    tag = os.path.basename(sf_dir).replace(".", "_")
    root = _scratch_root(f"etl_unique_{tag}")
    cat = TransactionalCatalog(spark=spark, root=root)
    cols = ["o_orderkey", "o_totalprice"]
    if not cat.exists("orders_u"):
        orders = load_table(spark, sf_dir, "orders").select(*cols)
        cat.overwrite(
            orders.where(F.col("o_orderkey") < 700).coalesce(2), "orders_u"
        )
        cat.add_unique_constraint("orders_u", "pk", ["o_orderkey"])
        cat.append(
            orders.where(
                (F.col("o_orderkey") >= 700) & (F.col("o_orderkey") < 1400)
            ).coalesce(2),
            "orders_u",
        )
    # EVERY run: collisions refuse and publish nothing
    v = cat._read_manifest(strict=False)["version"]
    dup = spark.createDataFrame(
        [(5, 1.0)], "o_orderkey long, o_totalprice double"
    )
    for batch, what in (
        (dup, "existing-key collision"),
        (dup.unionAll(dup.selectExpr("o_orderkey", "o_totalprice + 1")),
         "intra-batch duplicate"),
    ):
        try:
            cat.append(batch, "orders_u")
        except CheckViolation:
            pass
        else:
            raise RuntimeError(f"{what} landed through UNIQUE")
    # EVERY run: UPDATE on the constrained column is CHECKED (r13) —
    # a collision with an unrewritten key refuses and publishes
    # nothing...
    try:
        cat.update_where(
            "orders_u", [("o_orderkey", "=", 5)], {"o_orderkey": "6"}
        )
    except CheckViolation:
        pass
    else:
        raise RuntimeError("colliding checked UPDATE landed")
    if cat._read_manifest(strict=False)["version"] != v:
        raise RuntimeError("a refused write still published a version")
    # ...while a fresh key value round-trips (state restored for the
    # oracle)
    if cat.update_where(
        "orders_u", [("o_orderkey", "=", 5)], {"o_orderkey": "1000000"}
    ) != 1:
        raise RuntimeError("checked UPDATE to a fresh key did not land")
    if cat.update_where(
        "orders_u", [("o_orderkey", "=", 1000000)], {"o_orderkey": "5"}
    ) != 1:
        raise RuntimeError("checked UPDATE round-trip did not land")
    return cat.read("orders_u").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("o_orderkey").alias("n_keys"),
        money_2dp(cents("o_totalprice"), 100).alias("total_price"),
    )


@register(
    "etl_generated_columns",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           count(*) AS n_orders,
           CAST(SUM((CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) * 19)
                    // 100) AS BIGINT) AS tax_cents
    FROM orders
    WHERE o_orderkey < 2000
    GROUP BY 1 ORDER BY 1
    """,
    doc="""GENERATED ALWAYS AS (expr) computed columns (dml_sql
    _insert_computed + transactions create_table(generated=...)): the
    engine fills tax = round(price*0.19, 2) and yr = year(date) on
    every INSERT from the row's other values — one narrow codegen
    select, zero shuffles — and supplying a computed column refuses
    (asserted in-query). Oracle recomputes the same expressions
    straight off parquet and aggregates per generated year.""",
)
def etl_generated_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    tag = os.path.basename(sf_dir).replace(".", "_")
    root = _scratch_root(f"etl_gen_{tag}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("orders_g"):
        load_table(spark, sf_dir, "orders").createOrReplaceTempView(
            "orders_src_gv"
        )
        execute_dml(
            cat,
            "CREATE TABLE orders_g (okey BIGINT, price DOUBLE, "
            "odate TIMESTAMP, "
            # integer-exact tax: recover exact cents (the true product
            # is integral, so ROUND(...,0) never sits on a .5), then
            # BIGINT floor-div — no double rounding boundary on either
            # engine
            "tax_cents BIGINT GENERATED ALWAYS AS "
            "(CAST(ROUND(price * 100, 0) AS BIGINT) * 19 DIV 100), "
            "yr INT GENERATED ALWAYS AS (year(odate)))",
        )
        execute_dml(
            cat,
            "INSERT INTO orders_g (okey, price, odate) SELECT "
            "o_orderkey, o_totalprice, o_orderdate FROM orders_src_gv "
            "WHERE o_orderkey < 2000",
        )
    # EVERY run: supplying a computed column refuses
    try:
        execute_dml(
            cat,
            "INSERT INTO orders_g (okey, price, odate, tax_cents) "
            "VALUES (1, 1.0, TIMESTAMP '2024-01-01 00:00:00', 0)",
        )
    except ValueError as e:
        if "GENERATED ALWAYS" not in str(e):
            raise
    else:
        raise RuntimeError("explicit computed-column insert did not refuse")
    return (
        cat.read("orders_g")
        .groupBy("yr")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("tax_cents").alias("tax_cents"),
        )
        .orderBy("yr")
    )


@register(
    "etl_fk_constraint",
    """
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0 AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey < 600
    GROUP BY n_name
    ORDER BY n_name
    """,
    doc="""Write-enforced FOREIGN KEY (transactions add_fk_constraint +
    _fk_misses / _refuse_fk_orphans; SQL ALTER TABLE ... ADD CONSTRAINT
    ... FOREIGN KEY ... REFERENCES): nation becomes the parent (UNIQUE
    n_nationkey + one synthetic unreferenced key), customers < 500 the
    child. A valid append lands, an orphan append REFUSES and publishes
    nothing, deleting a referenced parent key REFUSES (RESTRICT), and
    deleting the unreferenced synthetic key proceeds — all asserted
    in-query. The child-side probe is one column-pruned anti-join
    (bucket-pruned when the parent is bucketed on the key); the
    parent-side guard probes children for exactly the removed keys
    (O(changes), sound because the referenced columns are UNIQUE).
    Generalizes the reference ETL's FK-miss -> reject
    (etl-gcs-cloudsql/src/services/conductor.ts:90-98) to declared DDL.
    Oracle = the surviving child rows joined back to nation.""",
)
def etl_fk_constraint(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.transactions import (
        CheckViolation,
        TransactionalCatalog,
    )

    tag = os.path.basename(sf_dir).replace(".", "_")
    root = _scratch_root(f"etl_fk_{tag}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("nation_fk"):
        nation = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name"
        )
        cat.overwrite(
            nation.unionByName(
                spark.createDataFrame(
                    [(999, "ATLANTIS")], "n_nationkey long, n_name string"
                ).select(
                    F.col("n_nationkey"),
                    F.col("n_name"),
                )
            ),
            "nation_fk",
        )
        cat.add_unique_constraint("nation_fk", "pk", ["n_nationkey"])
        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey", "c_acctbal"
        )
        cat.overwrite(cust.where(F.col("c_custkey") < 500), "customer_fk")
        execute_dml(
            cat,
            "ALTER TABLE customer_fk ADD CONSTRAINT cfk "
            "FOREIGN KEY (c_nationkey) REFERENCES nation_fk (n_nationkey)",
        )
        # a valid second batch lands
        cat.append(
            cust.where(
                (F.col("c_custkey") >= 500) & (F.col("c_custkey") < 600)
            ),
            "customer_fk",
        )
        # deleting the synthetic unreferenced key proceeds (RESTRICT
        # only guards referenced keys)
        if execute_dml(
            cat, "DELETE FROM nation_fk WHERE n_nationkey = 999"
        )["deleted"] != 1:
            raise RuntimeError("unreferenced parent delete did not land")
    # EVERY run: an orphan child write refuses and publishes nothing
    v = cat._read_manifest(strict=False)["version"]
    try:
        execute_dml(
            cat, "INSERT INTO customer_fk VALUES (999999, 777, 0.0)"
        )
    except CheckViolation:
        pass
    else:
        raise RuntimeError("orphan child insert did not refuse")
    # EVERY run: deleting a referenced parent key refuses
    try:
        execute_dml(cat, "DELETE FROM nation_fk WHERE n_nationkey = 1")
    except CheckViolation:
        pass
    else:
        raise RuntimeError("referenced parent delete did not refuse")
    if cat._read_manifest(strict=False)["version"] != v:
        raise RuntimeError("refused writes published a version")
    return (
        cat.read("customer_fk")
        .join(
            cat.read("nation_fk"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            money_2dp(cents("c_acctbal"), 100).alias("total_acctbal"),
        )
        .orderBy("n_name")
    )


@register(
    "etl_fk_on_update",
    """
    WITH cas AS (
      SELECT CASE WHEN c_nationkey < 5 THEN c_nationkey + 100
                  ELSE c_nationkey END AS fk
      FROM customer WHERE c_custkey < 500),
    nul AS (
      SELECT CASE WHEN c_nationkey < 5 THEN NULL
                  ELSE c_nationkey END AS fk
      FROM customer WHERE c_custkey < 500)
    SELECT 'cascade' AS src, fk, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM cas GROUP BY fk
    UNION ALL
    SELECT 'set_null' AS src, fk, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM nul GROUP BY fk
    ORDER BY src, fk
    """,
    doc="""FOREIGN KEY ON UPDATE CASCADE / SET NULL (transactions
    _plan_fk_update_actions + update_where cascade wrapper; SQL ... ON
    UPDATE CASCADE|SET NULL): nation is the parent, two customer-derived
    children declare opposite actions, and ONE parent UPDATE rewrites
    every n_nationkey < 5 to +100. The cascade child's fk values follow
    the keys (a per-column CASE over the collected old->new map, the
    child rewrite bucket-prunable on fk IN (old keys)); the set-null
    child's matching fks null out; parent + both legs publish as ONE
    atomic version, staged parent-first so the legs' own FK probes see
    the new keys (read-your-writes). EXPLAIN UPDATE reports the leg
    fan-out (asserted every run, metadata-only). Oracle = the final
    child states recomputed declaratively from the base tables.""",
)
def etl_fk_on_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.transactions import (
        TransactionalCatalog,
    )

    tag = os.path.basename(sf_dir).replace(".", "_")
    root = _scratch_root(f"etl_fk_upd_{tag}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("nation_u"):
        nation = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name"
        )
        cat.overwrite(nation, "nation_u")
        cat.add_unique_constraint("nation_u", "pk", ["n_nationkey"])
        cust = (
            load_table(spark, sf_dir, "customer")
            .where(F.col("c_custkey") < 500)
            .select("c_custkey", F.col("c_nationkey").alias("fk"))
        )
        cat.overwrite(cust, "cust_cas")
        cat.overwrite(cust, "cust_null")
        execute_dml(
            cat,
            "ALTER TABLE cust_cas ADD CONSTRAINT fc FOREIGN KEY (fk) "
            "REFERENCES nation_u (n_nationkey) ON UPDATE CASCADE",
        )
        execute_dml(
            cat,
            "ALTER TABLE cust_null ADD CONSTRAINT fn FOREIGN KEY (fk) "
            "REFERENCES nation_u (n_nationkey) ON UPDATE SET NULL",
        )
        v = cat._read_manifest(strict=False)["version"]
        execute_dml(
            cat,
            "UPDATE nation_u SET n_nationkey = n_nationkey + 100 "
            "WHERE n_nationkey < 5",
        )
        if cat._read_manifest(strict=False)["version"] != v + 1:
            raise RuntimeError(
                "parent update + cascade legs did not publish as one "
                "atomic version"
            )
    # EVERY run: the dry run reports the leg fan-out (metadata-only)
    plan = execute_dml(
        cat,
        "EXPLAIN UPDATE nation_u SET n_nationkey = 999 "
        "WHERE n_nationkey = 104",
    )
    legs = {(a["child"], a["action"]) for a in plan["fk_update_actions"]}
    if legs != {("cust_cas", "cascade"), ("cust_null", "set null")}:
        raise RuntimeError(f"EXPLAIN UPDATE mis-reported legs: {legs}")
    return (
        cat.read("cust_cas")
        .groupBy("fk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .select(F.lit("cascade").alias("src"), "fk", "n_rows")
        .unionByName(
            cat.read("cust_null")
            .groupBy("fk")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
            .select(F.lit("set_null").alias("src"), "fk", "n_rows")
        )
        .orderBy("src", "fk")
    )


@register(
    "etl_merge_when",
    """
    WITH t0 AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey < 800),
    s0 AS (
      SELECT o_orderkey AS k, 'S' AS st,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) + 5 AS cents
      FROM orders WHERE o_orderkey >= 400 AND o_orderkey < 1200),
    final AS (
      SELECT CASE WHEN s0.cents % 2 = 0 THEN s0.st ELSE t0.st END AS st,
             CASE WHEN s0.cents % 2 = 0 THEN s0.cents ELSE t0.cents END
               AS cents
      FROM t0 JOIN s0 ON t0.k = s0.k
      UNION ALL
      SELECT st, cents FROM t0
      WHERE k NOT IN (SELECT k FROM s0) AND st <> 'F'
      UNION ALL
      SELECT st, cents FROM s0
      WHERE k NOT IN (SELECT k FROM t0) AND cents % 3 = 0)
    SELECT st, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM final GROUP BY st ORDER BY st
    """,
    doc="""Generalized MERGE WHEN clause set (transactions merge_when;
    SQL conditional + NOT MATCHED BY SOURCE clauses): a snapshot sync
    of an orders-derived state table in ONE atomic statement — matched
    rows take the source when src.cents is even, unmatched source rows
    insert when divisible by 3, and target rows absent from the source
    drop when their status is 'F'. One full-outer shuffle join computes
    the post-image; the write rides the checked overwrite path (parent
    FK probes / UNIQUE / CHECKs); on bucketed targets the same operator
    prunes to the source keys' buckets via replace_partitions unless a
    BY SOURCE clause forces the honest full-sync scan. EXPLAIN MERGE
    reports the clause set and blast radius (asserted every run).
    Oracle = the clause semantics recomputed declaratively.""",
)
def etl_merge_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.transactions import (
        TransactionalCatalog,
    )

    tag = os.path.basename(sf_dir).replace(".", "_")
    root = _scratch_root(f"etl_merge_when_{tag}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("state_sync"):
        orders = load_table(spark, sf_dir, "orders")
        cat.overwrite(
            orders.where(F.col("o_orderkey") < 800).select(
                F.col("o_orderkey").alias("k"),
                F.col("o_orderstatus").alias("st"),
                cents("o_totalprice").alias("cents"),
            ),
            "state_sync",
        )
        orders.where(
            (F.col("o_orderkey") >= 400) & (F.col("o_orderkey") < 1200)
        ).select(
            F.col("o_orderkey").alias("k"),
            F.lit("S").alias("st"),
            (cents("o_totalprice") + F.lit(5)).alias("cents"),
        ).createOrReplaceTempView("snap_src")
        v = cat._read_manifest(strict=False)["version"]
        execute_dml(
            cat,
            "MERGE INTO state_sync USING snap_src ON k = k "
            "WHEN MATCHED AND src.cents % 2 = 0 THEN UPDATE SET * "
            "WHEN NOT MATCHED AND src.cents % 3 = 0 THEN INSERT * "
            "WHEN NOT MATCHED BY SOURCE AND tgt.st = 'F' THEN DELETE",
        )
        if cat._read_manifest(strict=False)["version"] != v + 1:
            raise RuntimeError(
                "three-clause merge did not publish as one version"
            )
    # EVERY run: the dry run names the clause set (metadata + one
    # source count, no write)
    spark.createDataFrame([(1, "S", 0)], "k long, st string, cents long"
                          ).createOrReplaceTempView("probe_src")
    plan = execute_dml(
        cat,
        "EXPLAIN MERGE INTO state_sync USING probe_src ON k = k "
        "WHEN MATCHED THEN DELETE "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
    )
    if plan["mode"] != "merge_when" or set(plan["clauses"]) != {
        "matched", "by_source",
    }:
        raise RuntimeError(f"EXPLAIN MERGE mis-reported: {plan}")
    return (
        cat.read("state_sync")
        .groupBy("st")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("cents").alias("total_cents"),
        )
        .orderBy("st")
    )


@register(
    "etl_consumer_across_rename",
    """
    SELECT o_orderkey, o_orderstatus,
           round(o_totalprice, 2) AS total_price
    FROM orders
    WHERE o_orderkey < 1600 AND o_orderstatus <> 'F'
    ORDER BY o_orderkey
    """,
    doc="""Change-feed consumers FOLLOWING the rename lineage (r13:
    pump_table_changes(follow_renames=True) + resolve_renamed): a keyed
    replica consumer registers opted-in, the source takes an append,
    is RENAMED (allowed because every follower opted in), then takes a
    DELETE under its new name — and ONE pump folds the whole window,
    crossing the rename commit, carrying the watermark onto the new
    name (asserted in-query, plus: pumping by the STALE old name still
    resolves). Previously the rename refused while any consumer
    followed the table, stranding long-lived CDC pipelines on routine
    lake renames. Oracle = the source's logical final state; invariant
    replica == source across the identity change.""",
)
def etl_consumer_across_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark.streaming.cdf import (
        apply_changes_into,
        bootstrap_changes_target,
        pump_table_changes,
    )
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    tag = os.path.basename(sf_dir).replace(".", "_")
    root = _scratch_root(f"etl_cons_rename_{tag}")
    cat = TransactionalCatalog(spark=spark, root=root)

    def apply(feed):
        return apply_changes_into(cat, feed, "orders_fr_rep", ["o_orderkey"])

    if not cat.exists("orders_fr_dst"):  # warm rerun reuses the lake
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        cat.overwrite(
            orders.where(F.col("o_orderkey") < 800).coalesce(2),
            "orders_fr_src",
        )
        v0 = cat._read_manifest(strict=False)["version"]
        pump_table_changes(
            cat, "orders_fr_src", "fr_cons",
            start_version=v0, follow_renames=True,
        )
        bootstrap_changes_target(
            cat, "orders_fr_src", "orders_fr_rep", ["o_orderkey"],
            num_buckets=8,
        )
        cat.append(
            orders.where(
                (F.col("o_orderkey") >= 800) & (F.col("o_orderkey") < 1600)
            ).coalesce(2),
            "orders_fr_src",
        )
        cat.rename_table("orders_fr_src", "orders_fr_dst")
        if cat.delete_where(
            "orders_fr_dst", [("o_orderstatus", "=", "F")]
        ) <= 0:
            raise RuntimeError("post-rename delete removed nothing")
        # ONE pump, by the STALE name, crossing append+rename+delete
        out = pump_table_changes(cat, "orders_fr_src", "fr_cons", apply)
        if out["applied"] in (0, None) or out["source"] != "orders_fr_dst":
            raise RuntimeError(f"follow-renames pump did not cross: {out}")
        wm = cat.stream_watermark("fr_cons")
        if wm["source"] != "orders_fr_dst" or not wm.get("follow_renames"):
            raise RuntimeError(f"watermark not carried across rename: {wm}")
    # EVERY run: a caught-up pump by the NEW name is a zero-commit no-op
    v = cat._read_manifest(strict=False)["version"]
    out = pump_table_changes(cat, "orders_fr_dst", "fr_cons", apply)
    if out["from"] != out["to"] or cat._read_manifest(
        strict=False
    )["version"] != v:
        raise RuntimeError(f"caught-up pump was not a no-op: {out}")
    return (
        cat.read("orders_fr_rep")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("total_price"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "etl_sql_transaction",
    """
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) / 100.0 AS total_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey < 300
    GROUP BY n_name
    ORDER BY n_name
    """,
    doc="""Multi-statement SQL transactions (dml_sql
    _execute_transaction -> TransactionalCatalog.begin/commit): a
    BEGIN; INSERT parent; INSERT child; COMMIT block stages every
    statement into ONE transaction and publishes in ONE manifest swap
    — the FK probe sees the intra-block staged parent rows, a failing
    block (orphan child key) leaves NOTHING visible and burns no
    version, and ROLLBACK discards cleanly (all asserted in-query).
    The reference's per-row BEGIN/COMMIT (etl-gcs-cloudsql/src/
    services/empresa.ts:60,108) at the engine's natural granularity.
    Oracle = the committed child rows joined to the parent.""",
)
def etl_sql_transaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.transactions import (
        CheckViolation,
        TransactionalCatalog,
    )

    tag = os.path.basename(sf_dir).replace(".", "_")
    root = _scratch_root(f"etl_sqltxn_{tag}")
    cat = TransactionalCatalog(spark=spark, root=root)
    if not cat.exists("nation_tx"):
        nation = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name"
        )
        supp = load_table(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_nationkey", "s_acctbal"
        )
        # stage the lake WITHOUT the last nation: the txn inserts it
        # together with its suppliers atomically
        last = nation.agg(F.max("n_nationkey")).first()[0]
        cat.overwrite(
            nation.where(F.col("n_nationkey") < last), "nation_tx"
        )
        cat.add_unique_constraint("nation_tx", "pk", ["n_nationkey"])
        cat.overwrite(
            supp.where(
                (F.col("s_suppkey") < 300)
                & (F.col("s_nationkey") < last)
            ),
            "supplier_tx",
        )
        execute_dml(
            cat,
            "ALTER TABLE supplier_tx ADD CONSTRAINT sfk FOREIGN KEY "
            "(s_nationkey) REFERENCES nation_tx (n_nationkey)",
        )
        last_name = nation.where(
            F.col("n_nationkey") == last
        ).first()["n_name"]
        rows = supp.where(
            (F.col("s_suppkey") < 300) & (F.col("s_nationkey") == last)
        ).collect()
        values = ", ".join(
            f"({r['s_suppkey']}, {r['s_nationkey']}, {r['s_acctbal']})"
            for r in rows
        )
        v0 = cat._read_manifest(strict=False)["version"]
        out = execute_dml(
            cat,
            f"BEGIN; INSERT INTO nation_tx VALUES ({last}, "
            f"'{last_name}'); INSERT INTO supplier_tx (s_suppkey, "
            f"s_nationkey, s_acctbal) VALUES {values}; COMMIT",
        )
        if out["transaction"] != "committed":
            raise RuntimeError(f"txn block did not commit: {out}")
        if cat._read_manifest(strict=False)["version"] != v0 + 1:
            raise RuntimeError("txn block burned more than one commit")
    # EVERY run: a failing block publishes nothing...
    v = cat._read_manifest(strict=False)["version"]
    try:
        execute_dml(
            cat,
            "BEGIN; INSERT INTO nation_tx VALUES (998, 'NOWHERE'); "
            "INSERT INTO supplier_tx (s_suppkey, s_nationkey, "
            "s_acctbal) VALUES (999001, 997, 0.0); COMMIT",
        )
    except CheckViolation:
        pass
    else:
        raise RuntimeError("orphan child insert inside txn did not refuse")
    # ...and ROLLBACK discards cleanly
    out = execute_dml(
        cat,
        "BEGIN; INSERT INTO nation_tx VALUES (999, 'LIMBO'); ROLLBACK",
    )
    if out["transaction"] != "rolled_back":
        raise RuntimeError(f"ROLLBACK block misreported: {out}")
    if cat._read_manifest(strict=False)["version"] != v:
        raise RuntimeError("a refused/rolled-back block published")
    return (
        cat.read("supplier_tx")
        .join(
            cat.read("nation_tx"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            money_2dp(cents("s_acctbal"), 100).alias("total_acctbal"),
        )
        .orderBy("n_name")
    )
