"""Scale join helpers: bucketed co-located joins (no Exchange in plan) and
salted skew joins (same result as plain join)."""

import pytest
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators.joins import (
    bucketed_join_is_shuffle_free,
    salted_join,
    write_bucketed,
)
from gcp_datalake_pipeline_spark.plans.queries import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_no_shuffle(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderdate"
    ).withColumnRenamed("o_orderkey", "l_orderkey")

    write_bucketed(li, "b_lineitem", ["l_orderkey"], num_buckets=4)
    write_bucketed(orders, "b_orders", ["l_orderkey"], num_buckets=4)
    try:
        assert bucketed_join_is_shuffle_free(
            spark, "b_lineitem", "b_orders", ["l_orderkey"]
        )
        # and the join result matches the unbucketed join
        n_bucketed = (
            spark.table("b_lineitem").join(spark.table("b_orders"), "l_orderkey").count()
        )
        n_plain = li.join(orders, "l_orderkey").count()
        assert n_bucketed == n_plain
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = (
        li.join(orders, "l_orderkey")
        .agg(F.count(F.lit(1)), F.round(F.sum("o_totalprice"), 2))
        .first()
    )
    salted = (
        salted_join(li, orders, "l_orderkey", salt_buckets=8)
        .agg(F.count(F.lit(1)), F.round(F.sum("o_totalprice"), 2))
        .first()
    )
    assert plain == salted


def test_salted_left_join(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    # right side missing most keys -> left join must preserve all left rows
    orders = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    )
    out = salted_join(li, orders, "l_orderkey", salt_buckets=4, how="left")
    assert out.count() == li.count()
    assert out.filter(F.col("o_totalprice").isNotNull()).count() > 0


def test_salted_join_rejects_right_and_full(spark):
    """Right/full would emit unmatched right rows salt_buckets times —
    the guard must refuse rather than silently over-count."""
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey")
    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    for how in ("right", "full", "full_outer", "rightouter", "FULL"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(li, orders, "l_orderkey", how=how)


def test_assign_dense_ids_matches_global_rank_and_is_sharded(spark):
    """Sharded surrogate assignment must equal the global-window dense rank
    while keeping the id-assigning window partitioned (no single-task
    Exchange SinglePartition feeding a row_number over the whole set)."""
    from pyspark.sql import Window

    from gcp_datalake_pipeline_spark.operators.dims import assign_dense_ids

    vals = load_table(spark, SF_DIR, "part").select("p_brand").distinct()
    sharded = assign_dense_ids(vals, ["p_brand"], "id", start=100)
    expected = vals.select(
        "p_brand",
        (F.row_number().over(Window.orderBy("p_brand")) + 100)
        .cast("long")
        .alias("id"),
    )
    got = {(r["p_brand"], r["id"]) for r in sharded.collect()}
    want = {(r["p_brand"], r["id"]) for r in expected.collect()}
    assert got == want

    plan = sharded._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
