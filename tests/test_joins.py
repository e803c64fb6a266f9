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


def _norm_rows(df, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


@pytest.mark.parametrize("how", ["right", "full", "full_outer", "rightouter"])
def test_salted_right_and_full_match_plain_join(spark, how):
    """Right/full ride the inner salted core + anti-join complements:
    every unmatched row appears EXACTLY once (the naive replicated join
    would emit unmatched right rows salt_buckets times)."""
    left = spark.createDataFrame(
        # skewed left: key 1 hot; key 3 unmatched-on-right side absent
        [(1, f"l{i}") for i in range(50)] + [(2, "x"), (4, "y")],
        "k long, lv string",
    )
    right = spark.createDataFrame(
        # keys 3,5 unmatched on the left; duplicate right rows for key 2
        [(1, 10.0), (2, 20.0), (2, 21.0), (3, 30.0), (5, 50.0)],
        "k long, rv double",
    )
    cols = ["k", "lv", "rv"]
    got = _norm_rows(
        salted_join(left, right, "k", salt_buckets=4, how=how), cols
    )
    want = _norm_rows(left.join(right, "k", how), cols)
    assert got == want
    # unmatched right rows appear exactly once each
    n_unmatched = sum(1 for k, lv, rv in got if lv is None)
    assert n_unmatched == 2


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


def test_salted_right_full_plan_has_no_funnel(spark):
    """The right/full composition must stay distributed: no SinglePartition
    exchange anywhere (the left DISTINCT collapses hot keys before its
    anti-join, map-side combined)."""
    left = spark.createDataFrame([(1, "a")], "k long, lv string")
    right = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, rv double")
    for how in ("right", "full"):
        plan = (
            salted_join(left, right, "k", salt_buckets=4, how=how)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange SinglePartition" not in plan, how
