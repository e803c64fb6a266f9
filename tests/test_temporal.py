"""Edge cases for the as-of / range join compositions."""

from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators.temporal import (
    as_of_join,
    range_join_within,
)


def test_asof_no_preceding_match_gives_null(spark):
    left = spark.createDataFrame(
        [(1, 100), (1, 50), (2, 10)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 60, "a"), (1, 90, "b"), (3, 5, "z")], "k long, rts long, v string"
    )
    out = {
        (r["k"], r["ts"]): r["v_asof"]
        for r in as_of_join(
            left, right, key="k", left_ts="ts", right_ts="rts", right_cols=["v"]
        ).collect()
    }
    assert out[(1, 100)] == "b"  # latest <= 100
    assert out[(1, 50)] is None  # nothing at-or-before 50
    assert out[(2, 10)] is None  # key with no right rows


def test_asof_equal_timestamp_visible(spark):
    left = spark.createDataFrame([(1, 60)], "k long, ts long")
    right = spark.createDataFrame([(1, 60, "x")], "k long, rts long, v string")
    row = as_of_join(
        left, right, key="k", left_ts="ts", right_ts="rts", right_cols=["v"]
    ).first()
    assert row["v_asof"] == "x"  # <= semantics


def test_range_join_boundary_inclusive(spark):
    left = spark.createDataFrame([(1, 1000, "L")], "k long, ts long, tag string")
    right = spark.createDataFrame(
        [(1, 1100, "in"), (1, 2000, "edge"), (1, 2001, "out"), (2, 1000, "wrongkey")],
        "k long, ts long, tag string",
    )
    got = {
        r["tag_r"]
        for r in range_join_within(
            left, right, key="k", left_ts="ts", right_ts="ts", tolerance=1000
        ).collect()
    }
    assert got == {"in", "edge"}  # inclusive bound, key-blocked
