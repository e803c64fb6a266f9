"""Edge cases for the as-of / range join / gapfill compositions."""

import datetime

from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators.temporal import (
    as_of_join,
    gapfill,
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


def _d(day):
    return datetime.datetime(2024, 1, day)


def test_gapfill_zero_fill_and_locf(spark):
    agg = spark.createDataFrame(
        [
            (1, _d(1), 2, 10.0),
            (1, _d(4), 1, 7.0),  # gap: Jan 2, Jan 3 missing
            (2, _d(2), 5, 3.0),  # single-day key -> no generated rows
        ],
        "k long, day timestamp, n long, v double",
    )
    rows = {
        (r["k"], r["day"].day): (r["n"], r["v"])
        for r in gapfill(
            agg, key="k", bucket_col="day", step="1 day",
            value_cols=["n"], locf_cols=["v"],
        ).collect()
    }
    # key 1 spans Jan 1..4 inclusive; key 2 is a single day
    assert set(rows) == {(1, 1), (1, 2), (1, 3), (1, 4), (2, 2)}
    assert rows[(1, 1)] == (2, 10.0)
    assert rows[(1, 2)] == (0, 10.0)  # generated: zero n, carried v
    assert rows[(1, 3)] == (0, 10.0)
    assert rows[(1, 4)] == (1, 7.0)  # observed row overrides the carry
    assert rows[(2, 2)] == (5, 3.0)


def test_gapfill_tolerates_duplicate_key_bucket_rows(spark):
    """The one-row-per-(key, bucket) contract violated: lead() returns an
    EQUAL next bucket, which without the greatest() clamp raises Spark's
    opaque 'illegal sequence boundaries' in an executor. Duplicates must
    instead emit their own row only (old spine-join behavior)."""
    agg = spark.createDataFrame(
        [(1, _d(1), 2), (1, _d(1), 3), (1, _d(3), 1)],
        "k long, day timestamp, n long",
    )
    out = gapfill(
        agg, key="k", bucket_col="day", step="1 day", value_cols=["n"]
    ).collect()
    # both duplicate Jan-1 rows present, gap day Jan 2 filled once
    days = sorted((r["day"].day, r["n"]) for r in out)
    assert days == [(1, 2), (1, 3), (2, 0), (3, 1)]


def test_gapfill_span_is_per_key_not_global(spark):
    # key 2's span must not be widened by key 1's longer range
    agg = spark.createDataFrame(
        [(1, _d(1), 1), (1, _d(10), 1), (2, _d(5), 1), (2, _d(6), 1)],
        "k long, day timestamp, n long",
    )
    out = gapfill(agg, key="k", bucket_col="day", step="1 day", value_cols=["n"])
    per_key = {
        r["k"]: r["cnt"]
        for r in out.groupBy("k").agg(F.count("*").alias("cnt")).collect()
    }
    assert per_key == {1: 10, 2: 2}
