"""SCD Type-2 merge semantics (operators/scd.py)."""

import datetime

from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators.scd import scd2_apply

KEYS = ["k"]
TRACKED = ["v"]


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _apply_chain(spark, batches):
    hist = None
    for i, rows in enumerate(batches, start=1):
        hist = scd2_apply(
            hist, _snap(spark, rows), KEYS, TRACKED,
            datetime.datetime(2024, i, 1),
        )
    return hist


def test_initial_load_all_open(spark):
    h = _apply_chain(spark, [[(1, "a"), (2, "b")]]).collect()
    assert len(h) == 2
    assert all(r["is_current"] and r["valid_to"] is None for r in h)
    assert all(r["valid_from"] == datetime.datetime(2024, 1, 1) for r in h)


def test_unchanged_batch_is_a_noop(spark):
    h = _apply_chain(spark, [[(1, "a")], [(1, "a")]]).collect()
    assert len(h) == 1
    assert h[0]["is_current"] and h[0]["valid_from"] == datetime.datetime(2024, 1, 1)


def test_change_closes_and_opens(spark):
    h = _apply_chain(spark, [[(1, "a")], [(1, "b")]])
    rows = sorted(h.collect(), key=lambda r: r["valid_from"])
    assert [(r["v"], r["is_current"]) for r in rows] == [("a", False), ("b", True)]
    assert rows[0]["valid_to"] == datetime.datetime(2024, 2, 1)
    assert rows[1]["valid_from"] == datetime.datetime(2024, 2, 1)


def test_three_version_chain_and_absent_key_untouched(spark):
    h = _apply_chain(
        spark,
        [[(1, "a"), (2, "x")], [(1, "b")], [(1, "c"), (2, "x")]],
    )
    k1 = sorted(
        h.filter(F.col("k") == 1).collect(), key=lambda r: r["valid_from"]
    )
    assert [r["v"] for r in k1] == ["a", "b", "c"]
    assert [r["is_current"] for r in k1] == [False, False, True]
    # closed ranges chain contiguously
    assert k1[0]["valid_to"] == k1[1]["valid_from"]
    assert k1[1]["valid_to"] == k1[2]["valid_from"]
    # key 2 was absent from batch 2 (absence != delete) and unchanged in
    # batch 3 -> still the single original open row
    k2 = h.filter(F.col("k") == 2).collect()
    assert len(k2) == 1 and k2[0]["is_current"]
    assert k2[0]["valid_from"] == datetime.datetime(2024, 1, 1)


def test_null_safe_change_detection(spark):
    # value -> NULL is a change; NULL -> NULL is not
    h = _apply_chain(spark, [[(1, "a")], [(1, None)], [(1, None)]])
    rows = sorted(
        h.collect(), key=lambda r: (r["valid_from"], r["is_current"])
    )
    assert [(r["v"], r["is_current"]) for r in rows] == [("a", False), (None, True)]


def test_new_key_mid_stream(spark):
    h = _apply_chain(spark, [[(1, "a")], [(1, "a"), (2, "n")]])
    k2 = h.filter(F.col("k") == 2).collect()
    assert len(k2) == 1
    assert k2[0]["is_current"] and k2[0]["valid_from"] == datetime.datetime(2024, 2, 1)


def test_scd2_asof_picks_exactly_one_version(spark):
    from gcp_datalake_pipeline_spark.operators.scd import scd2_asof

    h = _apply_chain(
        spark,
        [[(1, "a"), (2, "x")], [(1, "b")], [(1, "c"), (2, "x")]],
    )

    def state(ts):
        return {
            r["k"]: r["v"] for r in scd2_asof(h, ts).collect()
        }

    # between batches 1 and 2: original values everywhere
    assert state(datetime.datetime(2024, 1, 15)) == {1: "a", 2: "x"}
    # exactly at a transition: the NEW version is in effect (valid_from
    # inclusive, valid_to exclusive)
    assert state(datetime.datetime(2024, 2, 1)) == {1: "b", 2: "x"}
    assert state(datetime.datetime(2024, 3, 5)) == {1: "c", 2: "x"}
    # before any history: empty state
    assert state(datetime.datetime(2023, 12, 1)) == {}
    # meta columns are stripped from the point-in-time view
    assert set(scd2_asof(h, datetime.datetime(2024, 1, 15)).columns) == {"k", "v"}
