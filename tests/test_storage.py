"""Catalog semantics: atomic-ish overwrite swap and merge_upsert edge
cases (NULL-key null-safe matches must update, not silently drop)."""

import os
import tempfile

import pytest

from gcp_datalake_pipeline_spark.storage import Catalog


@pytest.fixture()
def catalog(spark):
    with tempfile.TemporaryDirectory() as root:
        yield Catalog(spark=spark, root=root)


def test_merge_upsert_null_key_row_updates(spark, catalog):
    """A source row whose key is NULL must null-safe-match a NULL-keyed
    target row and UPDATE it — the sentinel-flag regression: with the old
    key-nullability match detection it was neither updated nor inserted."""
    target = spark.createDataFrame(
        [(None, "old-null", 1), ("k1", "old-k1", 2)],
        "key string, val string, keep int",
    )
    catalog.overwrite(target, "t")
    source = spark.createDataFrame(
        [(None, "new-null", 99), ("k2", "new-k2", 3)],
        "key string, val string, keep int",
    )
    out = catalog.merge_upsert(source, "t", key_cols=["key"], update_cols=["val"])
    rows = {r["key"]: r for r in out.collect()}
    assert set(rows) == {None, "k1", "k2"}
    assert rows[None]["val"] == "new-null"  # updated, not dropped
    assert rows[None]["keep"] == 1  # frozen column untouched
    assert rows["k1"]["val"] == "old-k1"
    assert rows["k2"]["val"] == "new-k2"  # inserted


def test_merge_upsert_counts_and_ids(spark, catalog):
    base = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "k string, v double"
    )
    catalog.merge_upsert(base, "m", key_cols=["k"], id_col="mid")
    first = {r["k"]: r["mid"] for r in catalog.read("m").collect()}
    assert first == {"a": 1, "b": 2}

    nxt = spark.createDataFrame(
        [("b", 20.0), ("c", 3.0)], "k string, v double"
    )
    out = catalog.merge_upsert(nxt, "m", key_cols=["k"], id_col="mid")
    rows = {r["k"]: r for r in out.collect()}
    assert rows["b"]["mid"] == first["b"]  # stable surrogate on update
    assert rows["b"]["v"] == 20.0
    assert rows["c"]["mid"] == 3  # max+rank for the insert


def test_overwrite_swaps_and_cleans_up(spark, catalog):
    df1 = spark.createDataFrame([(1,)], "x int")
    df2 = spark.createDataFrame([(2,), (3,)], "x int")
    catalog.overwrite(df1, "t")
    catalog.overwrite(df2, "t")
    assert sorted(r["x"] for r in catalog.read("t").collect()) == [2, 3]
    assert not os.path.exists(catalog.path("t") + "__tmp")
    assert not os.path.exists(catalog.path("t") + "__old")
