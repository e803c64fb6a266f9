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


def test_jdbc_sink_roundtrip_embedded_derby(spark, catalog):
    """S8 relational sink: write via df.write.jdbc (batched, bounded
    connections) to the embedded Derby bundled with Spark, read back, and
    compare. Any other JDBC database (the reference's Cloud SQL Postgres)
    is the same call with its driver jar on the classpath."""
    with tempfile.TemporaryDirectory() as d:
        url = f"jdbc:derby:{d}/db;create=true"
        driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
        df = spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.5), (3, "c", None)],
            "id bigint, name string, score double",
        )
        catalog.to_jdbc(
            df, "t_round", url, mode="overwrite", driver=driver,
            batchsize=2, num_partitions=2,
        )
        back = catalog.read_jdbc("t_round", url, driver=driver)
        got = {(r["id"], r["name"], r["score"]) for r in back.collect()}
        assert got == {(1, "a", 1.5), (2, "b", 2.5), (3, "c", None)}

        # append mode accumulates
        catalog.to_jdbc(
            df.filter("id = 1"), "t_round", url, driver=driver
        )
        assert back.count() == 4


def test_overwrite_swaps_and_cleans_up(spark, catalog):
    df1 = spark.createDataFrame([(1,)], "x int")
    df2 = spark.createDataFrame([(2,), (3,)], "x int")
    catalog.overwrite(df1, "t")
    catalog.overwrite(df2, "t")
    assert sorted(r["x"] for r in catalog.read("t").collect()) == [2, 3]
    assert not os.path.exists(catalog.path("t") + "__tmp")
    assert not os.path.exists(catalog.path("t") + "__old")


def test_merge_upsert_bucketed_prunes_partitions(spark, catalog):
    """Bucketed merge must (a) produce the same state as a full merge and
    (b) physically rewrite ONLY the partitions holding the source's key
    buckets — untouched bucket directories keep their exact files."""
    import glob as g

    base = spark.createDataFrame(
        [(f"k{i}", float(i)) for i in range(200)], "k string, v double"
    )
    catalog.merge_upsert_bucketed(base, "big", key_cols=["k"], num_buckets=8,
                                  id_col="bid")
    files_before = {
        d: set(g.glob(os.path.join(d, "*.parquet")))
        for d in g.glob(os.path.join(catalog.path("big"), "_kb=*"))
    }
    assert len(files_before) > 1  # spread over several buckets

    delta = spark.createDataFrame(
        [("k3", 300.0), ("k7", 700.0), ("knew", -1.0)], "k string, v double"
    )
    out = catalog.merge_upsert_bucketed(delta, "big", key_cols=["k"],
                                        num_buckets=8, id_col="bid")
    rows = {r["k"]: r for r in out.collect()}
    assert len(rows) == 201
    assert rows["k3"]["v"] == 300.0 and rows["k7"]["v"] == 700.0
    assert rows["k5"]["v"] == 5.0  # untouched
    assert rows["knew"]["bid"] == 201  # max+1 surrogate

    touched = {r["_kb"] for r in out.filter("k in ('k3','k7','knew')")
               .select("_kb").distinct().collect()}
    files_after = {
        d: set(g.glob(os.path.join(d, "*.parquet")))
        for d in g.glob(os.path.join(catalog.path("big"), "_kb=*"))
    }
    for d, before in files_before.items():
        kb = int(d.rsplit("=", 1)[1])
        if kb in touched:
            assert files_after[d] != before  # rewritten
        else:
            assert files_after[d] == before  # not even opened for write


def test_merge_upsert_bucketed_rejects_bucket_count_mismatch(spark, catalog):
    """Re-merging with a different num_buckets than the table was created
    with would hash keys into different _kb partitions (updates become
    silent duplicate inserts) — must raise instead (ADVICE r2)."""
    import pytest

    base = spark.createDataFrame(
        [(f"k{i}", float(i)) for i in range(50)], "k string, v double"
    )
    catalog.merge_upsert_bucketed(base, "bt", key_cols=["k"], num_buckets=8)
    assert os.path.exists(catalog.path("bt") + ".buckets.json")
    delta = spark.createDataFrame([("k3", 300.0)], "k string, v double")
    with pytest.raises(ValueError, match="num_buckets"):
        catalog.merge_upsert_bucketed(delta, "bt", key_cols=["k"], num_buckets=16)
    with pytest.raises(ValueError, match="keys"):
        catalog.merge_upsert_bucketed(delta, "bt", key_cols=["v"], num_buckets=8)
    # matching bucket count still merges fine
    out = catalog.merge_upsert_bucketed(delta, "bt", key_cols=["k"], num_buckets=8)
    rows = {r["k"]: r["v"] for r in out.collect()}
    assert rows["k3"] == 300.0 and len(rows) == 50


def test_merge_upsert_schema_evolution(spark, catalog):
    """New source columns: hard error by default (never silent drop);
    evolve_schema=True widens the table and existing rows read NULL."""
    import pytest

    base = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "k string, v double")
    catalog.merge_upsert(base, "ev", key_cols=["k"])
    delta = spark.createDataFrame(
        [("b", 20.0, "extra-b"), ("c", 3.0, "extra-c")],
        "k string, v double, note string",
    )
    with pytest.raises(ValueError, match="evolve_schema"):
        catalog.merge_upsert(delta, "ev", key_cols=["k"])
    out = catalog.merge_upsert(delta, "ev", key_cols=["k"], evolve_schema=True)
    rows = {r["k"]: r for r in out.collect()}
    assert rows["a"]["note"] is None  # widened, not rewritten
    assert rows["b"]["v"] == 20.0 and rows["b"]["note"] == "extra-b"
    assert rows["c"]["note"] == "extra-c"


def test_merge_upsert_bucketed_schema_evolution_rewrites_all(spark, catalog):
    """Widening a bucketed table must rewrite every partition — a narrow
    parquet file left in an untouched bucket would drop the new column on
    later reads."""
    base = spark.createDataFrame(
        [(f"k{i}", float(i)) for i in range(100)], "k string, v double"
    )
    catalog.merge_upsert_bucketed(base, "evb", key_cols=["k"], num_buckets=8)
    delta = spark.createDataFrame([("k3", 300.0, "n3")], "k string, v double, note string")
    out = catalog.merge_upsert_bucketed(
        delta, "evb", key_cols=["k"], num_buckets=8, evolve_schema=True
    )
    assert "note" in out.columns
    rows = {r["k"]: r for r in out.collect()}
    assert len(rows) == 100
    assert rows["k3"]["note"] == "n3" and rows["k5"]["note"] is None
    # fresh read sees the widened schema for every row (all files rewritten)
    again = catalog.read("evb")
    assert "note" in again.columns and again.filter("note is not null").count() == 1


def test_scd2_upsert_version_chains_in_storage(spark, catalog):
    """Catalog.scd2_upsert maintains a queryable SCD2 history table:
    batches -> version chains with contiguous valid ranges, persisted."""
    import datetime

    b1 = spark.createDataFrame([("k1", "a"), ("k2", "x")], "k string, v string")
    catalog.scd2_upsert(
        b1, "hist", ["k"], ["v"], effective_ts=datetime.datetime(2024, 1, 1)
    )
    b2 = spark.createDataFrame([("k1", "b")], "k string, v string")
    catalog.scd2_upsert(
        b2, "hist", ["k"], ["v"], effective_ts=datetime.datetime(2024, 2, 1)
    )
    b3 = spark.createDataFrame([("k1", "c"), ("k2", "x")], "k string, v string")
    out = catalog.scd2_upsert(
        b3, "hist", ["k"], ["v"], effective_ts=datetime.datetime(2024, 3, 1)
    )

    k1 = sorted(
        out.filter(out.k == "k1").collect(), key=lambda r: r["valid_from"]
    )
    assert [r["v"] for r in k1] == ["a", "b", "c"]
    assert [r["is_current"] for r in k1] == [False, False, True]
    assert k1[0]["valid_to"] == k1[1]["valid_from"]
    assert k1[1]["valid_to"] == k1[2]["valid_from"]
    # k2 unchanged across batches -> single open row from batch 1
    k2 = out.filter(out.k == "k2").collect()
    assert len(k2) == 1 and k2[0]["is_current"]
    assert k2[0]["valid_from"] == datetime.datetime(2024, 1, 1)
    # persisted: a fresh read sees the same history
    assert catalog.read("hist").count() == 4


def test_scd2_upsert_last_wins_within_batch(spark, catalog):
    """Duplicate business keys inside one batch collapse last-wins (by
    _row_idx arrival order) before the SCD2 join, like merge_upsert."""
    import datetime

    batch = spark.createDataFrame(
        [("k1", "first", 0), ("k1", "last", 1)], "k string, v string, _row_idx long"
    )
    out = catalog.scd2_upsert(
        batch, "h2", ["k"], ["v"], effective_ts=datetime.datetime(2024, 1, 1)
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["v"] == "last"
    assert "_row_idx" not in out.columns


def test_scd2_upsert_rejects_non_history_table(spark, catalog):
    """Pointing scd2_upsert at a plain table (no META_COLS) is a hard
    error, not silent corruption."""
    import pytest as _pytest

    plain = spark.createDataFrame([("k1", "a")], "k string, v string")
    catalog.overwrite(plain, "plain")
    with _pytest.raises(ValueError, match="not an SCD2 history"):
        catalog.scd2_upsert(plain, "plain", ["k"], ["v"])


def test_refresh_aggregate_matches_full_recompute(spark, catalog):
    """Catalog.refresh_aggregate maintained over two deltas equals the
    one-shot aggregate over all rows (decomposable-agg invariant)."""
    from gcp_datalake_pipeline_spark.operators.incremental import (
        partial_aggregate,
    )

    d1 = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "g string, v double"
    )
    d2 = spark.createDataFrame(
        [("a", 10.0), ("c", 7.0)], "g string, v double"
    )
    spec = dict(keys=["g"], sum_cols={"v_sum": "v"}, count_col="n")
    catalog.refresh_aggregate(
        partial_aggregate(d1, **spec), "agg", ["g"], ["v_sum"], "n"
    )
    out = catalog.refresh_aggregate(
        partial_aggregate(d2, **spec), "agg", ["g"], ["v_sum"], "n"
    )
    expect = {
        r["g"]: (r["v_sum"], r["n"])
        for r in partial_aggregate(d1.unionByName(d2), **spec).collect()
    }
    got = {r["g"]: (r["v_sum"], r["n"]) for r in out.collect()}
    assert got == expect == {"a": (13.0, 3), "b": (5.0, 1), "c": (7.0, 1)}
    # persisted: a fresh read sees the merged state
    assert {r["g"] for r in catalog.read("agg").collect()} == {"a", "b", "c"}
