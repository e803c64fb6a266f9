"""Column mapping: metadata-only RENAME / DROP COLUMN (Delta column
mapping semantics).

Contract under test, per transactions.py's column-mapping section:

- rename/drop are pure manifest commits — zero data bytes move (inode
  pins); data files keep physical names forever;
- every surface speaks logical names: reads (plain + pruned), writers
  (logical frames translate back), metadata count/min_max, DML in both
  modes, CHECK constraints, the change feed, the SQL facade;
- stats/bloom sidecars and layouts stay physical and keep pruning;
- dropped physical names cannot be reused until a full rewrite
  (compact) retires the stale values;
- the map rides clone/restore/time travel.
"""

import os

import pytest
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.transactions import (
    CheckViolation,
    TransactionalCatalog,
)


@pytest.fixture()
def tcat(spark, tmp_path):
    return TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))


def _seed(tcat, n=100):
    df = tcat.spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("g"),
        (F.col("id") * 2.0).alias("v"),
    )
    with tcat.transaction("seed-a"):
        tcat.append(df.where(F.col("k") < n // 2).coalesce(1), "t")
    with tcat.transaction("seed-b"):
        tcat.append(df.where(F.col("k") >= n // 2).coalesce(1), "t")
    return df


def _inodes(tcat, table):
    return {
        os.stat(os.path.join(d, f)).st_ino
        for d in tcat._data_dirs(table)
        for f in tcat._dir_parquet_files(d)
    }


def test_rename_moves_no_data_and_relabels(tcat):
    _seed(tcat)
    pre = _inodes(tcat, "t")
    tcat.rename_column("t", "v", "val")
    assert _inodes(tcat, "t") == pre
    got = tcat.read("t")
    assert got.columns == ["k", "g", "val"]
    assert got.agg(F.sum("val")).first()[0] == sum(i * 2.0 for i in range(100))
    # the old name is gone from the logical surface
    assert "v" not in got.columns
    assert tcat.logical_schema("t").fieldNames() == ["k", "g", "val"]


def test_renamed_predicates_still_file_skip(tcat):
    _seed(tcat)  # file A: k<50, file B: k>=50 — v ranges disjoint
    tcat.rename_column("t", "v", "val")
    assert tcat.read("t", predicates=[("val", "<", 20.0)]).count() == 10
    kept, total = tcat.pruned_files("t", [("val", "<", 20.0)])
    assert total == 2 and len(kept) == 1  # physical sidecars still prune
    spark = tcat.spark
    try:
        tcat.spark = None  # metadata-only surfaces answer renamed names
        assert tcat.count_rows("t") == 100
        assert tcat.count_rows("t", [("val", ">=", 0.0)]) == 100
    finally:
        tcat.spark = spark
    assert tcat.min_max("t", "val") == (0.0, 198.0)


def test_writers_accept_logical_names(tcat):
    _seed(tcat)
    tcat.rename_column("t", "v", "val")
    extra = tcat.spark.range(100, 110).select(
        F.col("id").alias("k"),
        F.lit(1).cast("long").alias("g"),
        (F.col("id") * 2.0).alias("val"),
    )
    tcat.append(extra, "t")
    got = tcat.read("t")
    assert got.count() == 110
    assert got.where("k >= 100").agg(F.sum("val")).first()[0] == sum(
        i * 2.0 for i in range(100, 110)
    )
    # DML speaks logical names in both modes
    assert tcat.update_where("t", [("val", "=", 4.0)], {"val": "val * 100"}) == 1
    assert tcat.read("t").where("val = 400.0").count() == 1
    assert tcat.delete_where("t", [("val", ">", 300.0)], mode="dv") == 1
    assert tcat.read("t").count() == 109


def test_rename_collisions_and_guards(tcat):
    _seed(tcat)
    tcat.rename_column("t", "v", "val")
    with pytest.raises(ValueError, match="already in use"):
        tcat.rename_column("t", "val", "k")  # logical collision
    with pytest.raises(ValueError, match="already in use"):
        tcat.rename_column("t", "g", "v")  # physical collision
    with pytest.raises(ValueError, match="no column"):
        tcat.rename_column("t", "v", "w")  # old name already re-labeled
    tcat.add_check("t", "val_ok", "val >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        tcat.rename_column("t", "val", "value")
    with pytest.raises(ValueError, match="CHECK constraint"):
        tcat.drop_column("t", "val")
    # renaming BACK to the physical name erases the map entry
    tcat.rename_column("t", "g", "grp")
    tcat.rename_column("t", "grp", "g")
    assert tcat.colmap("t") == {"renames": {"v": "val"}, "dropped": []}


def test_rename_bucket_key_refused(tcat):
    df = tcat.spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    tcat.overwrite_bucketed(df, "b", 4, ["k"])
    with pytest.raises(ValueError, match="bucket key"):
        tcat.rename_column("b", "k", "pk")
    tcat.rename_column("b", "v", "val")  # non-key columns rename fine
    assert set(tcat.read("b").columns) == {"k", "val", "_kb"}


def test_drop_column_and_name_quarantine(tcat):
    _seed(tcat)
    pre = _inodes(tcat, "t")
    tcat.drop_column("t", "g")
    assert _inodes(tcat, "t") == pre
    assert tcat.read("t").columns == ["k", "v"]
    assert tcat.count_rows("t") == 100
    # the dropped physical name is quarantined: old files still carry
    # values that would leak into a reborn column
    with pytest.raises(ValueError, match="dropped"):
        tcat.add_column("t", "g", "bigint")
    with pytest.raises(ValueError, match="dropped"):
        tcat.append(
            tcat.spark.range(1).select(
                F.col("id").alias("k"),
                (F.col("id") * 1.0).alias("v"),
                F.lit(5).alias("g"),
            ),
            "t",
        )
    with pytest.raises(ValueError, match="was dropped"):
        tcat.read("t", predicates=[("g", "=", 3)])
    # a full rewrite retires the stale values; the name is reusable
    assert tcat.compact("t")
    assert tcat.colmap("t") is None
    tcat.add_column("t", "g", "bigint")
    assert tcat.read("t").columns == ["k", "v", "g"]
    assert tcat.read("t").where("g IS NOT NULL").count() == 0  # no leak


def test_drop_guards(tcat):
    _seed(tcat)
    with pytest.raises(ValueError, match="no column"):
        tcat.drop_column("t", "nope")
    tcat.drop_column("t", "g")
    tcat.drop_column("t", "v")
    with pytest.raises(ValueError, match="last column"):
        tcat.drop_column("t", "k")


def test_checks_enforce_under_logical_names(tcat):
    _seed(tcat)
    tcat.rename_column("t", "v", "val")
    tcat.add_check("t", "val_nonneg", "val >= 0")
    with pytest.raises(CheckViolation):
        tcat.append(
            tcat.spark.range(1).select(
                F.col("id").alias("k"),
                F.col("id").alias("g"),
                F.lit(-1.0).alias("val"),
            ),
            "t",
        )
    with pytest.raises(CheckViolation):
        tcat.update_where("t", [("k", "=", 3)], {"val": "-5.0"})


def test_time_travel_feed_and_branches(tcat, tmp_path):
    _seed(tcat)
    v0 = tcat.versions()[-1]["version"]
    tcat.rename_column("t", "v", "val")
    # history keeps ITS names; the current feed speaks the new ones
    assert tcat.read_at("t", v0).columns == ["k", "g", "v"]
    v1 = tcat.versions()[-1]["version"]
    tcat.delete_where("t", [("val", "=", 6.0)])
    feed = tcat.table_changes("t", v1)
    assert "val" in feed.columns and "v" not in feed.columns
    assert feed.count() == 1
    # clone and whole-catalog restore carry / revert the map
    dst = tcat.clone_to(str(tmp_path / "branch"))
    assert dst.read("t").columns == ["k", "g", "val"]
    tcat.restore(v0)
    assert tcat.read("t").columns == ["k", "g", "v"]
    # per-table restore revives the mapping with the snapshot
    tcat.restore_table("t", v1)
    assert tcat.read("t").columns == ["k", "g", "val"]


def test_sql_facade_rename_drop(tcat):
    from gcp_datalake_pipeline_spark.dml_sql import execute_dml

    _seed(tcat)
    assert execute_dml(tcat, "ALTER TABLE t RENAME COLUMN k TO pk") == {
        "table": "t", "renamed_column": "k", "to": "pk",
    }
    plan = execute_dml(tcat, "EXPLAIN DELETE FROM t WHERE pk < 50")
    assert plan["files_candidates"] == 1  # physical pruning survives
    assert execute_dml(tcat, "DELETE FROM t WHERE pk = 3")["deleted"] == 1
    assert execute_dml(tcat, "ALTER TABLE t DROP COLUMN g") == {
        "table": "t", "dropped_column": "g",
    }
    assert execute_dml(tcat, "UPDATE t SET v = v * 2 WHERE pk = 5")[
        "updated"
    ] == 1
    assert execute_dml(tcat, "INSERT INTO t VALUES (200, 1.5)")[
        "inserted"
    ] == 1
    got = tcat.read("t")
    assert got.columns == ["pk", "v"]
    assert got.count() == 100  # 100 - deleted 1 + inserted 1
    assert got.where("pk = 200").first()["v"] == 1.5


def test_rename_interops_with_deletion_vectors(tcat):
    _seed(tcat)
    assert tcat.delete_where("t", [("v", "=", 6.0)], mode="dv") == 1
    tcat.rename_column("t", "v", "val")
    # vectors key (file, pos) — name changes don't touch them
    assert tcat.read("t").count() == 99
    assert tcat.delete_where("t", [("val", "=", 8.0)], mode="dv") == 1
    assert tcat.count_rows("t") == 98
    assert tcat.compact("t", min_dirs=1)
    assert tcat.dv_info("t") is None
    assert tcat.read("t").count() == 98
    assert tcat.read("t").columns == ["k", "g", "val"]

def test_drop_partition_column_refused(tcat):
    """Dropping a Hive partition column would strand later rewrites
    (partitionBy over a projected-away column) — refused with the
    re-layout exit; renaming one is fine (files keep physical dirs)."""
    df = tcat.spark.range(0, 40).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("p"),
        (F.col("id") * 1.0).alias("v"),
    )
    tcat.overwrite(df, "pt", partition_cols=["p"])
    with pytest.raises(ValueError, match="partition column"):
        tcat.drop_column("pt", "p")
    tcat.rename_column("pt", "p", "part_id")
    assert set(tcat.read("pt").columns) == {"k", "part_id", "v"}
    # cow DML still rewrites faithfully under the renamed partition col
    assert tcat.delete_where("pt", [("part_id", "=", 1)]) == 10
    got = tcat.read("pt")
    assert got.count() == 30 and got.where("part_id = 1").count() == 0
