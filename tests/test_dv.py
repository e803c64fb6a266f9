"""Deletion vectors: merge-on-read DELETE/UPDATE (Delta DV semantics).

The contract under test, per transactions.py's DV section:

- mode="dv" DML rewrites ZERO data files (inode pins) — matched row
  positions land in vector sidecars readers subtract;
- every metadata surface stays exact: count_rows (vector-aware fold),
  min_max (vectored files scan), time travel, change feed, restore;
- copy-on-write DML, bucketed merges, and compact interoperate:
  rewritten files materialize their vectors, carried files keep them,
  compact folds everything and clears the map;
- vector dirs ride vacuum/clone like data dirs.
"""

import os

import pytest
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.transactions import (
    CheckViolation,
    ConcurrentWriteError,
    TransactionalCatalog,
)


@pytest.fixture()
def tcat(spark, tmp_path):
    return TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))


def _seed(tcat, n=100, files=2):
    df = tcat.spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("g"),
        (F.col("id") * 2.0).alias("v"),
    )
    half = n // files
    for i in range(files):
        with tcat.transaction(f"seed-{i}"):
            tcat.append(
                df.where(
                    (F.col("k") >= i * half) & (F.col("k") < (i + 1) * half)
                ).coalesce(1),
                "t",
            )
    return df


def _inodes(tcat, table):
    return {
        os.stat(os.path.join(d, f)).st_ino
        for d in tcat._data_dirs(table)
        for f in tcat._dir_parquet_files(d)
    }


def test_dv_delete_rewrites_nothing_and_reads_right(tcat):
    _seed(tcat)
    pre = _inodes(tcat, "t")
    n = tcat.delete_where("t", [("g", "=", 3)], mode="dv")
    assert n == 10
    assert _inodes(tcat, "t") == pre  # zero data files touched
    got = tcat.read("t")
    assert got.count() == 90
    assert got.where("g = 3").count() == 0
    # predicate reads (the pruned path) subtract vectors too
    assert tcat.read("t", predicates=[("g", "=", 3)]).count() == 0
    assert tcat.read("t", predicates=[("k", "<", 50)]).count() == 45
    assert tcat.dv_count("t") == 10


def test_dv_metadata_count_is_zero_io(tcat):
    _seed(tcat)
    tcat.delete_where("t", [("g", "=", 3)], mode="dv")
    spark = tcat.spark
    try:
        tcat.spark = None  # any scan would AttributeError
        assert tcat.count_rows("t") == 90
        # all-match predicate: live matches = rows - n_deleted, still
        # provable from the sidecar + vector map alone
        assert tcat.count_rows("t", [("k", ">=", 0)]) == 90
    finally:
        tcat.spark = spark
    # undecidable predicates scan WITH the vectors applied
    assert tcat.count_rows("t", [("g", "!=", 3)]) == 90
    assert tcat.count_rows("t", [("g", "=", 3)]) == 0


def test_dv_min_max_excludes_deleted_extreme(tcat):
    _seed(tcat)
    tcat.delete_where("t", [("k", ">=", 98)], mode="dv")
    assert tcat.min_max("t", "k") == (0, 97)
    # the untouched file still answers from metadata; only the
    # vectored file scans — both sides agree with a full recompute
    mn, mx = tcat.min_max("t", "v")
    assert (mn, mx) == (0.0, 97 * 2.0)


def test_dv_redelete_is_noop_without_a_version(tcat):
    _seed(tcat)
    tcat.delete_where("t", [("g", "=", 3)], mode="dv")
    v = tcat.versions()[-1]["version"]
    assert tcat.delete_where("t", [("g", "=", 3)], mode="dv") == 0
    assert tcat.versions()[-1]["version"] == v  # nothing published


def test_dv_update_appends_images_only(tcat):
    _seed(tcat)
    pre = _inodes(tcat, "t")
    n = tcat.update_where("t", [("g", "=", 4)], {"v": "v + 1000"}, mode="dv")
    assert n == 10
    assert pre <= _inodes(tcat, "t")  # originals intact, images appended
    got = tcat.read("t")
    assert got.count() == 100
    vals = sorted(r["v"] for r in got.where("g = 4").collect())
    assert vals == sorted(k * 2.0 + 1000 for k in range(4, 100, 10))
    assert tcat.count_rows("t") == 100


def test_dv_update_refuses_lossy_cast(tcat):
    _seed(tcat)
    with pytest.raises(ValueError, match="does not cast"):
        tcat.update_where("t", [("g", "=", 4)], {"v": "'oops'"}, mode="dv")
    assert tcat.dv_count("t") == 0  # nothing published


def test_dv_update_enforces_checks_on_images(tcat):
    _seed(tcat)
    tcat.add_check("t", "v_nonneg", "v >= 0")
    with pytest.raises(CheckViolation):
        tcat.update_where("t", [("g", "=", 4)], {"v": "-1.0"}, mode="dv")
    assert tcat.read("t").where("v < 0").count() == 0
    assert tcat.dv_count("t") == 0


def test_cow_dml_interop_no_resurrection(tcat):
    """Copy-on-write DML on a vectored table: the rewrite subtracts the
    vectors (no deleted row resurrects), rewritten files' vector
    entries retire, carried files keep theirs."""
    _seed(tcat)  # file A: k<50, file B: k>=50
    tcat.delete_where("t", [("g", "=", 3)], mode="dv")  # 5 rows per file
    # cow-delete one row in file B only: A carries with its vector
    n = tcat.delete_where("t", [("k", "=", 60)])
    assert n == 1
    got = tcat.read("t")
    assert got.count() == 89
    assert got.where("g = 3").count() == 0  # B's rewrite materialized
    info = tcat.dv_info("t")
    assert info is not None and sum(info["files"].values()) == 5  # A only
    assert tcat.count_rows("t") == 89


def test_compact_folds_vectors(tcat):
    _seed(tcat)
    tcat.delete_where("t", [("g", "=", 3)], mode="dv")
    tcat.update_where("t", [("g", "=", 4)], {"v": "0.0"}, mode="dv")
    assert tcat.compact("t", min_dirs=2)
    assert tcat.dv_info("t") is None
    got = tcat.read("t")
    assert got.count() == 90
    assert got.where("g = 4").agg(F.sum("v")).first()[0] == 0.0
    # a single-dir table with pending vectors still forces the fold
    tcat.delete_where("t", [("g", "=", 5)], mode="dv")
    assert tcat.compact("t")  # min_dirs=2 default, 1 dir — dv forces
    assert tcat.dv_info("t") is None
    assert tcat.read("t").count() == 80


def test_time_travel_and_restore(tcat):
    _seed(tcat)
    v0 = tcat.versions()[-1]["version"]
    tcat.delete_where("t", [("g", "=", 3)], mode="dv")
    v1 = tcat.versions()[-1]["version"]
    assert tcat.read_at("t", v0).count() == 100
    assert tcat.read_at("t", v1).count() == 90
    tcat.restore_table("t", v0)
    assert tcat.read("t").count() == 100  # vectors cleared with restore
    assert tcat.dv_info("t") is None
    tcat.restore_table("t", v1)
    assert tcat.read("t").count() == 90  # ...and return with their state
    assert tcat.dv_count("t") == 10


def test_table_changes_sees_vector_dml(tcat):
    _seed(tcat)
    v0 = tcat.versions()[-1]["version"]
    tcat.delete_where("t", [("g", "=", 3)], mode="dv")
    v1 = tcat.versions()[-1]["version"]
    feed = tcat.table_changes("t", v0, v1)
    by = {r["_change_type"]: r["n"] for r in
          feed.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
    assert by == {"delete": 10}
    assert {r["g"] for r in feed.collect()} == {3}
    # dv update = delete+insert pair; keyed feed relabels to update pre/post
    tcat.update_where("t", [("g", "=", 4)], {"v": "v + 1"}, mode="dv")
    v2 = tcat.versions()[-1]["version"]
    feed2 = tcat.table_changes("t", v1, v2, key_cols=["k"])
    by2 = {r["_change_type"]: r["n"] for r in
           feed2.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
    assert by2 == {"update_preimage": 10, "update_postimage": 10}
    # source_moved: a vector-only commit counts as movement (O(1) map)
    assert tcat.source_moved("t", v0, v1) is True
    assert tcat.source_moved("t", v1, v1) is False


def test_identity_update_cancels_in_feed(tcat):
    """SET x = x via vectors nets to an empty feed, matching the
    copy-on-write convention (delete+insert of identical rows cancel)."""
    _seed(tcat)
    v0 = tcat.versions()[-1]["version"]
    tcat.update_where("t", [("g", "=", 4)], {"v": "v"}, mode="dv")
    v1 = tcat.versions()[-1]["version"]
    assert tcat.table_changes("t", v0, v1).count() == 0


def test_vacuum_and_clone_carry_vectors(tcat, tmp_path):
    _seed(tcat)
    tcat.delete_where("t", [("g", "=", 3)], mode="dv")
    info = tcat.dv_info("t")
    # referenced vector dirs survive an aggressive vacuum
    tcat.vacuum(retain_versions=1, min_age_seconds=0.0)
    assert tcat.read("t").count() == 90
    assert tcat.dv_info("t") == info
    # clones carry the vector state (basename identity survives links)
    dst = tcat.clone_to(str(tmp_path / "branch"))
    assert dst.read("t").count() == 90
    assert dst.dv_count("t") == 10
    # the branch folds independently; the source keeps its vectors
    dst.compact("t", min_dirs=1)
    assert dst.dv_info("t") is None
    assert tcat.dv_count("t") == 10
    # after the source compacts too, the orphaned vector dirs reclaim
    tcat.compact("t", min_dirs=1)
    removed = tcat.vacuum(retain_versions=1, min_age_seconds=0.0)
    assert any(r in {d for d in info["dirs"]} for r in removed)


def test_stale_vector_commit_conflicts(tcat):
    """A vector computed against a superseded snapshot must conflict:
    its basenames may reference rewritten-away files and its anti-join
    base is stale (double-count risk)."""
    _seed(tcat)
    snapshot = tcat._committed_rels("t")
    tcat.delete_where("t", [("g", "=", 3)], mode="dv")  # moves dv dirs
    with pytest.raises(ConcurrentWriteError):
        tcat._publish(
            {
                "t": {
                    "mode": "dv",
                    "dv_add": {
                        "dir": "_loads/stale/t.0",
                        "files": {"nope.parquet": 1},
                        "expect_tables": snapshot,
                        "expect_dirs": [],  # stale: a vector landed since
                    },
                }
            },
            "stale-dv",
            replace=False,
        )


def test_dv_on_bucketed_table_keeps_layout(tcat):
    """Vector DML on a _kb hive-partitioned table: the update's images
    append WITH the partition layout, and a later bucketed merge still
    sees one coherent table."""
    df = tcat.spark.range(0, 80).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    tcat.overwrite_bucketed(df, "b", 4, ["k"])
    n = tcat.delete_where("b", [("k", "<", 10)], mode="dv")
    assert n == 10
    assert tcat.read("b").count() == 70
    nu = tcat.update_where("b", [("k", ">=", 70)], {"v": "v * -1"}, mode="dv")
    assert nu == 10
    # the appended images dir kept the _kb= layout on disk
    dirs = tcat._data_dirs("b")
    assert len(dirs) == 2
    assert all(
        any(seg.startswith("_kb=") for seg in f.split(os.sep))
        for d in dirs
        for f in tcat._dir_parquet_files(d)
    )
    got = tcat.read("b")
    assert got.count() == 70
    assert got.where("v < 0").count() == 10
    assert "_kb" in got.columns

def test_tblproperties_route_sql_dml_through_vectors(tcat):
    """dml.mode = merge-on-read makes the SQL façade's DELETE/UPDATE
    vector-based (zero files rewritten) until UNSET returns the
    copy-on-write default; unknown keys/values refuse loudly."""
    from gcp_datalake_pipeline_spark.dml_sql import execute_dml

    _seed(tcat)
    with pytest.raises(ValueError, match="unknown table property"):
        tcat.set_table_property("t", "nope", "x")
    with pytest.raises(ValueError, match="takes"):
        tcat.set_table_property("t", "dml.mode", "warp-speed")
    r = execute_dml(
        tcat, "ALTER TABLE t SET TBLPROPERTIES ('dml.mode' = 'merge-on-read')"
    )
    assert r == {"table": "t", "set_property": "dml.mode",
                 "value": "merge-on-read"}
    pre = _inodes(tcat, "t")
    plan = execute_dml(tcat, "EXPLAIN DELETE FROM t WHERE g = 3")
    assert plan["mode"] == "dv"
    assert execute_dml(tcat, "DELETE FROM t WHERE g = 3") == {
        "table": "t", "deleted": 10, "mode": "dv",
    }
    assert pre == _inodes(tcat, "t")  # no data file rewritten
    assert execute_dml(tcat, "UPDATE t SET v = v + 1 WHERE g = 4")[
        "mode"
    ] == "dv"
    assert pre <= _inodes(tcat, "t")  # originals intact, images appended
    assert tcat.dv_count("t") == 20
    # UNSET restores copy-on-write; property rides describe/clone paths
    execute_dml(tcat, "ALTER TABLE t UNSET TBLPROPERTIES ('dml.mode')")
    assert tcat.table_properties("t") == {}
    # back to copy-on-write: the default result stays terse (no mode key)
    assert execute_dml(tcat, "DELETE FROM t WHERE g = 5") == {
        "table": "t", "deleted": 10,
    }
    assert tcat.read("t").count() == 80
    with pytest.raises(KeyError):
        tcat.unset_table_property("t", "dml.mode")
