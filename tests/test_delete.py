"""Row-level DELETE: stats-pruned candidate rewrite, hardlink carry of
untouched files, SQL NULL semantics, partition-layout preservation,
no-op metadata decisions, time travel, and conflict detection."""

import os

import pytest
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.transactions import (
    ConcurrentWriteError,
    TransactionalCatalog,
)


def _striped(spark, root, stripes=5, rows=1000):
    """One append per value-stripe of k — every file min/max-tight on k."""
    cat = TransactionalCatalog(spark=spark, root=root)
    df = spark.range(rows).select(
        F.col("id"), (F.col("id") % stripes).alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    for s in range(stripes):
        cat.append(df.where(F.col("k") == s).coalesce(1), "t")
    return cat, df


def _inodes(cat, table):
    return {
        os.stat(os.path.join(d, f)).st_ino
        for d in cat._data_dirs(table)
        for f in cat._dir_parquet_files(d)
    }


def test_delete_rewrites_only_candidate_files(spark, tmp_path):
    """Deleting one stripe rewrites that stripe's file only: every other
    file survives by HARDLINK (same inode), values equal a plain
    anti-filter, and the pre-delete snapshot time-travels intact."""
    cat, df = _striped(spark, str(tmp_path / "lake"))
    pre = _inodes(cat, "t")
    v_before = cat.versions()[-1]["version"]
    n_all = cat.read("t").count()

    deleted = cat.delete_where("t", [("k", "=", 2)])
    assert deleted == df.where(F.col("k") == 2).count()
    got = sorted(tuple(r) for r in cat.read("t").collect())
    want = sorted(tuple(r) for r in df.where(F.col("k") != 2).collect())
    assert got == want
    # 4 of 5 data files carried by hardlink, none re-written
    carried = _inodes(cat, "t") & pre
    assert len(carried) == 4
    # the old snapshot still holds every row
    assert cat.read_at("t", v_before).count() == n_all


def test_delete_no_match_is_metadata_only(spark, tmp_path):
    """A delete the stats PROVE matches nothing returns 0 without
    publishing a new version — a pure metadata decision."""
    cat, _df = _striped(spark, str(tmp_path / "lake"))
    v = cat.versions()[-1]["version"]
    assert cat.delete_where("t", [("v", "<", -1)]) == 0
    assert cat.versions()[-1]["version"] == v


def test_delete_null_predicate_keeps_row(spark, tmp_path):
    """SQL DELETE WHERE: a NULL predicate result KEEPS the row; only
    TRUE deletes. is_null deletes the nulls themselves."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    df = spark.sql(
        "SELECT * FROM VALUES (1, 10.0), (2, CAST(NULL AS DOUBLE)),"
        " (3, -1.0) AS t(id, v)"
    )
    cat.append(df, "t")
    assert cat.delete_where("t", [("v", "<", 0.0)]) == 1
    assert {r["id"] for r in cat.read("t").collect()} == {1, 2}
    assert cat.delete_where("t", [("v", "is_null")]) == 1
    assert {r["id"] for r in cat.read("t").collect()} == {1}


def test_delete_preserves_partition_layout(spark, tmp_path):
    """Deleting from a hive-partitioned table keeps the partition dirs:
    the rewritten rows land under their partitions and partition-pruned
    predicates still engage afterwards."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    df = spark.range(400).select(
        F.col("id"), (F.col("id") % 4).alias("p"), F.col("id").alias("v")
    )
    cat.overwrite(df, "t", partition_cols=["p"])
    deleted = cat.delete_where("t", [("p", "=", 1), ("v", "<", 100)])
    assert deleted == df.where((F.col("p") == 1) & (F.col("v") < 100)).count()
    got = cat.read("t")
    assert "p" in got.columns
    assert got.count() == 400 - deleted
    kept, total = cat.pruned_files("t", [("p", "=", 3)])
    assert kept and len(kept) < total


def test_delete_conflicts_with_racing_append(spark, tmp_path):
    """An append landing between the delete's snapshot and its commit
    raises ConcurrentWriteError — the late rows are never silently
    replaced away."""
    root = str(tmp_path / "lake")
    cat, _df = _striped(spark, root, stripes=3, rows=90)
    b = TransactionalCatalog(spark=spark, root=root)
    orig = TransactionalCatalog.transaction
    raced = {"done": False}

    from contextlib import contextmanager

    @contextmanager
    def racing(self, load_id=None):
        if self is cat and not raced["done"]:
            raced["done"] = True
            b.append(
                spark.createDataFrame([(9999, 0, 9999)], "id long, k long, v long"),
                "t",
            )
        with orig(self, load_id):
            yield self

    TransactionalCatalog.transaction = racing
    try:
        with pytest.raises(ConcurrentWriteError):
            cat.delete_where("t", [("k", "=", 1)])
    finally:
        TransactionalCatalog.transaction = orig
    reader = TransactionalCatalog(spark=spark, root=root)
    assert reader.read("t").filter(F.col("id") == 9999).count() == 1


def test_delete_joins_open_transaction(spark, tmp_path):
    """A copy-on-write DELETE inside an open transaction JOINS it (one
    atomic commit with the other writes; rollback discards both) — but
    refuses on a table the transaction has already staged writes to
    (the rewrite anchors to the committed snapshot and would silently
    drop them)."""
    cat, df = _striped(spark, str(tmp_path / "lake"), stripes=2, rows=20)
    v0 = cat._read_manifest(strict=False)["version"]
    with cat.transaction("x"):
        n = cat.delete_where("t", [("k", "=", 0)])
        assert n > 0
        cat.append(
            spark.createDataFrame([(990, 7, 1)], "id long, k long, v long"),
            "u",
        )
    assert cat._read_manifest(strict=False)["version"] == v0 + 1
    assert cat.read("t").where(F.col("k") == 0).count() == 0
    assert cat.read("u").count() == 1
    # rollback discards the joined delete too
    n_before = cat.read("t").count()
    try:
        with cat.transaction("y"):
            assert cat.delete_where("t", [("k", "=", 1)]) > 0
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert cat.read("t").count() == n_before
    # same-table re-staging refuses
    with cat.transaction("z"):
        cat.append(
            spark.createDataFrame([(991, 0, 1)], "id long, k long, v long"),
            "t",
        )
        with pytest.raises(RuntimeError, match="already staged"):
            cat.delete_where("t", [("k", "=", 1)])
        # the failed DML must not have poisoned the open txn
        cat.append(
            spark.createDataFrame([(992, 0, 1)], "id long, k long, v long"),
            "u",
        )


# -- row-level UPDATE (same rewrite machinery) ------------------------------


def test_update_rewrites_only_candidate_files(spark, tmp_path):
    """UPDATE ... SET ... WHERE: matched rows transform, unmatched rows
    and non-candidate FILES pass through (hardlink carry), values equal
    the plain CASE WHEN, count = matched rows."""
    cat, df = _striped(spark, str(tmp_path / "lake"))
    pre = _inodes(cat, "t")
    n = cat.update_where("t", [("k", "=", 2)], {"v": "v + 1000000"})
    assert n == df.where(F.col("k") == 2).count()
    got = sorted(tuple(r) for r in cat.read("t").collect())
    want = sorted(
        tuple(r)
        for r in df.withColumn(
            "v",
            F.when(F.col("k") == 2, F.col("v") + 1000000).otherwise(
                F.col("v")
            ),
        ).collect()
    )
    assert got == want
    assert len(_inodes(cat, "t") & pre) == 4  # carry engaged


def test_update_no_match_and_unknown_column(spark, tmp_path):
    cat, _df = _striped(spark, str(tmp_path / "lake"), stripes=2, rows=20)
    v = cat.versions()[-1]["version"]
    assert cat.update_where("t", [("v", "<", -1)], {"v": "0"}) == 0
    assert cat.versions()[-1]["version"] == v
    with pytest.raises(ValueError, match="unknown column"):
        cat.update_where("t", [("k", "=", 0)], {"nope": "1"})


def test_update_respects_check_constraints(spark, tmp_path):
    """An UPDATE that would write violating rows dies before the
    pointer swap — the staged rewrite is check-validated."""
    from gcp_datalake_pipeline_spark.transactions import CheckViolation

    cat, _df = _striped(spark, str(tmp_path / "lake"), stripes=2, rows=20)
    cat.add_check("t", "v_nonneg", "v >= 0")
    n_rows = cat.read("t").count()
    with pytest.raises(CheckViolation, match="v_nonneg"):
        cat.update_where("t", [("k", "=", 1)], {"v": "-1"})
    assert cat.read("t").count() == n_rows
    assert cat.read("t").filter(F.col("v") < 0).count() == 0


# -- RESTORE (time-travel rollback) ------------------------------------------


def test_restore_undoes_a_delete_and_is_itself_versioned(spark, tmp_path):
    """restore_table makes the pre-delete snapshot current again as a
    NEW commit — rows come back, the delete version stays readable,
    restore-of-restore works, and schema evolution rides along."""
    cat, df = _striped(spark, str(tmp_path / "lake"), stripes=3, rows=300)
    v_full = cat.versions()[-1]["version"]
    n_all = cat.read("t").count()
    deleted = cat.delete_where("t", [("k", "=", 1)])
    v_deleted = cat.versions()[-1]["version"]
    assert cat.read("t").count() == n_all - deleted

    cat.restore_table("t", v_full)
    assert cat.read("t").count() == n_all
    assert cat.versions()[-1]["version"] > v_deleted  # new commit
    # the deleted state is still time-travelable — restore rewrites
    # nothing
    assert cat.read_at("t", v_deleted).count() == n_all - deleted
    # restore the deleted state back (restore of a restore)
    cat.restore_table("t", v_deleted)
    assert cat.read("t").count() == n_all - deleted

    # vacuumed target fails cleanly
    import pytest

    cat.restore_table("t", v_full)
    cat.vacuum(retain_versions=1, min_age_seconds=0)
    with pytest.raises(FileNotFoundError):
        cat.restore_table("t", v_deleted)
    with cat.transaction("x"):
        with pytest.raises(RuntimeError, match="inside an open transaction"):
            cat.restore_table("t", v_full)
        cat.append(
            spark.createDataFrame([(1, 0, 1)], "id long, k long, v long"),
            "t",
        )


def test_vacuum_after_dml_keeps_hardlinked_files_alive(spark, tmp_path):
    """delete_where carries untouched files into the new snapshot by
    hardlink; vacuuming the OLD version unlinks the original paths but
    the shared inodes keep the data alive — the current table reads
    identically after an aggressive vacuum."""
    cat, df = _striped(spark, str(tmp_path / "lake"))
    deleted = cat.delete_where("t", [("k", "=", 0)])
    assert deleted > 0
    want = sorted(tuple(r) for r in df.where(F.col("k") != 0).collect())
    removed = cat.vacuum(retain_versions=1, min_age_seconds=0)
    assert removed  # the pre-delete dirs were reclaimed
    got = sorted(tuple(r) for r in cat.read("t").collect())
    assert got == want
    # stats sidecar survived with the stage: pruning still engages
    kept, total = cat.pruned_files("t", [("k", "=", 2)])
    assert kept and len(kept) < total


def test_update_refuses_silent_null_casts(spark, tmp_path):
    """Review fix: a SET expression whose value does not cast to the
    column's type must raise, never silently NULL the matched rows."""
    cat, _df = _striped(spark, str(tmp_path / "lake"), stripes=2, rows=20)
    with pytest.raises(ValueError, match="does not cast"):
        cat.update_where("t", [("k", "=", 1)], {"v": "'not a number'"})
    assert cat.read("t").filter(F.col("v").isNull()).count() == 0


def test_restore_validates_current_checks(spark, tmp_path):
    """Review fix: restoring a snapshot that predates a CHECK must not
    silently reintroduce violating rows."""
    from gcp_datalake_pipeline_spark.transactions import CheckViolation

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    df = spark.range(10).select(F.col("id"), (F.col("id") - 5).alias("v"))
    cat.append(df, "t")
    v_dirty = cat.versions()[-1]["version"]
    cat.delete_where("t", [("v", "<", 0)])
    cat.add_check("t", "v_nonneg", "v >= 0")
    with pytest.raises(CheckViolation, match="reintroduce"):
        cat.restore_table("t", v_dirty)
    # explicit opt-out keeps the metadata-only fast path available
    cat.restore_table("t", v_dirty, validate_checks=False)
    assert cat.read("t").count() == 10


def test_dml_refuses_mixed_partition_layouts(spark, tmp_path):
    """Review fix: a table whose data dirs disagree on hive layout
    cannot be rewritten faithfully — DML refuses instead of silently
    flattening part of it."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    df = spark.range(40).select(
        F.col("id"), (F.col("id") % 2).alias("p"), F.col("id").alias("v")
    )
    cat.append(df, "t", partition_cols=["p"])
    cat.append(df.withColumn("id", F.col("id") + 100), "t")  # flat dir
    with pytest.raises(ValueError, match="mixes partition layouts"):
        cat.delete_where("t", [("v", "<", 10)])
