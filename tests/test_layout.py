"""Persisted clustering layouts (r9 verdict #2 / 'What's wrong #4').

Contract under test:

- ``compact(zorder_by=...)`` / ``compact(cluster_by=...)`` RECORD the
  spec in the manifest; ``layout(table)`` reads it back;
- a row-level DELETE re-sorts its rewritten candidate slice by the
  recorded spec, so a selective predicate skips files at (about) the
  pre-delete rate instead of quietly degrading;
- a plain ``compact()`` re-applies the recorded layout instead of
  destroying it;
- the record rides whole-catalog RESTORE, per-table restore, clones,
  and the versioned manifests (time travel).
"""

import pytest
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog


@pytest.fixture()
def zcat(spark, tmp_path):
    """A z-ordered lake: 8k rows over two clustered dims (x, y) plus an
    everywhere-spread w column, compacted into many small files."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    df = spark.range(8000).select(
        F.col("id"),
        (F.col("id") % 97).alias("x"),
        ((F.col("id") * 7) % 89).alias("y"),
        (F.col("id") % 50).alias("w"),
    )
    for s in range(4):
        cat.append(df.where(F.col("id") % 4 == s).coalesce(1), "t")
    assert cat.compact(
        "t", target_file_bytes=8 * 1024, zorder_by=["x", "y"], zorder_bits=4
    )
    return cat


def _rate(cat, table, preds):
    kept, total = cat.pruned_files(table, preds)
    return len(kept), total


def test_compact_records_layout_and_prunes(zcat):
    assert zcat.layout("t") == {"kind": "zorder", "cols": ["x", "y"], "bits": 4}
    for col in ("x", "y"):
        kept, total = _rate(zcat, "t", [(col, "<", 10)])
        assert total > 4 and 0 < kept < total


def test_delete_reapplies_layout_and_skip_rate_survives(zcat):
    kept0, total0 = _rate(zcat, "t", [("x", "<", 10)])
    # w is spread through every file: EVERY file is a delete candidate,
    # so without layout re-application the whole table would rewrite
    # unsorted and the x predicate would stop skipping anything
    deleted = zcat.delete_where("t", [("w", "=", 7)])
    assert deleted == 160
    kept1, total1 = _rate(zcat, "t", [("x", "<", 10)])
    # an UNSORTED rewrite keeps every file (each spans the full x range);
    # the margin absorbs one file of boundary slack from the slice-local
    # re-quantiling of the rewrite
    assert kept1 < total1  # still skipping
    assert kept1 / total1 <= kept0 / total0 + 0.35
    # values unharmed
    assert zcat.read("t").filter(F.col("w") == 7).count() == 0
    assert zcat.count_rows("t") == 8000 - 160


def test_update_reapplies_layout(zcat):
    kept0, total0 = _rate(zcat, "t", [("y", "<", 10)])
    updated = zcat.update_where("t", [("w", "=", 3)], {"id": "id + 1000000"})
    assert updated == 160
    kept1, total1 = _rate(zcat, "t", [("y", "<", 10)])
    assert kept1 < total1
    assert kept1 / total1 <= kept0 / total0 + 0.35


def test_plain_compact_reapplies_recorded_layout(zcat):
    spark = zcat.spark
    extra = spark.range(8000, 10000).select(
        F.col("id"),
        (F.col("id") % 97).alias("x"),
        ((F.col("id") * 7) % 89).alias("y"),
        (F.col("id") % 50).alias("w"),
    )
    zcat.append(extra.coalesce(1), "t")  # one unsorted dir on top
    assert zcat.compact("t", target_file_bytes=8 * 1024)  # NO spec args
    assert zcat.layout("t") == {"kind": "zorder", "cols": ["x", "y"], "bits": 4}
    kept, total = _rate(zcat, "t", [("x", "<", 10)])
    assert total > 4 and 0 < kept < total
    # an already-compact clustered table is left alone (no forced rewrite)
    assert zcat.compact("t", target_file_bytes=1024 * 1024 * 1024) is False


def test_layout_survives_restore_clone_and_table_restore(zcat, tmp_path):
    v_clustered = zcat.versions()[-1]["version"]
    spec = zcat.layout("t")
    # whole-catalog restore to the pre-compact snapshot clears the record
    zcat.restore(v_clustered - 1)
    assert zcat.layout("t") is None
    # ... and restoring forward brings it back
    zcat.restore(v_clustered)
    assert zcat.layout("t") == spec
    # clones carry the record
    dst = zcat.clone_to(str(tmp_path / "branch"))
    assert dst.layout("t") == spec
    # per-table restore to a pre-layout snapshot clears it; forward again
    zcat.restore_table("t", v_clustered - 1)
    assert zcat.layout("t") is None
    zcat.restore_table("t", v_clustered)
    assert zcat.layout("t") == spec
    # the versioned manifests carry the record (time-travel visibility)
    assert zcat._version_manifest(v_clustered)["layouts"]["t"] == spec


def test_cluster_by_layout_recorded_and_reapplied(spark, tmp_path):
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    df = spark.range(4000).select(
        F.col("id"), (F.col("id") % 61).alias("x"), (F.col("id") % 50).alias("w")
    )
    for s in range(2):
        cat.append(df.where(F.col("id") % 2 == s).coalesce(1), "c")
    assert cat.compact("c", target_file_bytes=8 * 1024, cluster_by=["x"])
    assert cat.layout("c") == {"kind": "cluster", "cols": ["x"]}
    kept0, total0 = cat.pruned_files("c", [("x", "<", 6)])
    assert 0 < len(kept0) < total0
    cat.delete_where("c", [("w", "=", 7)])
    kept1, total1 = cat.pruned_files("c", [("x", "<", 6)])
    assert 0 < len(kept1) < total1
    assert len(kept1) / total1 <= len(kept0) / total0 + 0.35


def test_layout_with_dropped_column_is_conservative(zcat):
    """A spec referencing a column the rewrite no longer carries must
    pass through unsorted, never fail the DML."""
    # simulate schema drift by recording a layout with a ghost column
    zcat._publish_meta(
        lambda m: m.setdefault("layouts", {}).__setitem__(
            "t", {"kind": "zorder", "cols": ["ghost"], "bits": 4}
        ),
        "force-ghost-layout",
    )
    deleted = zcat.delete_where("t", [("w", "=", 9)])
    assert deleted == 160
    assert zcat.read("t").filter(F.col("w") == 9).count() == 0
