"""Online bucket-count evolution (``recluster`` / ``ALTER TABLE ...
CLUSTERED BY (k) INTO m BUCKETS`` on a live table).

Contract under test:

- VALUE INVARIANCE: rows are identical before and after every strategy
  (fold / split / reshuffle / re-key), and every file lands in the
  bucket its keys hash to under the NEW modulus;
- fold (new count divides old, same keys) moves files by HARDLINK:
  every data inode survives (pin), no Spark job rewrites rows, and the
  change feed across the commit is EMPTY — consumers resume for free;
- split/reshuffle rewrite files, and the resulting full delete+insert
  feed NETS TO ZERO for signed-partial consumers: a matview refresh
  across the recluster converges to the same values, and its watermark
  advances past the commit;
- partition-pruned reads keep working under the new modulus (bucketed
  merge-delete after a recluster touches only the right buckets);
- old versions stay time-travelable under their OLD layout;
- refusals: re-keying a matview's layout, reclustering inside an open
  transaction, unknown key columns.
"""

import os

import pytest
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.storage import kb_col
from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog


@pytest.fixture()
def tcat(spark, tmp_path):
    return TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))


def _fact(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 32).alias("g"),
        (F.col("id") * 1.5).alias("amt"),
    )


def _rows(tcat, table="fact"):
    df = tcat.read(table)
    if "_kb" in df.columns:
        df = df.drop("_kb")
    return sorted(map(tuple, df.collect()))


def _inodes(tcat, table="fact"):
    d = tcat._data_dirs(table)[0]
    out = set()
    for root, _dirs, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                out.add(os.stat(os.path.join(root, f)).st_ino)
    return out


def _placement_ok(tcat, table, keys, nb):
    """Every row's dir bucket equals the placement hash of its keys."""
    df = tcat.read(table)
    bad = df.where(
        F.col("_kb") != kb_col(keys, nb)
    ).count()
    assert bad == 0, f"{bad} rows in the wrong bucket for modulus {nb}"


def test_fold_is_pure_hardlink_and_feed_is_empty(spark, tcat):
    tcat.overwrite_bucketed(_fact(spark, 0, 400), "fact", 8, ["k"])
    before_rows = _rows(tcat)
    before_inodes = _inodes(tcat)
    v0 = tcat._read_manifest(strict=False)["version"]
    out = tcat.recluster("fact", 4)
    assert out["strategy"] == "fold"
    assert tcat.bucket_meta("fact") == {
        "num_buckets": 4, "key_cols": ["k"],
    }
    assert _rows(tcat) == before_rows
    # zero rows rewritten: the new version references the SAME inodes
    assert _inodes(tcat) == before_inodes
    _placement_ok(tcat, "fact", ["k"], 4)
    # the inode-diff change feed sees nothing across the commit
    v1 = tcat._read_manifest(strict=False)["version"]
    assert tcat.table_changes("fact", v0, v1).count() == 0
    # old snapshot still reads under its old layout
    assert (
        sorted(
            map(tuple, tcat.read_at("fact", v0).drop("_kb").collect())
        )
        == before_rows
    )


def test_fold_covers_appended_dirs(spark, tcat):
    """A bucketed table grown by bucketed-merge appends (multiple
    committed dirs) folds every dir's files; name collisions across
    source buckets and dirs are rename-proofed."""
    tcat.overwrite_bucketed(_fact(spark, 0, 200), "fact", 8, ["k"])
    src = _fact(spark, 200, 300).withColumn("_kb", kb_col(["k"], 8))
    tcat._write_bucketed_merge(src, "fact")
    before = _rows(tcat)
    out = tcat.recluster("fact", 2)
    assert out["strategy"] == "fold"
    assert _rows(tcat) == before
    _placement_ok(tcat, "fact", ["k"], 2)


def test_split_is_value_invariant_and_places_correctly(spark, tcat):
    tcat.overwrite_bucketed(_fact(spark, 0, 400), "fact", 4, ["k"])
    before = _rows(tcat)
    out = tcat.recluster("fact", 16)
    assert out["strategy"] == "split"
    assert _rows(tcat) == before
    assert tcat.bucket_meta("fact")["num_buckets"] == 16
    _placement_ok(tcat, "fact", ["k"], 16)


def test_reshuffle_rekey_and_nonmultiple(spark, tcat):
    tcat.overwrite_bucketed(_fact(spark, 0, 400), "fact", 8, ["k"])
    before = _rows(tcat)
    # non-multiple count
    out = tcat.recluster("fact", 6)
    assert out["strategy"] == "reshuffle"
    assert _rows(tcat) == before
    _placement_ok(tcat, "fact", ["k"], 6)
    # key change
    out = tcat.recluster("fact", 8, key_cols=["g"])
    assert out["strategy"] == "reshuffle"
    assert _rows(tcat) == before
    assert tcat.bucket_meta("fact") == {
        "num_buckets": 8, "key_cols": ["g"],
    }
    _placement_ok(tcat, "fact", ["g"], 8)


def test_noop_and_refusals(spark, tcat):
    tcat.overwrite_bucketed(_fact(spark, 0, 40), "fact", 8, ["k"])
    assert tcat.recluster("fact", 8)["strategy"] == "noop"
    with pytest.raises(ValueError, match="not in"):
        tcat.recluster("fact", 4, key_cols=["nope"])
    with pytest.raises(FileNotFoundError):
        tcat.recluster("ghost", 4, key_cols=["k"])
    tcat.overwrite(_fact(spark, 0, 10), "plain")
    with pytest.raises(ValueError, match="key_cols"):
        tcat.recluster("plain", 4)
    # initial clustering of an unbucketed table works (reshuffle)
    out = tcat.recluster("plain", 4, key_cols=["k"])
    assert out["strategy"] == "reshuffle"
    _placement_ok(tcat, "plain", ["k"], 4)


def test_fold_with_pending_vectors_takes_rewrite(spark, tcat):
    """Deletion vectors key on FILE NAMES; the fold's renamed hardlinks
    would orphan them, so a vectored table takes the rewrite path and
    the vectors fold away."""
    tcat.overwrite_bucketed(_fact(spark, 0, 100), "fact", 8, ["k"])
    tcat.delete_where("fact", [("k", "<", 10)], mode="dv")
    assert tcat.dv_count("fact") > 0
    out = tcat.recluster("fact", 4)
    assert out["strategy"] != "fold"
    assert tcat.dv_count("fact") == 0  # materialized by the rewrite
    got = {r["k"] for r in tcat.read("fact").select("k").collect()}
    assert got == set(range(10, 100))
    _placement_ok(tcat, "fact", ["k"], 4)


def test_bucketed_dml_prunes_under_new_modulus(spark, tcat):
    """After a recluster, key-bounded DML routes through the NEW
    layout: a one-key bucketed merge-delete rewrites only that key's
    new bucket and hardlink-carries the rest (inode pin)."""
    tcat.overwrite_bucketed(_fact(spark, 0, 400), "fact", 4, ["k"])
    tcat.recluster("fact", 16)
    d = tcat._data_dirs("fact")[0]

    def bucket_inos():
        out = {}
        for b in os.listdir(d):
            if b.startswith("_kb="):
                bd = os.path.join(d, b)
                out[b] = sorted(
                    os.stat(os.path.join(bd, f)).st_ino
                    for f in os.listdir(bd)
                    if f.endswith(".parquet")
                )
        return out

    before = bucket_inos()
    doomed = spark.createDataFrame([(7,)], "k long")
    n = tcat.merge_delete_bucketed(doomed, "fact", ["k"], num_buckets=16)
    assert n == 1
    kb7 = (
        spark.createDataFrame([(7,)], "k long")
        .select(kb_col(["k"], 16).alias("b"))
        .first()["b"]
    )
    after = {
        b: sorted(
            os.stat(os.path.join(tcat._data_dirs("fact")[0], b, f)).st_ino
            for f in os.listdir(
                os.path.join(tcat._data_dirs("fact")[0], b)
            )
            if f.endswith(".parquet")
        )
        for b in os.listdir(tcat._data_dirs("fact")[0])
        if b.startswith("_kb=")
    }
    for b in before:
        if b == f"_kb={kb7}":
            assert after[b] != before[b]
        else:
            assert after[b] == before[b], f"{b} rewritten needlessly"


def test_matview_survives_recluster_of_source(spark, tcat):
    """Consumers resume across every strategy: a matview (with MIN/MAX)
    over the source refreshes to the same values after fold (empty
    feed, zero applied) and after split (full delete+insert feed that
    nets to zero), and keeps converging on later real DML."""
    from gcp_datalake_pipeline_spark.operators.matview import (
        create_materialized_view,
        refresh_materialized_view,
    )

    tcat.overwrite_bucketed(_fact(spark, 0, 200), "fact", 8, ["k"])
    create_materialized_view(
        tcat, "v", "fact", ["g"], {"total": "amt"}, "n",
        mins={"lo": "amt"}, maxs={"hi": "amt"}, num_buckets=4,
    )

    def recompute():
        return sorted(
            map(
                tuple,
                tcat.read("fact")
                .groupBy("g")
                .agg(
                    F.sum("amt").alias("total"),
                    F.count("*").alias("n"),
                    F.min("amt").alias("lo"),
                    F.max("amt").alias("hi"),
                )
                .collect(),
            )
        )

    def view_rows():
        return sorted(
            map(tuple, tcat.read("v").drop("_kb").collect())
        )

    # fold: empty feed — zero-delta watermark advance
    tcat.recluster("fact", 4)
    out = refresh_materialized_view(tcat, "v")
    assert out["applied"] == 0
    assert view_rows() == recompute()
    # split: identical-row delete+insert feed nets to zero
    tcat.recluster("fact", 8)
    refresh_materialized_view(tcat, "v")
    assert view_rows() == recompute()
    # and real DML afterwards still folds incrementally
    tcat.delete_where("fact", [("g", "=", 3)])
    tcat.append(_fact(spark, 200, 240), "fact")
    refresh_materialized_view(tcat, "v")
    assert view_rows() == recompute()
    # re-keying the VIEW's own layout refuses
    with pytest.raises(ValueError, match="group keys"):
        tcat.recluster("v", 8, key_cols=["total"])
    # but growing the view's bucket count is legitimate maintenance
    out = tcat.recluster("v", 8)
    assert out["strategy"] == "split"
    refresh_materialized_view(tcat, "v")
    assert view_rows() == recompute()


def test_sql_front_door_recluster(spark, tcat):
    from gcp_datalake_pipeline_spark.dml_sql import execute_dml

    tcat.overwrite_bucketed(_fact(spark, 0, 80), "fact", 8, ["k"])
    before = _rows(tcat)
    out = execute_dml(
        tcat, "ALTER TABLE fact CLUSTERED BY (k) INTO 4 BUCKETS"
    )
    assert out == {
        "table": "fact", "strategy": "fold", "num_buckets": 4,
        "key_cols": ["k"],
    }
    assert _rows(tcat) == before
