"""TransactionalCatalog: atomic multi-table commit via manifest pointer.

Closes SURVEY.md §2.11's cross-table atomicity relaxation: the reference
wraps each parent/child load in one PostgreSQL transaction
(etl-gcs-cloudsql/src/db.ts:24-46); here a crashed load must leave the
reader seeing either ALL the load's tables or NONE of them.
"""

import os

import pytest

from gcp_datalake_pipeline_spark.transactions import (
    ConcurrentWriteError,
    TransactionalCatalog,
)


@pytest.fixture()
def tcat(spark, tmp_path):
    return TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))


def _fresh_reader(tcat):
    """A separate catalog object on the same root — what a concurrent (or
    post-crash) reader resolves through the manifest."""
    return TransactionalCatalog(spark=tcat.spark, root=tcat.root)


def _df(spark, rows, schema="k long, v string"):
    return spark.createDataFrame(rows, schema)


def test_commit_publishes_all_tables_at_once(spark, tcat):
    reader = _fresh_reader(tcat)
    with tcat.transaction("load1"):
        tcat.overwrite(_df(spark, [(1, "p")]), "parent")
        # mid-transaction: a reader sees NEITHER table...
        assert not reader.exists("parent")
        tcat.overwrite(_df(spark, [(1, "c")]), "child")
        assert not reader.exists("child")
        # ...while the writer reads its own staged rows
        assert tcat.read("parent").count() == 1
    # after commit: both visible, atomically
    assert reader.read("parent").count() == 1
    assert reader.read("child").count() == 1


def test_crash_recovery_reader_and_vacuum(spark, tmp_path):
    root = str(tmp_path / "lake")
    writer = TransactionalCatalog(spark=spark, root=root)
    # a prior committed load
    writer.overwrite(_df(spark, [(1, "old")]), "parent")  # auto-commit
    # crashed load: parent v2 staged, child never written, no commit
    writer.begin("crashed")
    writer.overwrite(_df(spark, [(2, "new")]), "parent")
    staged = [d for d in writer._txn_dirs]
    del writer  # SIGKILL

    reader = TransactionalCatalog(spark=spark, root=root)
    # reader sees the LAST COMMITTED snapshot: old parent, no child
    assert [r["v"] for r in reader.read("parent").collect()] == ["old"]
    assert not reader.exists("child")
    # staged orphans are garbage on disk until vacuum reclaims them
    assert all(os.path.exists(os.path.join(root, d)) for d in staged)
    removed = reader.vacuum(min_age_seconds=0.0)
    assert set(removed) == set(staged)
    assert not any(os.path.exists(os.path.join(root, d)) for d in staged)
    # vacuum never touches live data
    assert [r["v"] for r in reader.read("parent").collect()] == ["old"]


def test_exception_rolls_back_and_keeps_previous_version(spark, tcat):
    tcat.overwrite(_df(spark, [(1, "v1")]), "t")
    with pytest.raises(RuntimeError, match="boom"):
        with tcat.transaction():
            tcat.overwrite(_df(spark, [(2, "v2")]), "t")
            raise RuntimeError("boom")
    assert [r["v"] for r in tcat.read("t").collect()] == ["v1"]
    # rollback deleted the staged files: every dir left under _loads is
    # referenced by the manifest (i.e. vacuum finds nothing to reclaim)
    assert tcat.vacuum(min_age_seconds=0.0) == []


def test_append_publishes_new_files_only(spark, tcat):
    tcat.append(_df(spark, [(1, "a")]), "log")
    first_dirs = tcat._data_dirs("log")
    first_files = {
        os.path.join(r, f)
        for d in first_dirs
        for r, _, fs in os.walk(d)
        for f in fs
        if f.endswith(".parquet")
    }
    mtimes = {f: os.path.getmtime(f) for f in first_files}
    tcat.append(_df(spark, [(2, "b")]), "log")
    # union visible; the original files were never rewritten
    assert sorted(r["v"] for r in tcat.read("log").collect()) == ["a", "b"]
    assert len(tcat._data_dirs("log")) == 2
    assert {f: os.path.getmtime(f) for f in first_files} == mtimes


def test_merge_upsert_runs_unchanged_on_txn_catalog(spark, tcat):
    base = _df(spark, [(1, "a"), (2, "b")])
    tcat.merge_upsert(base, "m", key_cols=["k"], id_col="mid")
    out = tcat.merge_upsert(
        _df(spark, [(2, "B"), (3, "c")]), "m", key_cols=["k"], id_col="mid"
    )
    rows = {r["k"]: r for r in out.collect()}
    assert rows[2]["v"] == "B" and rows[3]["v"] == "c"
    assert rows[2]["mid"] == 2 and rows[3]["mid"] == 3  # stable + dense


def test_bucketed_merge_links_untouched_partitions(spark, tcat):
    base = _df(spark, [(i, f"v{i}") for i in range(20)])
    tcat.merge_upsert_bucketed(base, "big", key_cols=["k"], num_buckets=8)
    v1_dir = tcat._data_dirs("big")[0]
    v1_inodes = {
        os.path.relpath(os.path.join(r, f), v1_dir): os.stat(
            os.path.join(r, f)
        ).st_ino
        for r, _, fs in os.walk(v1_dir)
        for f in fs
        if f.endswith(".parquet")
    }
    out = tcat.merge_upsert_bucketed(
        _df(spark, [(1, "V1")]), "big", key_cols=["k"], num_buckets=8
    )
    rows = {r["k"]: r["v"] for r in out.collect()}
    assert rows[1] == "V1" and rows[19] == "v19" and len(rows) == 20
    v2_dir = tcat._data_dirs("big")[0]
    assert v2_dir != v1_dir
    v2_inodes = {
        os.path.relpath(os.path.join(r, f), v2_dir): os.stat(
            os.path.join(r, f)
        ).st_ino
        for r, _, fs in os.walk(v2_dir)
        for f in fs
        if f.endswith(".parquet")
    }
    # at least one untouched _kb partition was carried over as a hardlink
    # (same inode), and the touched bucket's files are new inodes
    shared = set(v1_inodes.values()) & set(v2_inodes.values())
    assert shared, "untouched partitions should be hardlinked, not rewritten"
    assert set(v2_inodes.values()) - set(v1_inodes.values()), (
        "the touched bucket must have new files"
    )


def test_full_pipeline_load_is_atomic(spark, tmp_path):
    """The reference's db.ts transaction shape: one ingest batch =
    one atomic load across empresa + tipo_empresa + history + quarantine."""
    from gcp_datalake_pipeline_spark.pipelines.empresa import process_empresas

    tcat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    with tcat.transaction("load-20251001"):
        counters = process_empresas(tcat, "tests/fixtures/empresas_20251001.csv")
    assert counters["processedCount"] == 4
    reader = _fresh_reader(tcat)
    assert reader.read("empresa").count() == 3
    assert reader.read("empresa_history").count() == 3
    assert reader.read("quarantine_empresa").count() == 2
    assert reader.read("tipo_empresa").count() == 2


def test_time_travel_read_at_and_versions(spark, tcat):
    tcat.overwrite(_df(spark, [(1, "v1")]), "t")          # version 1
    with tcat.transaction("second-load"):
        tcat.overwrite(_df(spark, [(2, "v2")]), "t")      # version 2
        tcat.overwrite(_df(spark, [(9, "c")]), "child")
    vs = tcat.versions()
    assert [v["version"] for v in vs] == [1, 2]
    assert vs[1]["load_id"] == "second-load"
    # current read = v2; snapshot read = v1; child absent at v1
    assert [r["v"] for r in tcat.read("t").collect()] == ["v2"]
    assert [r["v"] for r in tcat.read_at("t", 1).collect()] == ["v1"]
    with pytest.raises(FileNotFoundError, match="did not exist"):
        tcat.read_at("child", 1)


def test_vacuum_respects_time_travel_horizon(spark, tcat):
    tcat.overwrite(_df(spark, [(1, "v1")]), "t")
    tcat.overwrite(_df(spark, [(2, "v2")]), "t")
    tcat.overwrite(_df(spark, [(3, "v3")]), "t")
    # retain 2: v2 + v3 stay readable, v1's manifest and data dir go
    removed = tcat.vacuum(retain_versions=2, min_age_seconds=0.0)
    assert any(r.startswith("_versions/1") for r in removed)
    assert [r["v"] for r in tcat.read_at("t", 2).collect()] == ["v2"]
    assert [r["v"] for r in tcat.read_at("t", 3).collect()] == ["v3"]
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        tcat.read_at("t", 1)
    # retain 1: only current survives
    tcat.vacuum(retain_versions=1, min_age_seconds=0.0)
    with pytest.raises(FileNotFoundError):
        tcat.read_at("t", 2)
    assert [r["v"] for r in tcat.read("t").collect()] == ["v3"]


def test_interleaved_commits_from_two_writers_merge(spark, tmp_path):
    """Two writer objects staging concurrently: the later commit must not
    clobber the earlier one's tables (commit serializes the manifest
    read-modify-write under the flock mutex)."""
    root = str(tmp_path / "lake")
    a = TransactionalCatalog(spark=spark, root=root)
    b = TransactionalCatalog(spark=spark, root=root)
    a.begin("load-a")
    b.begin("load-b")
    a.overwrite(_df(spark, [(1, "from-a")]), "t_a")
    b.overwrite(_df(spark, [(2, "from-b")]), "t_b")
    a.commit()
    b.commit()
    reader = TransactionalCatalog(spark=spark, root=root)
    assert [r["v"] for r in reader.read("t_a").collect()] == ["from-a"]
    assert [r["v"] for r in reader.read("t_b").collect()] == ["from-b"]
    assert [v["version"] for v in reader.versions()] == [1, 2]


def test_concurrent_appends_to_same_table_both_land(spark, tmp_path):
    """The lost-update case: two writers append to ONE table from the
    same starting snapshot. Appends are published as deltas merged onto
    the manifest re-read inside the commit lock, so the second commit
    must keep the first's dirs (and vacuum must reclaim neither)."""
    root = str(tmp_path / "lake")
    seed = TransactionalCatalog(spark=spark, root=root)
    seed.append(_df(spark, [(0, "seed")]), "log")

    a = TransactionalCatalog(spark=spark, root=root)
    b = TransactionalCatalog(spark=spark, root=root)
    a.begin("load-a")
    b.begin("load-b")
    a.append(_df(spark, [(1, "from-a")]), "log")
    b.append(_df(spark, [(2, "from-b")]), "log")
    a.commit()
    b.commit()

    reader = TransactionalCatalog(spark=spark, root=root)
    assert sorted(r["v"] for r in reader.read("log").collect()) == [
        "from-a",
        "from-b",
        "seed",
    ]
    dirs = reader._data_dirs("log")
    assert len(dirs) == 3
    # every committed dir is live: vacuum may drop old version manifests
    # but must reclaim NO data dir of the merged table
    reader.vacuum(retain_versions=1, min_age_seconds=0.0)
    assert all(os.path.isdir(d) for d in dirs)
    assert sorted(r["v"] for r in reader.read("log").collect()) == [
        "from-a",
        "from-b",
        "seed",
    ]


def test_concurrent_replace_conflicts_second_writer_fails(spark, tmp_path):
    """Overwrite/merge derive their output from a read of the table, so a
    stale-snapshot replace must fail (Delta-style) rather than silently
    clobber the interleaved commit."""
    root = str(tmp_path / "lake")
    seed = TransactionalCatalog(spark=spark, root=root)
    seed.merge_upsert(_df(spark, [(1, "a")]), "m", key_cols=["k"], id_col="mid")

    a = TransactionalCatalog(spark=spark, root=root)
    b = TransactionalCatalog(spark=spark, root=root)
    a.begin("load-a")
    b.begin("load-b")
    a.merge_upsert(_df(spark, [(2, "b")]), "m", key_cols=["k"], id_col="mid")
    b.merge_upsert(_df(spark, [(3, "c")]), "m", key_cols=["k"], id_col="mid")
    a.commit()
    with pytest.raises(ConcurrentWriteError, match="modified by another"):
        b.commit()
    b.rollback()

    # writer A's merge is intact; B's staged dirs are reclaimable garbage
    reader = TransactionalCatalog(spark=spark, root=root)
    assert sorted(r["k"] for r in reader.read("m").collect()) == [1, 2]
    # retry-from-fresh-read now succeeds
    b.merge_upsert(_df(spark, [(3, "c")]), "m", key_cols=["k"], id_col="mid")
    assert sorted(r["k"] for r in reader.read("m").collect()) == [1, 2, 3]


def test_failed_commit_rolls_back_inside_transaction(spark, tmp_path):
    """transaction() must roll back when COMMIT itself fails (not only on
    body exceptions): staged dirs deleted, no open-transaction state left
    behind, catalog immediately reusable."""
    root = str(tmp_path / "lake")
    seed = TransactionalCatalog(spark=spark, root=root)
    seed.overwrite(_df(spark, [(1, "v1")]), "t")

    w = TransactionalCatalog(spark=spark, root=root)
    other = TransactionalCatalog(spark=spark, root=root)
    with pytest.raises(ConcurrentWriteError):
        with w.transaction("doomed"):
            w.overwrite(_df(spark, [(2, "v2")]), "t")
            # interleaved writer moves the table before our commit
            other.overwrite(_df(spark, [(9, "winner")]), "t")
    # not stuck: _pending cleared, staged dirs deleted at rollback
    assert w._pending is None
    doomed = list(w._txn_dirs)
    assert doomed and not any(
        os.path.exists(os.path.join(root, d)) for d in doomed
    )
    # a new transaction opens fine
    with w.transaction("retry"):
        w.overwrite(_df(spark, [(3, "v3")]), "t")
    assert [r["v"] for r in w.read("t").collect()] == ["v3"]


def test_vacuum_age_threshold_protects_fresh_staging(spark, tmp_path):
    """Freshly staged dirs of a (possibly concurrent) uncommitted load
    survive vacuum under the default age threshold."""
    root = str(tmp_path / "lake")
    w = TransactionalCatalog(spark=spark, root=root)
    w.overwrite(_df(spark, [(1, "live")]), "t")
    w.begin("in-flight")
    w.overwrite(_df(spark, [(2, "staged")]), "t")
    staged = list(w._txn_dirs)
    del w  # other process still mid-transaction, from the vacuumer's view

    v = TransactionalCatalog(spark=spark, root=root)
    assert v.vacuum() == []  # default min_age: nothing reclaimed
    assert all(os.path.exists(os.path.join(root, d)) for d in staged)
    removed = v.vacuum(min_age_seconds=0.0)
    assert set(removed) == set(staged)


def test_streaming_ingest_atomic_on_txn_catalog(spark, tmp_path):
    """Streaming ingest over a TransactionalCatalog commits each file's
    tables atomically (same contract as the batch runner)."""
    import shutil

    from gcp_datalake_pipeline_spark.streaming.ingest import (
        run_streaming_ingest,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    shutil.copy("tests/fixtures/empresas_20251001.csv", landing)
    tcat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    processed = run_streaming_ingest(
        tcat, str(landing), str(tmp_path / "ckpt")
    )
    assert len(processed) == 1
    reader = _fresh_reader(tcat)
    assert reader.read("empresa").count() == 3
    assert reader.read("empresa_history").count() == 3
    # one load commit for the file's whole table group
    assert any(
        v["load_id"] == "stream-empresas_20251001.csv"
        for v in reader.versions()
    )


def test_plain_root_refuses_transactional_use_until_migrated(spark, tmp_path):
    """Pointing a transactional catalog at a live plain root must not
    silently fork it (empty manifest shadowing committed dirs)."""
    from gcp_datalake_pipeline_spark.storage import Catalog

    root = str(tmp_path / "lake")
    plain = Catalog(spark=spark, root=root)
    plain.merge_upsert(_df(spark, [(1, "a"), (2, "b")]), "m", key_cols=["k"], id_col="mid")

    tcat = TransactionalCatalog(spark=spark, root=root)
    with pytest.raises(RuntimeError, match="migrate_plain"):
        tcat.read("m")
    with pytest.raises(RuntimeError, match="migrate_plain"):
        tcat.append(_df(spark, [(3, "c")]), "m")

    assert tcat.migrate_plain() == ["m"]
    # adopted in place: same rows, table-level continuity
    assert sorted(r["k"] for r in tcat.read("m").collect()) == [1, 2]
    # surrogate ids CONTINUE (the fork would have restarted them at 1)
    out = tcat.merge_upsert(
        _df(spark, [(3, "c")]), "m", key_cols=["k"], id_col="mid"
    )
    assert {r["k"]: r["mid"] for r in out.collect()}[3] == 3
    # idempotent second call
    assert tcat.migrate_plain() == []


def test_restore_rolls_back_as_a_new_commit(spark, tcat):
    tcat.overwrite(_df(spark, [(1, "v1")]), "t")              # version 1
    with tcat.transaction("bad-load"):                        # version 2
        tcat.overwrite(_df(spark, [(2, "v2")]), "t")
        tcat.overwrite(_df(spark, [(9, "oops")]), "extra")
    tcat.restore(1)                                           # version 3
    # the catalog IS snapshot 1 again: old rows, later table gone
    assert [r["v"] for r in tcat.read("t").collect()] == ["v1"]
    assert not tcat.exists("extra")
    assert tcat.tables() == ["t"]
    # history keeps all three versions; the bad load stays readable
    assert [v["version"] for v in tcat.versions()] == [1, 2, 3]
    assert tcat.versions()[2]["load_id"] == "restore-v1"
    assert [r["v"] for r in tcat.read_at("t", 2).collect()] == ["v2"]
    with pytest.raises(FileNotFoundError):
        tcat.restore(99)


def test_compact_folds_append_dirs_into_one(spark, tcat):
    for i in range(4):
        tcat.append(_df(spark, [(i, f"v{i}")]), "t")
    assert len(tcat._data_dirs("t")) == 4
    pre_version = tcat._read_manifest()["version"]
    assert tcat.compact("t") is True
    reader = _fresh_reader(tcat)
    assert len(reader._data_dirs("t")) == 1
    rows = {(r.k, r.v) for r in reader.read("t").collect()}
    assert rows == {(i, f"v{i}") for i in range(4)}
    # the pre-compaction snapshot stays time-travelable
    assert reader.read_at("t", pre_version).count() == 4
    # already compact -> no-op, no new version
    v = reader._read_manifest()["version"]
    assert tcat.compact("t") is False
    assert _fresh_reader(tcat)._read_manifest()["version"] == v


def test_compact_cluster_by_sorts_rewrite(spark, tcat):
    import pyarrow.parquet as pq

    tcat.append(_df(spark, [(5, "e"), (1, "a")]), "t")
    tcat.append(_df(spark, [(4, "d"), (2, "b"), (3, "c")]), "t")
    assert tcat.compact("t", cluster_by=["k"]) is True
    reader = _fresh_reader(tcat)
    [d] = reader._data_dirs("t")
    # each file is internally sorted on k (min/max stats are selective)
    for f in sorted(os.listdir(d)):
        if f.endswith(".parquet"):
            ks = pq.read_table(os.path.join(d, f), columns=["k"])["k"].to_pylist()
            assert ks == sorted(ks)
    assert {(r.k, r.v) for r in reader.read("t").collect()} == {
        (1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")
    }


def test_compact_conflicts_with_concurrent_append(spark, tmp_path):
    """An append landing between compaction's snapshot and its commit must
    fail the compaction, never be silently replaced away."""
    root = str(tmp_path / "lake")
    a = TransactionalCatalog(spark=spark, root=root)
    b = TransactionalCatalog(spark=spark, root=root)
    for i in range(3):
        a.append(_df(spark, [(i, "x")]), "t")

    orig_transaction = TransactionalCatalog.transaction
    from contextlib import contextmanager

    raced = {"done": False}

    @contextmanager
    def racing_transaction(self, load_id=None):
        # writer b commits an append AFTER compact() snapshotted the dirs
        # (guarded: b's own auto-commit transaction must not re-race)
        if self is a and not raced["done"]:
            raced["done"] = True
            b.append(_df(spark, [(99, "late")]), "t")
        with orig_transaction(self, load_id):
            yield self

    TransactionalCatalog.transaction = racing_transaction
    try:
        with pytest.raises(ConcurrentWriteError):
            a.compact("t")
    finally:
        TransactionalCatalog.transaction = orig_transaction
    # the late append survived; nothing lost
    reader = TransactionalCatalog(spark=spark, root=root)
    assert reader.read("t").count() == 4
    assert {r.k for r in reader.read("t").collect()} == {0, 1, 2, 99}


def test_schema_evolution_append_adds_column(spark, tcat):
    tcat.append(_df(spark, [(1, "a")]), "t")
    pre_version = tcat._read_manifest()["version"]
    tcat.append(
        spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double"),
        "t",
    )
    reader = _fresh_reader(tcat)
    rows = {(r.k, r.v, r.score) for r in reader.read("t").collect()}
    assert rows == {(1, "a", None), (2, "b", 9.5)}
    # time travel renders the OLD schema (no score column)
    assert reader.read_at("t", pre_version).columns == ["k", "v"]
    # compaction keeps the evolved schema and the null back-fill
    assert tcat.compact("t") is True
    rows2 = {(r.k, r.v, r.score) for r in _fresh_reader(tcat).read("t").collect()}
    assert rows2 == rows


def test_schema_evolution_type_conflict_rejected(spark, tcat):
    tcat.append(_df(spark, [(1, "a")]), "t")
    with pytest.raises(ValueError, match="schema conflict"):
        tcat.append(
            spark.createDataFrame([(2, 3)], "k long, v long"), "t"
        )
    # the failed append rolled back: data intact, no orphan pointer
    reader = _fresh_reader(tcat)
    assert reader.read("t").count() == 1
    assert reader.read("t").columns == ["k", "v"]


def test_schema_evolution_read_your_writes_in_txn(spark, tcat):
    tcat.append(_df(spark, [(1, "a")]), "t")
    with tcat.transaction("evolve"):
        tcat.append(
            spark.createDataFrame([(2, "b", 1.5)], "k long, v string, score double"),
            "t",
        )
        assert set(tcat.read("t").columns) == {"k", "v", "score"}
    assert set(_fresh_reader(tcat).read("t").columns) == {"k", "v", "score"}


def test_compact_then_vacuum_reclaims_fragments(spark, tcat):
    """After compaction, vacuum past the horizon reclaims the small
    pre-compaction dirs; the compacted table and its history behave."""
    for i in range(3):
        tcat.append(_df(spark, [(i, "x")]), "t")
    pre = tcat._data_dirs("t")
    assert tcat.compact("t") is True
    removed = tcat.vacuum(retain_versions=1, min_age_seconds=0.0)
    # every pre-compaction fragment dir was reclaimed, on disk and in
    # the vacuum report
    pre_rels = {os.path.relpath(p, tcat.root) for p in pre}
    assert pre_rels <= set(removed)
    assert not any(os.path.exists(p) for p in pre)
    # data still reads; pre-compaction snapshots are gone from the
    # time-travel horizon
    assert tcat.read("t").count() == 3
    with pytest.raises(FileNotFoundError):
        tcat.read_at("t", 1)


def test_clone_is_zero_copy_and_isolated(spark, tmp_path):
    src = TransactionalCatalog(spark=spark, root=str(tmp_path / "src"))
    src.append(_df(spark, [(1, "a"), (2, "b")]), "t")
    src.overwrite(_df(spark, [(9, "z")]), "dim")

    clone = src.clone_to(str(tmp_path / "clone"))
    assert sorted(clone.tables()) == ["dim", "t"]
    assert clone.read("t").count() == 2
    # zero-copy: shared inodes, no bytes duplicated
    [sd] = src._data_dirs("dim")
    [cd] = clone._data_dirs("dim")
    src_inodes = {
        os.stat(os.path.join(r, f)).st_ino
        for r, _, fs in os.walk(sd) for f in fs if f.endswith(".parquet")
    }
    clone_inodes = {
        os.stat(os.path.join(r, f)).st_ino
        for r, _, fs in os.walk(cd) for f in fs if f.endswith(".parquet")
    }
    assert src_inodes == clone_inodes

    # divergence: each side's writes are invisible to the other
    clone.append(_df(spark, [(3, "c")]), "t")
    src.append(_df(spark, [(4, "d")]), "t")
    assert {r.k for r in clone.read("t").collect()} == {1, 2, 3}
    assert {r.k for r in src.read("t").collect()} == {1, 2, 4}

    # source vacuum past its horizon never breaks the clone (hardlinked
    # inodes survive the source unlinking its names)
    src.overwrite(_df(spark, [(0, "n")]), "t")
    src.vacuum(retain_versions=1, min_age_seconds=0.0)
    assert {r.k for r in clone.read("t").collect()} == {1, 2, 3}

    # schema history rides along
    clone.append(
        spark.createDataFrame([(5, "e", 1.0)], "k long, v string, x double"),
        "t",
    )
    assert set(clone.read("t").columns) == {"k", "v", "x"}

    # refuses to clone onto an existing catalog
    with pytest.raises(FileExistsError):
        src.clone_to(str(tmp_path / "clone"))


_WORKER_SRC = '''
"""Cross-process commit-protocol worker: stages parquet via pyarrow (no
JVM) and drives the REAL _publish path — flock serialization, append
delta-merge, replace conflict detection — from its own OS process."""
import json
import os
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

from gcp_datalake_pipeline_spark.transactions import (
    ConcurrentWriteError,
    TransactionalCatalog,
)

root, wid, n_rounds = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
cat = TransactionalCatalog(spark=None, root=root)

def stage(table, r):
    rel = os.path.join("_loads", f"w{wid}", f"{table}.{r}")
    os.makedirs(os.path.join(root, rel), exist_ok=True)
    pq.write_table(
        pa.table({"id": [wid * 1000 + r], "worker": [wid]}),
        os.path.join(root, rel, "part-0.parquet"),
    )
    return rel

# phase 1: concurrent appends — every one must land (no lost updates)
for r in range(n_rounds):
    rel = stage("app", r)
    cat._publish(
        {"app": {"mode": "append", "base": None, "added": [rel],
                 "schema": None}},
        f"w{wid}-r{r}", replace=False,
    )

# phase 2: forced replace-vs-replace race — both workers read the same
# committed snapshot of "rep" BEFORE either publishes; exactly one may win
open(os.path.join(root, f"_ready{wid}"), "w").close()
deadline = time.time() + 30
while not all(
    os.path.exists(os.path.join(root, f"_ready{w}")) for w in (0, 1)
):
    if time.time() > deadline:
        sys.exit(3)
    time.sleep(0.01)
base = cat._committed_rels("rep")
rel = stage("rep", 0)
time.sleep(0.5)  # hold the stale snapshot so the commits overlap
try:
    cat._publish(
        {"rep": {"mode": "replace", "base": base, "added": [rel],
                 "schema": None}},
        f"rep-w{wid}", replace=False,
    )
    outcome = "ok"
except ConcurrentWriteError:
    outcome = "conflict"
print(json.dumps({"worker": wid, "rep": outcome}))
'''


def test_commit_protocol_across_os_processes(spark, tmp_path):
    """The on-disk protocol everything routes through, pinned across REAL
    process boundaries (flock is per-host, not per-object): two spawned
    workers interleave 20 appends each — all 40 land, version numbering
    is contiguous — then race replace-mode commits anchored at the same
    snapshot: exactly one wins, the other raises ConcurrentWriteError."""
    import json
    import subprocess
    import sys

    root = str(tmp_path / "lake")
    script = tmp_path / "worker.py"
    script.write_text(_WORKER_SRC)
    env = dict(os.environ, PYTHONPATH="/root/repo")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), root, str(w), "20"],
            cwd="/root/repo",
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for w in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, err[-2000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    outcomes = sorted(o["rep"] for o in outs)
    assert outcomes == ["conflict", "ok"], outs

    cat = TransactionalCatalog(spark=spark, root=root)
    # no lost updates: every append from both processes is visible
    rows = cat.read("app").collect()
    assert len(rows) == 40
    assert {r["worker"] for r in rows} == {0, 1}
    assert {r["id"] for r in rows} == {
        w * 1000 + r for w in (0, 1) for r in range(20)
    }
    # the losing replace published nothing; the winner's single dir is live
    assert len(cat._data_dirs("rep")) == 1
    assert cat.read("rep").count() == 1
    # contiguous version history: 40 appends + 1 replace, no gaps
    versions = [v["version"] for v in cat.versions()]
    assert versions == list(range(1, 42))


def test_load_id_markers_o1_and_vacuum_proof(spark, tcat):
    """has_load_id is the replay guard's O(1) lookup: maintained at
    commit, answered without scanning the version history, and immune to
    vacuum (snapshot retention must never shrink the replay horizon)."""
    for i in range(5):
        with tcat.transaction(f"load-{i}"):
            tcat.append(_df(spark, [(i, "x")]), "t")
    assert tcat.has_load_id("load-0") and tcat.has_load_id("load-4")
    assert not tcat.has_load_id("load-99")
    # O(1): the lookup must not touch the version history
    import unittest.mock as mock

    with mock.patch.object(
        TransactionalCatalog, "versions",
        side_effect=AssertionError("has_load_id scanned versions"),
    ):
        assert tcat.has_load_id("load-2")
        assert not tcat.has_load_id("load-77")
    # vacuum to a single retained snapshot: markers all survive
    removed = tcat.vacuum(retain_versions=1, min_age_seconds=0.0)
    assert removed  # old snapshots actually dropped
    assert all(tcat.has_load_id(f"load-{i}") for i in range(5))


def test_load_id_markers_backfill_legacy_catalog(spark, tcat):
    """A catalog committed before markers existed answers through the
    version-history fallback, and its next commit backfills the marker
    dir so later lookups are O(1)."""
    import shutil

    with tcat.transaction("old-load"):
        tcat.append(_df(spark, [(1, "x")]), "t")
    shutil.rmtree(tcat._marker_dir())  # simulate a pre-marker catalog
    assert tcat.has_load_id("old-load")  # fallback: version scan
    with tcat.transaction("new-load"):
        tcat.append(_df(spark, [(2, "y")]), "t")
    import unittest.mock as mock

    with mock.patch.object(
        TransactionalCatalog, "versions",
        side_effect=AssertionError("marker lookup scanned versions"),
    ):
        assert tcat.has_load_id("old-load")  # backfilled
        assert tcat.has_load_id("new-load")


def test_crashed_commit_marker_not_trusted(spark, tcat):
    """A crash between marker write and pointer swap must not make a
    replay skip the (lost) round: the orphan marker is disregarded via
    the .pending sidecar and cleaned by the next commit."""
    with tcat.transaction("ok-load"):
        tcat.append(_df(spark, [(1, "x")]), "t")

    # simulate the crash window: marker + .pending written, swap never ran
    def boom(self, manifest):
        raise RuntimeError("crash before pointer swap")

    import unittest.mock as mock

    with mock.patch.object(TransactionalCatalog, "_swap_manifest", boom):
        with pytest.raises(RuntimeError, match="crash"):
            with tcat.transaction("lost-load"):
                tcat.append(_df(spark, [(2, "y")]), "t")
    assert os.path.exists(tcat._marker_path("lost-load"))  # orphan exists
    assert not tcat.has_load_id("lost-load")  # ...but is not trusted
    assert tcat.has_load_id("ok-load")
    # the next commit cleans the orphan under the lock
    with tcat.transaction("next-load"):
        tcat.append(_df(spark, [(3, "z")]), "t")
    assert not os.path.exists(tcat._marker_path("lost-load"))
    assert not tcat.has_load_id("lost-load")
    assert tcat.has_load_id("next-load")


def test_pending_sidecar_written_before_marker(spark, tcat):
    """Ordering regression for the crash window BETWEEN the two marker
    writes: .pending must be published (fsynced) BEFORE the marker it
    names. If the marker were written first, a crash between the writes
    would leave a visible marker while .pending still names the PREVIOUS
    commit (version <= committed pointer), so has_load_id would trust a
    never-committed load and its replayed round would be skipped — data
    loss. Simulated by failing the .pending publish (its os.replace) and
    asserting no marker exists yet."""
    import unittest.mock as mock

    with tcat.transaction("ok-load"):
        tcat.append(_df(spark, [(1, "x")]), "t")

    real_replace = os.replace

    def crash_on_pending(src, dst):
        if os.path.basename(dst).startswith(".pending"):
            raise RuntimeError("crash at .pending publish")
        return real_replace(src, dst)

    with mock.patch(
        "gcp_datalake_pipeline_spark.transactions.os.replace",
        side_effect=crash_on_pending,
    ):
        with pytest.raises(RuntimeError, match="crash at .pending"):
            with tcat.transaction("lost-load"):
                tcat.append(_df(spark, [(2, "y")]), "t")
    # the marker was NOT written before the crash point — the lost round
    # replays instead of being skipped
    assert not os.path.exists(tcat._marker_path("lost-load"))
    assert not tcat.has_load_id("lost-load")
    assert tcat.has_load_id("ok-load")
    # the catalog recovers: the round retries and commits normally
    with tcat.transaction("lost-load"):
        tcat.append(_df(spark, [(2, "y")]), "t")
    assert tcat.has_load_id("lost-load")
    assert tcat.read("t").count() == 2


def test_crash_between_pending_and_marker_recovers(spark, tcat):
    """A crash AFTER .pending publish but BEFORE the marker write leaves
    .pending naming a marker that does not exist: has_load_id is False
    (no marker), and the next commit's orphan cleanup tolerates the
    missing file."""
    import json

    with tcat.transaction("ok-load"):
        tcat.append(_df(spark, [(1, "x")]), "t")
    # simulate the on-disk state: .pending names an unwritten marker one
    # version ahead of the committed pointer
    committed = tcat._read_manifest()["version"]
    mpath = tcat._marker_path("half-load")
    with open(tcat._pending_marker_path(), "w") as f:
        json.dump(
            {"path": os.path.basename(mpath), "version": committed + 1}, f
        )
    assert not tcat.has_load_id("half-load")
    with tcat.transaction("next-load"):
        tcat.append(_df(spark, [(3, "z")]), "t")
    assert tcat.has_load_id("next-load")
    assert not tcat.has_load_id("half-load")


def test_clone_carries_load_markers(spark, tmp_path):
    """A streaming loop re-pointed at a clone must skip rounds the source
    committed (the clone HAS their data): markers ride along."""
    src = TransactionalCatalog(spark=spark, root=str(tmp_path / "src"))
    with src.transaction("round-1"):
        src.append(_df(spark, [(1, "x")]), "t")
    dst = src.clone_to(str(tmp_path / "dst"))
    assert dst.has_load_id("round-1")
    assert not dst.has_load_id("round-2")
    with dst.transaction("round-2"):
        dst.append(_df(spark, [(2, "y")]), "t")
    assert dst.has_load_id("round-2") and not src.has_load_id("round-2")
