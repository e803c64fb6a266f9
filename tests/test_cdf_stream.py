"""Exactly-once change-feed consumption (streaming/cdf.py): the
watermark advances atomically with the applied writes, every advance is
conflict-checked, and the keyed CDC apply keeps a replica equal to its
source under append / delete / update DML."""

import pytest
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.streaming.cdf import (
    apply_changes_into,
    pump_table_changes,
)
from gcp_datalake_pipeline_spark.transactions import (
    ConcurrentWriteError,
    TransactionalCatalog,
)


@pytest.fixture()
def tcat(spark, tmp_path):
    return TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))


def _src(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("g"),
        (F.col("id") * 1.5).alias("amt"),
    )


def _rows(tcat, name):
    return sorted(map(tuple, tcat.read(name).collect()))


def _replica_apply(tcat):
    def apply(feed):
        return apply_changes_into(tcat, feed, "replica", ["k"])

    return apply


def _bootstrap(spark, tcat):
    """Seed source + replica snapshot + registered consumer (the
    documented bootstrap contract: the feed starts AFTER the
    watermark, so the replica copies the current snapshot first)."""
    tcat.overwrite(_src(spark, 0, 10), "src")
    pump_table_changes(tcat, "src", "rep")  # register at current
    tcat.overwrite(tcat.read("src"), "replica")


def test_replica_tracks_source_under_all_dml(spark, tcat):
    _bootstrap(spark, tcat)
    tcat.append(_src(spark, 10, 30), "src")
    tcat.delete_where("src", [("k", "<", 5)])
    tcat.update_where("src", [("g", "=", 2)], {"amt": "amt * 10"})
    out = pump_table_changes(tcat, "src", "rep", _replica_apply(tcat))
    assert out["applied"] > 0
    assert _rows(tcat, "replica") == _rows(tcat, "src")
    # catch-up pump is a zero-apply no-op and does not bump the version
    v = tcat._read_manifest(strict=False)["version"]
    calls = []
    out = pump_table_changes(
        tcat, "src", "rep", lambda f: calls.append(f)
    )
    assert out["applied"] == 0 and out["from"] == out["to"]
    assert not calls, "idle source must not invoke apply_fn"
    assert tcat._read_manifest(strict=False)["version"] == v


def test_start_version_replays_retained_history(spark, tcat):
    """Registering at an older retained version makes the first pump
    cover everything committed since — the deep-history start."""
    tcat.overwrite(_src(spark, 0, 10), "src")
    v_seed = tcat._read_manifest(strict=False)["version"]
    tcat.append(_src(spark, 10, 15), "src")
    tcat.append(_src(spark, 15, 20), "src")
    pump_table_changes(tcat, "src", "rep", start_version=v_seed)
    pump_table_changes(tcat, "src", "rep", _replica_apply(tcat))
    # the replica holds exactly the post-seed appends
    assert _rows(tcat, "replica") == sorted(
        map(tuple, _src(spark, 10, 20).collect())
    )
    with pytest.raises(ValueError, match="ahead of the catalog"):
        pump_table_changes(tcat, "src", "rep2", start_version=999)


def test_watermark_commits_atomically_with_the_apply(spark, tcat):
    """A failed apply leaves BOTH the replica and the watermark
    untouched; the retry applies the same window exactly once."""
    _bootstrap(spark, tcat)
    tcat.append(_src(spark, 10, 14), "src")
    before = tcat.stream_watermark("rep")

    def boom(feed):
        apply_changes_into(tcat, feed, "replica", ["k"])
        raise RuntimeError("crash after staging, before commit")

    with pytest.raises(RuntimeError, match="crash after staging"):
        pump_table_changes(tcat, "src", "rep", boom)
    assert tcat.stream_watermark("rep") == before
    assert len(_rows(tcat, "replica")) == 10  # staged writes rolled back
    out = pump_table_changes(tcat, "src", "rep", _replica_apply(tcat))
    assert out["applied"] > 0
    assert _rows(tcat, "replica") == _rows(tcat, "src")


def test_racing_pumps_cannot_double_apply(spark, tcat):
    """Two pumps of one consumer racing the same window: append-only
    sinks never conflict on dir lists, so the watermark expect-check
    must fail the second committer — or the window lands twice."""
    tcat.overwrite(_src(spark, 0, 10), "src")
    pump_table_changes(tcat, "src", "rep")
    tcat.append(_src(spark, 10, 20), "src")
    tcat2 = TransactionalCatalog(spark=spark, root=tcat.root)

    def sneaky(feed):
        tcat.append(feed.drop("_change_type", "_commit_version"), "sink")
        # a second pump of the same consumer lands first
        pump_table_changes(
            tcat2,
            "src",
            "rep",
            lambda f: tcat2.append(
                f.drop("_change_type", "_commit_version"), "sink"
            ),
        )
        return 1

    with pytest.raises(ConcurrentWriteError, match="rep"):
        pump_table_changes(tcat, "src", "rep", sneaky)
    # exactly one copy of the window's 10 inserts landed
    assert tcat.read("sink").count() == 10
    out = pump_table_changes(tcat, "src", "rep", _replica_apply(tcat))
    assert out["applied"] == 0 and out["from"] == out["to"]


def test_empty_apply_advances_watermark_without_data_commit(spark, tcat):
    tcat.overwrite(_src(spark, 0, 5), "src")
    pump_table_changes(tcat, "src", "rep")
    tcat.append(_src(spark, 5, 8), "src")
    v = tcat._read_manifest(strict=False)["version"]
    seen = {}

    def observe(feed):
        seen["n"] = feed.count()
        return None  # no writes

    out = pump_table_changes(tcat, "src", "rep", observe)
    assert seen["n"] > 0 and out["applied"] is None
    # one metadata-only commit: watermark moved, no table dirs moved
    m = tcat._read_manifest(strict=False)
    assert m["version"] == v + 1
    assert tcat.stream_watermark("rep")["as_of"] == out["to"]


def test_update_wins_over_delete_at_same_version(spark, tcat):
    """An in-place UPDATE is a delete+insert at ONE commit version —
    the keyed apply must keep the insert, not drop the key."""
    _bootstrap(spark, tcat)
    tcat.update_where("src", [("k", "=", 3)], {"amt": "999.0"})
    pump_table_changes(tcat, "src", "rep", _replica_apply(tcat))
    got = {r["k"]: r["amt"] for r in tcat.read("replica").collect()}
    assert got[3] == 999.0 and len(got) == 10


def test_watermark_rides_clone_and_restore(spark, tcat, tmp_path):
    _bootstrap(spark, tcat)
    tcat.append(_src(spark, 10, 12), "src")
    pump_table_changes(tcat, "src", "rep", _replica_apply(tcat))
    wm = tcat.stream_watermark("rep")
    clone = tcat.clone_to(str(tmp_path / "branch"))
    assert clone.stream_watermark("rep") == wm
    v = tcat._read_manifest(strict=False)["version"]
    tcat.append(_src(spark, 12, 14), "src")
    pump_table_changes(tcat, "src", "rep", _replica_apply(tcat))
    assert tcat.stream_watermark("rep")["as_of"] > wm["as_of"]
    tcat.restore(v)
    # whole-catalog restore reverts consumer watermarks WITH the data
    assert tcat.stream_watermark("rep") == wm
    assert _rows(tcat, "replica") == _rows(tcat, "src")


def test_source_mismatch_and_open_txn_refused(spark, tcat):
    tcat.overwrite(_src(spark, 0, 5), "src")
    tcat.overwrite(_src(spark, 0, 5), "other")
    pump_table_changes(tcat, "src", "rep")
    with pytest.raises(ValueError, match="registered on source"):
        pump_table_changes(tcat, "other", "rep")
    tcat.begin("outer")
    try:
        with pytest.raises(RuntimeError, match="open transaction"):
            pump_table_changes(tcat, "src", "rep")
    finally:
        tcat.rollback()


def test_register_requires_existing_source(spark, tcat):
    """A typoed source must refuse at registration — otherwise every
    later pump reports 'caught up' forever with nothing flowing (r10
    review #2 of the wave)."""
    tcat.overwrite(_src(spark, 0, 5), "src")
    with pytest.raises(FileNotFoundError, match="ghost"):
        pump_table_changes(tcat, "ghost", "rep")


def test_replica_survives_source_schema_evolution(spark, tcat):
    """ALTER TABLE ADD COLUMN on the source widens the feed; the keyed
    apply must null-fill the replica's pre-evolution rows instead of
    wedging the consumer on a union mismatch (r10 review #1)."""
    _bootstrap(spark, tcat)
    tcat.add_column("src", "note", "string")
    tcat.append(
        _src(spark, 10, 14).withColumn("note", F.lit("new")), "src"
    )
    tcat.update_where("src", [("k", "=", 1)], {"note": "'touched'"})
    out = pump_table_changes(tcat, "src", "rep", _replica_apply(tcat))
    assert out["applied"] > 0
    assert _rows(tcat, "replica") == _rows(tcat, "src")
    # evolve again while the consumer is registered: still tracks
    tcat.add_column("src", "score", "bigint")
    tcat.append(
        _src(spark, 14, 16)
        .withColumn("note", F.lit("x"))
        .withColumn("score", F.lit(7).cast("bigint")),
        "src",
    )
    pump_table_changes(tcat, "src", "rep", _replica_apply(tcat))
    assert _rows(tcat, "replica") == _rows(tcat, "src")


def test_drop_stream_is_the_escape_hatch(spark, tcat):
    """drop_stream deregisters a consumer (e.g. after vacuum ate its
    watermark window); re-registering starts a fresh pipeline."""
    tcat.overwrite(_src(spark, 0, 5), "src")
    pump_table_changes(tcat, "src", "rep")
    assert tcat.stream_watermark("rep") is not None
    tcat.drop_stream("rep")
    assert tcat.stream_watermark("rep") is None
    with pytest.raises(KeyError, match="rep"):
        tcat.drop_stream("rep")
    out = pump_table_changes(tcat, "src", "rep")
    assert out["from"] is None  # fresh registration
    tcat.begin("outer")
    try:
        with pytest.raises(RuntimeError, match="open transaction"):
            tcat.drop_stream("rep")
    finally:
        tcat.rollback()


def test_pump_window_splitting_invariance(spark, tmp_path):
    """Algebraic pin: pumping after EVERY commit and pumping ONCE over
    the whole window produce identical replicas — the keyed apply is
    associative over window splits (latest-version-wins makes any
    partition of the commit range fold to the same state)."""
    roots = []
    for mode in ("each", "once"):
        cat = TransactionalCatalog(
            spark=spark, root=str(tmp_path / f"lake_{mode}")
        )
        cat.overwrite(_src(spark, 0, 12), "src")
        pump_table_changes(cat, "src", "rep")
        cat.overwrite(cat.read("src"), "replica")
        steps = [
            lambda c: c.append(_src(spark, 12, 20), "src"),
            lambda c: c.delete_where("src", [("k", "<", 4)]),
            lambda c: c.update_where(
                "src", [("g", "=", 1)], {"amt": "amt + 0.5"}
            ),
            lambda c: c.delete_where("src", [("g", "=", 3)]),
            lambda c: c.append(_src(spark, 20, 23), "src"),
        ]
        for step in steps:
            step(cat)
            if mode == "each":
                pump_table_changes(cat, "src", "rep", _replica_apply(cat))
        if mode == "once":
            pump_table_changes(cat, "src", "rep", _replica_apply(cat))
        roots.append(
            (sorted(map(tuple, cat.read("replica").collect())),
             sorted(map(tuple, cat.read("src").collect())))
        )
    (rep_each, src_each), (rep_once, src_once) = roots
    assert src_each == src_once          # same DML -> same source
    assert rep_each == rep_once == src_each


def test_pump_randomized_dml_sequences(spark, tmp_path):
    """Property-style pin over seeded pseudo-random DML programs: for
    several deterministic sequences of append/delete/update with pumps
    interleaved at arbitrary points, the replica always converges to
    the source after the final catch-up pump."""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        cat = TransactionalCatalog(
            spark=spark, root=str(tmp_path / f"lake_{seed}")
        )
        cat.overwrite(_src(spark, 0, 15), "src")
        pump_table_changes(cat, "src", "rep")
        cat.overwrite(cat.read("src"), "replica")
        hi = 15
        for _ in range(6):
            op = rng.choice(("append", "delete", "update", "pump"))
            if op == "append":
                cat.append(_src(spark, hi, hi + rng.randint(2, 6)), "src")
                hi += 6
            elif op == "delete":
                cat.delete_where(
                    "src", [("k", "<", rng.randint(1, hi // 2))]
                )
            elif op == "update":
                cat.update_where(
                    "src",
                    [("g", "=", rng.randint(0, 3))],
                    {"amt": f"amt * {rng.choice(('2', '0.5'))}"},
                )
            else:
                pump_table_changes(cat, "src", "rep", _replica_apply(cat))
        pump_table_changes(cat, "src", "rep", _replica_apply(cat))
        assert _rows(cat, "replica") == _rows(cat, "src"), seed


# -- bucket-bounded apply (r11): pumps rewrite only touched buckets ----------


def _bucket_inodes(cat, table):
    """{_kb=i: sorted data-file inodes} for the table's current version."""
    import os

    d = cat._data_dirs(table)[0]
    out = {}
    for b in os.listdir(d):
        if not b.startswith("_kb="):
            continue
        bd = os.path.join(d, b)
        out[b] = sorted(
            os.stat(os.path.join(bd, f)).st_ino
            for f in os.listdir(bd)
            if f.endswith(".parquet")
        )
    return out


def _rows_nokb(tcat, name):
    df = tcat.read(name)
    if "_kb" in df.columns:
        df = df.drop("_kb")
    return sorted(map(tuple, df.collect()))


def _kb_of(spark, keys, nb=8):
    """bucket id(s) the engine's hash assigns to literal key values."""
    return {
        r["k"]: r["b"]
        for r in spark.createDataFrame([(k,) for k in keys], "k long")
        .select("k", F.pmod(F.xxhash64("k"), F.lit(nb)).cast("int").alias("b"))
        .collect()
    }


def test_bucketed_replica_rewrites_only_touched_buckets(spark, tcat):
    """THE 100 TB write contract: after a one-key pump on an 8-bucket
    replica, every untouched bucket's files are hardlink-identical to
    the previous version (inode pin) — the pump re-stages O(touched
    buckets), not O(replica)."""
    from gcp_datalake_pipeline_spark.streaming.cdf import (
        bootstrap_changes_target,
    )

    tcat.overwrite(_src(spark, 0, 200).repartition(4), "src")
    pump_table_changes(tcat, "src", "rep")
    bootstrap_changes_target(tcat, "src", "replica", ["k"], num_buckets=8)
    before = _bucket_inodes(tcat, "replica")
    assert len(before) == 8  # 200 keys cover all buckets

    tcat.update_where("src", [("k", "=", 7)], {"amt": "12345.0"})
    out = pump_table_changes(tcat, "src", "rep", _replica_apply(tcat))
    assert out["applied"] == 2  # the delete+insert pair
    after = _bucket_inodes(tcat, "replica")
    touched = f"_kb={_kb_of(spark, [7])[7]}"
    for b in before:
        if b == touched:
            assert after[b] != before[b], "touched bucket must re-stage"
        else:
            assert after[b] == before[b], f"{b} was rewritten needlessly"
    assert _rows_nokb(tcat, "replica") == _rows(tcat, "src")
    got = {r["k"]: r["amt"] for r in tcat.read("replica").collect()}
    assert got[7] == 12345.0


def test_bucketed_replica_emptied_bucket_never_resurrects(spark, tcat):
    """Deleting a bucket's EVERY key must replace (drop) that bucket,
    not hardlink-carry its old files back in — the failure mode the
    `replaced` parameter of _write_bucketed_merge exists for."""
    from gcp_datalake_pipeline_spark.streaming.cdf import (
        bootstrap_changes_target,
    )

    tcat.overwrite(_src(spark, 0, 60), "src")
    pump_table_changes(tcat, "src", "rep")
    bootstrap_changes_target(tcat, "src", "replica", ["k"], num_buckets=8)
    # every key in bucket 3, deleted at once -> bucket 3 empties
    kb = _kb_of(spark, list(range(60)))
    doomed = sorted(k for k, b in kb.items() if b == 3)
    assert doomed, "fixture must cover bucket 3"
    tcat.delete_where("src", [("k", "in", doomed)])
    out = pump_table_changes(tcat, "src", "rep", _replica_apply(tcat))
    assert out["applied"] == len(doomed)
    assert _rows_nokb(tcat, "replica") == _rows(tcat, "src")
    assert "_kb=3" not in _bucket_inodes(tcat, "replica")
    assert tcat.read("replica").where(F.col("k").isin(doomed)).count() == 0


def test_bucketed_replica_schema_evolution_full_rewrite(spark, tcat):
    """Additive source evolution forces a one-off full rewrite (a
    hardlinked narrow-schema bucket would lose the new column on
    read), after which bounded pumps resume."""
    from gcp_datalake_pipeline_spark.streaming.cdf import (
        bootstrap_changes_target,
    )

    tcat.overwrite(_src(spark, 0, 100), "src")
    pump_table_changes(tcat, "src", "rep")
    bootstrap_changes_target(tcat, "src", "replica", ["k"], num_buckets=8)
    tcat.add_column("src", "note", "string")
    tcat.append(_src(spark, 100, 110).withColumn("note", F.lit("n")), "src")
    pump_table_changes(tcat, "src", "rep", _replica_apply(tcat))
    assert _rows_nokb(tcat, "replica") == _rows(tcat, "src")
    # the widened column is readable across EVERY bucket
    assert tcat.read("replica").where(F.col("note").isNull()).count() == 100
    # bounded pumps resume post-evolution
    before = _bucket_inodes(tcat, "replica")
    tcat.update_where("src", [("k", "=", 2)], {"note": "'touched'"})
    pump_table_changes(tcat, "src", "rep", _replica_apply(tcat))
    after = _bucket_inodes(tcat, "replica")
    untouched = [b for b in before if b != f"_kb={_kb_of(spark, [2])[2]}"]
    assert untouched and all(after[b] == before[b] for b in untouched)
    assert _rows_nokb(tcat, "replica") == _rows(tcat, "src")


def test_bucketed_apply_refuses_mismatched_keys(spark, tcat):
    from gcp_datalake_pipeline_spark.streaming.cdf import (
        bootstrap_changes_target,
    )

    tcat.overwrite(_src(spark, 0, 10), "src")
    pump_table_changes(tcat, "src", "rep")
    bootstrap_changes_target(tcat, "src", "replica", ["k"], num_buckets=8)
    tcat.append(_src(spark, 10, 12), "src")
    with pytest.raises(ValueError, match="bucketed on keys"):
        pump_table_changes(
            tcat,
            "src",
            "rep",
            lambda f: apply_changes_into(tcat, f, "replica", ["g"]),
        )


# -- SCD2 change-feed consumer (r11): history-keeping replicas ---------------


def _scd2_pump(tcat, eff):
    from gcp_datalake_pipeline_spark.streaming.cdf import apply_changes_scd2

    def apply(feed):
        return apply_changes_scd2(
            tcat, feed, "hist", ["k"], effective_ts=eff
        )

    return apply


def _hist_rows(tcat):
    df = tcat.read("hist")
    if "_kb" in df.columns:
        df = df.drop("_kb")
    return sorted(
        (r["k"], r["g"], r["amt"], str(r["valid_from"]),
         str(r["valid_to"]), r["is_current"])
        for r in df.collect()
    )


def test_scd2_consumer_tracks_update_delete_insert(spark, tcat):
    """APPLY CHANGES ... STORED AS SCD TYPE 2: an update closes the old
    image and opens the new one, a delete closes with no successor, a
    brand-new key opens — all at the pump's effective_ts, and the
    replica keeps the full history."""
    import datetime

    from gcp_datalake_pipeline_spark.streaming.cdf import (
        bootstrap_scd2_target,
    )

    t0 = datetime.datetime(2024, 1, 1)
    t1 = datetime.datetime(2024, 1, 2)
    t2 = datetime.datetime(2024, 1, 3)
    tcat.overwrite(_src(spark, 0, 6), "src")
    pump_table_changes(tcat, "src", "h")
    n = bootstrap_scd2_target(
        tcat, "src", "hist", ["k"], effective_ts=t0, num_buckets=8
    )
    assert n == 6
    # v: update k=2 (amt 3.0 -> 99.0), delete k=3, insert k=100
    tcat.update_where("src", [("k", "=", 2)], {"amt": "99.0"})
    pump_table_changes(tcat, "src", "h", _scd2_pump(tcat, t1))
    tcat.delete_where("src", [("k", "=", 3)])
    tcat.append(
        spark.createDataFrame([(100, 0, 5.0)], "k long, g long, amt double"),
        "src",
    )
    pump_table_changes(tcat, "src", "h", _scd2_pump(tcat, t2))

    rows = _hist_rows(tcat)
    by_key = {}
    for r in rows:
        by_key.setdefault(r[0], []).append(r)
    # k=2: closed old image at t1, open new image from t1
    assert by_key[2] == [
        (2, 2, 3.0, str(t0), str(t1), False),
        (2, 2, 99.0, str(t1), "None", True),
    ]
    # k=3: closed at t2, no successor
    assert by_key[3] == [(3, 3, 4.5, str(t0), str(t2), False)]
    # k=100: opened at t2
    assert by_key[100] == [(100, 0, 5.0, str(t2), "None", True)]
    # untouched keys: single open row from t0
    assert by_key[1] == [(1, 1, 1.5, str(t0), "None", True)]
    # current-state projection == the source
    cur = sorted(
        (r[0], r[1], r[2]) for r in rows if r[5]
    )
    src_now = sorted(map(tuple, tcat.read("src").collect()))
    assert cur == src_now


def test_scd2_consumer_bucket_bounded_and_unchanged_rows_pass(spark, tcat):
    """A one-key pump re-stages only that key's bucket (history and
    all); an unchanged-value rewrite (compaction-style no-op window)
    emits no new history rows."""
    import datetime

    from gcp_datalake_pipeline_spark.streaming.cdf import (
        bootstrap_scd2_target,
    )

    t0 = datetime.datetime(2024, 1, 1)
    tcat.overwrite(_src(spark, 0, 200), "src")
    pump_table_changes(tcat, "src", "h")
    bootstrap_scd2_target(
        tcat, "src", "hist", ["k"], effective_ts=t0, num_buckets=8
    )
    before = _bucket_inodes(tcat, "hist")
    assert len(before) == 8
    tcat.update_where("src", [("k", "=", 7)], {"amt": "1.25"})
    pump_table_changes(
        tcat, "src", "h",
        _scd2_pump(tcat, datetime.datetime(2024, 1, 2)),
    )
    after = _bucket_inodes(tcat, "hist")
    touched = f"_kb={_kb_of(spark, [7])[7]}"
    assert after[touched] != before[touched]
    assert all(after[b] == before[b] for b in before if b != touched)
    assert tcat.read("hist").count() == 201  # one closed + one open extra
    # compaction window: files move, no row changes -> no history rows
    tcat.compact("src", min_dirs=1)
    out = pump_table_changes(
        tcat, "src", "h",
        _scd2_pump(tcat, datetime.datetime(2024, 1, 3)),
    )
    assert tcat.read("hist").count() == 201
    # new tracked column in the feed refuses with the evolution hint
    tcat.add_column("src", "note", "string")
    tcat.append(
        _src(spark, 200, 202).withColumn("note", F.lit("x")), "src"
    )
    with pytest.raises(ValueError, match="evolve the history"):
        pump_table_changes(
            tcat, "src", "h",
            _scd2_pump(tcat, datetime.datetime(2024, 1, 4)),
        )


def test_bucketed_source_feed_kb_is_physical_not_data(spark, tcat):
    """A bucketed SOURCE's feed carries its own _kb placement column;
    consumers must treat it as physical (drop + recompute), not as a
    tracked data column — a type-1 replica and an SCD2 history both
    fold cleanly from a CLUSTERED BY source."""
    import datetime

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.streaming.cdf import (
        apply_changes_scd2,
        bootstrap_changes_target,
        bootstrap_scd2_target,
    )

    execute_dml(
        tcat,
        "CREATE TABLE bsrc (k BIGINT, v STRING) "
        "CLUSTERED BY (k) INTO 4 BUCKETS",
    )
    execute_dml(tcat, "INSERT INTO bsrc VALUES (1,'a'),(2,'b'),(3,'c')")
    pump_table_changes(tcat, "bsrc", "r1")
    pump_table_changes(tcat, "bsrc", "r2")
    bootstrap_changes_target(tcat, "bsrc", "rep", ["k"], num_buckets=8)
    bootstrap_scd2_target(
        tcat, "bsrc", "hist", ["k"],
        effective_ts=datetime.datetime(2024, 1, 1), num_buckets=8,
    )
    execute_dml(tcat, "UPDATE bsrc SET v = 'B' WHERE k = 2")
    execute_dml(tcat, "DELETE FROM bsrc WHERE k = 3")
    pump_table_changes(
        tcat, "bsrc", "r1",
        lambda f: apply_changes_into(tcat, f, "rep", ["k"]),
    )
    pump_table_changes(
        tcat, "bsrc", "r2",
        lambda f: apply_changes_scd2(
            tcat, f, "hist", ["k"],
            effective_ts=datetime.datetime(2024, 1, 2),
        ),
    )
    rep = {(r["k"], r["v"]) for r in tcat.read("rep").collect()}
    assert rep == {(1, "a"), (2, "B")}
    # no stray second _kb-ish data column anywhere
    assert tcat.read("rep").columns.count("_kb") == 1
    hist = {
        (r["k"], r["v"], r["is_current"])
        for r in tcat.read("hist").collect()
    }
    assert hist == {
        (1, "a", True),
        (2, "b", False),
        (2, "B", True),
        (3, "c", False),
    }


def test_replica_tracks_merge_on_read_source_dml(spark, tcat):
    """Composition: DELETE/UPDATE executed as deletion vectors on the
    SOURCE (zero source files rewritten) still flow through the change
    feed and fold into the replica — the consumer cannot tell (and
    must not care) which write mode the producer used."""
    _bootstrap(spark, tcat)
    tcat.delete_where("src", [("k", "<", 3)], mode="dv")
    out = pump_table_changes(tcat, "src", "rep", _replica_apply(tcat))
    assert out["applied"] == 3  # three delete rows folded
    assert _rows(tcat, "replica") == _rows(tcat, "src")
    tcat.update_where("src", [("g", "=", 2)], {"amt": "amt * 10"}, mode="dv")
    out = pump_table_changes(tcat, "src", "rep", _replica_apply(tcat))
    assert out["applied"] > 0
    assert _rows(tcat, "replica") == _rows(tcat, "src")
    # the source folds its vectors later; the pump sees a compaction
    # window (net row change zero) and applies nothing new
    assert tcat.compact("src", min_dirs=1)
    out = pump_table_changes(tcat, "src", "rep", _replica_apply(tcat))
    assert _rows(tcat, "replica") == _rows(tcat, "src")
