"""Change Data Feed (``table_changes``) — row-level diffs between
snapshots, recovered from the versioned manifests.

Contract under test (the Delta CDF analog without runtime capture):

- appends feed as pure inserts, DELETEs as deletes, UPDATEs as their
  delete+insert pair, each tagged with the commit that published it;
- I/O is bounded to the CHANGED files: hardlink-carried files match by
  inode and are never read (asserted via ``inputFiles()``);
- a compaction (all files rewritten, nothing changed) yields an EMPTY
  feed; untouched-commit versions contribute nothing;
- schema evolution mid-range null-fills the missing columns; a type
  conflict across the range refuses loudly;
- vacuumed version manifests and never-existed tables raise clean
  errors.
"""

import os

import pytest
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog


@pytest.fixture()
def tcat(spark, tmp_path):
    return TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))


def _base(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    )


def _summary(ch):
    return sorted(
        (r["_commit_version"], r["_change_type"], r["n"])
        for r in ch.groupBy("_commit_version", "_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )


def test_append_delete_update_feed(spark, tcat):
    tcat.overwrite(_base(spark).repartition(4), "t")           # v1
    tcat.append(
        spark.range(100, 120).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("g")
        ),
        "t",
    )                                                          # v2
    assert tcat.delete_where("t", [("k", "=", 7)]) == 1        # v3
    assert tcat.update_where("t", [("k", "=", 8)], {"g": "g + 100"}) == 1
    ch = tcat.table_changes("t", 1)
    assert _summary(ch) == [
        (2, "insert", 20),
        (3, "delete", 1),
        (4, "delete", 1),
        (4, "insert", 1),
    ]
    # the update pair carries the before/after values
    pair = {
        (r["_change_type"], r["g"])
        for r in ch.where(
            (F.col("_commit_version") == 4) & (F.col("k") == 8)
        ).collect()
    }
    assert pair == {("delete", 3), ("insert", 103)}
    # sub-ranges slice the same history
    assert _summary(tcat.table_changes("t", 1, 2)) == [(2, "insert", 20)]
    assert _summary(tcat.table_changes("t", 2, 3)) == [(3, "delete", 1)]
    assert tcat.table_changes("t", 4).count() == 0  # empty tail range


def test_feed_io_bounded_to_changed_files(spark, tcat):
    tcat.overwrite(_base(spark, 1000).repartition(6), "t")     # v1
    tcat.append(
        spark.range(1000, 1010).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("g")
        ).coalesce(1),
        "t",
    )                                                          # v2
    feed = tcat.table_changes("t", 1, 2)
    # the append published exactly the new dir's files; the 6 carried
    # files must not appear in the plan
    read = {os.path.realpath(p.replace("file:", "")) for p in feed.inputFiles()}
    v1_inos = {i for i, _d, _f in tcat._version_file_inodes("t", 1)}
    appended = {
        os.path.realpath(os.path.join(d, f))
        for i, d, f in tcat._version_file_inodes("t", 2)
        if i not in v1_inos
    }
    assert read == appended and len(appended) == 1


def test_compaction_feeds_empty(spark, tcat):
    tcat.overwrite(_base(spark).repartition(3), "t")
    tcat.append(_base(spark).limit(0), "t")  # second dir (empty)
    v = tcat.versions()[-1]["version"]
    assert tcat.compact("t", min_dirs=1, cluster_by=["k"])
    assert tcat.table_changes("t", v).count() == 0


def test_untouched_commits_contribute_nothing(spark, tcat):
    tcat.overwrite(_base(spark), "t")                          # v1
    tcat.overwrite(_base(spark, 10), "other")                  # v2: other table
    tcat.add_check("t", "k_pos", "k >= 0")                     # v3: metadata
    ch = tcat.table_changes("t", 1)
    assert ch.count() == 0


def test_schema_evolution_null_fills(spark, tcat):
    tcat.overwrite(_base(spark, 10), "t")                      # v1
    tcat.add_column("t", "score", "double")                    # v2
    tcat.append(
        spark.range(10, 12).select(
            F.col("id").alias("k"),
            (F.col("id") % 5).alias("g"),
            F.lit(1.5).alias("score"),
        ),
        "t",
    )                                                          # v3
    ch = tcat.table_changes("t", 1)
    rows = {(r["k"], r["score"]) for r in ch.collect()}
    assert rows == {(10, 1.5), (11, 1.5)}
    # ...and the feed schema carries the evolved column even for the
    # range before it existed
    assert "score" in tcat.table_changes("t", 1, 2).columns


def test_table_created_and_dropped_inside_range(spark, tcat):
    tcat.overwrite(_base(spark, 5), "anchor")                  # v1
    tcat.overwrite(_base(spark, 7), "t")                       # v2
    tcat.drop_table("t")                                       # v3
    ch = tcat.table_changes("t", 1)
    assert _summary(ch) == [(2, "insert", 7), (3, "delete", 7)]
    with pytest.raises(FileNotFoundError, match="did not exist"):
        tcat.table_changes("never", 1)


def test_vacuumed_manifest_raises(spark, tcat):
    tcat.overwrite(_base(spark, 5), "t")
    for i in range(4):
        tcat.append(_base(spark, 1), "t")
    tcat.vacuum(retain_versions=1, min_age_seconds=0)
    with pytest.raises(FileNotFoundError, match="no retained snapshot"):
        tcat.table_changes("t", 1)


def test_bad_range_and_conflicting_types(spark, tcat):
    tcat.overwrite(_base(spark, 5), "t")
    with pytest.raises(ValueError, match="from_version"):
        tcat.table_changes("t", 3, 1)
    # a type-changing overwrite makes the feed ill-defined -> refuse
    tcat.overwrite(
        spark.range(3).select(
            F.col("id").cast("string").alias("k"),
            (F.col("id") % 5).alias("g"),
        ),
        "t",
    )
    with pytest.raises(ValueError, match="type"):
        tcat.table_changes("t", 1).collect()


def test_reserved_commit_version_column_refused(spark, tcat):
    """_commit_version is stamped onto every feed row just like
    _change_type; a user column of that name would be silently
    overwritten (r10 self-review #7) — both reserved names refuse."""
    df = spark.range(5).select(
        F.col("id").alias("k"), F.col("id").alias("_commit_version")
    )
    tcat.overwrite(df, "t")
    tcat.append(df, "t")
    with pytest.raises(ValueError, match="_commit_version"):
        tcat.table_changes("t", 1)


def test_source_moved_idle_probe_is_o1(spark, tcat):
    """A consumer resuming across N idle commits must answer the
    did-anything-move probe from ONE manifest read (the ``moved``
    checkpoint map maintained by every commit), not a JSON read per
    version — Delta checkpoints its log for the same reason."""
    tcat.overwrite(_base(spark, 10), "t")          # v1: t created
    tcat.overwrite(spark.range(3).toDF("x"), "other")  # v2
    # 40 idle-for-t commits (metadata + other-table data)
    for i in range(20):
        tcat.add_check("other", f"c{i}", "x IS NOT NULL")
        tcat.append(spark.range(1).toDF("x"), "other")
    cur = tcat._read_manifest(strict=False)["version"]
    assert cur >= 42

    calls = {"n": 0}
    real = tcat._version_manifest

    def counting(v):
        calls["n"] += 1
        return real(v)

    tcat._version_manifest = counting
    try:
        assert tcat.source_moved("t", 1, cur) is False
        assert calls["n"] == 1  # O(1): the window-end manifest only
        calls["n"] = 0
        assert tcat.source_moved("other", 1, cur) is True
        assert calls["n"] == 1
    finally:
        tcat._version_manifest = real

    # the checkpoint answer stays exact across vacuumed windows: drop
    # the intermediate version manifests, probe still answers False
    # (the linear walk would have had to say True conservatively)
    tcat.vacuum(retain_versions=1)
    assert tcat.source_moved("t", 1, cur) is False
    assert tcat.source_moved("t", 0, cur) is True  # creation is a move

    # fallback path: a window-end manifest WITHOUT the map (pre-upgrade
    # catalog) falls back to the linear walk
    import json as _json
    import os as _os

    vpath = _os.path.join(tcat.root, "_versions", f"{cur}.json")
    vm = _json.load(open(vpath))
    vm.pop("moved")
    _json.dump(vm, open(vpath, "w"))
    assert tcat.source_moved("t", 1, cur) is True  # vacuumed => conservative


def test_keyed_feed_relabels_update_pairs(spark, tcat):
    """key_cols turns same-key delete+insert pairs WITHIN one commit
    into update_preimage/update_postimage; lone inserts/deletes keep
    their labels; pairs across DIFFERENT commits never pair."""
    tcat.overwrite(_base(spark).repartition(4), "t")                # v1
    tcat.update_where("t", [("k", "=", 8)], {"g": "g + 100"})       # v2
    tcat.append(
        spark.range(100, 105).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("g")
        ),
        "t",
    )                                                               # v3
    tcat.delete_where("t", [("k", "=", 7)])                         # v4
    # delete at v5 + re-insert at v6: SEPARATE commits stay honest
    tcat.delete_where("t", [("k", "=", 9)])                         # v5
    tcat.append(
        spark.createDataFrame([(9, 77)], "k long, g long"), "t"
    )                                                               # v6
    ch = tcat.table_changes("t", 1, key_cols=["k"])
    got = sorted(
        (r["_commit_version"], r["_change_type"], r["n"])
        for r in ch.groupBy("_commit_version", "_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert got == [
        (2, "update_postimage", 1),
        (2, "update_preimage", 1),
        (3, "insert", 5),
        (4, "delete", 1),
        (5, "delete", 1),
        (6, "insert", 1),
    ]
    # the pre/post rows carry the actual before/after values
    pair = {
        r["_change_type"]: r["g"]
        for r in ch.where(F.col("k") == 8).collect()
    }
    assert pair == {"update_preimage": 3, "update_postimage": 103}
    # unknown key column refuses
    with pytest.raises(ValueError, match="key_cols"):
        tcat.table_changes("t", 1, key_cols=["ghost"])


def test_keyed_feed_key_column_rewrite_stays_delete_insert(spark, tcat):
    """Changing the KEY ITSELF in one commit is a delete of the old
    key + insert of the new — no false pairing."""
    tcat.overwrite(_base(spark, 10), "t")                           # v1
    tcat.update_where("t", [("k", "=", 3)], {"k": "300"})           # v2
    ch = tcat.table_changes("t", 1, key_cols=["k"])
    got = {(r["k"], r["_change_type"]) for r in ch.collect()}
    assert got == {(3, "delete"), (300, "insert")}


def test_keyed_feed_duplicate_keys_all_relabel(spark, tcat):
    """Duplicate-key tables: every delete of the key in the commit
    becomes a preimage and every insert a postimage (documented
    caller-keyed semantics)."""
    dup = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20)], "k long, v long"
    )
    tcat.overwrite(dup, "t")                                        # v1
    tcat.update_where("t", [("k", "=", 1)], {"v": "v + 5"})         # v2
    ch = tcat.table_changes("t", 1, key_cols=["k"])
    got = sorted((r["_change_type"], r["v"]) for r in ch.collect())
    assert got == [
        ("update_postimage", 15),
        ("update_postimage", 16),
        ("update_preimage", 10),
        ("update_preimage", 11),
    ]


def test_keyed_feed_composes_with_appliers(spark, tcat):
    """A feed built with key_cols (update_pre/postimage labels) folds
    through apply_changes_into identically to the plain feed — the
    postimage is the key's new image, never a deletion (review r11 #2)."""
    from gcp_datalake_pipeline_spark.streaming.cdf import apply_changes_into

    tcat.overwrite(_base(spark, 20), "t")                        # v1
    tcat.update_where("t", [("k", "=", 3)], {"g": "g + 100"})    # v2
    tcat.delete_where("t", [("k", "=", 5)])                      # v3
    for variant, kc in (("plain", None), ("keyed", ["k"])):
        feed = tcat.table_changes("t", 1, key_cols=kc)
        apply_changes_into(tcat, feed, f"rep_{variant}", ["k"])
    a = sorted(map(tuple, tcat.read("rep_plain").collect()))
    b = sorted(map(tuple, tcat.read("rep_keyed").collect()))
    assert a == b
    got = {r["k"]: r["g"] for r in tcat.read("rep_keyed").collect()}
    assert got[3] == 103 and 5 not in got


def test_feed_across_rename_opt_in(spark, tcat):
    """A window crossing ALTER TABLE RENAME TO refuses by default
    (name-keyed identity), and follows the manifest's renamed[new]=old
    lineage with follow_renames=True: each commit's diff reads under
    the name the table bore THEN, the rename commit itself contributes
    nothing, and a double rename chains."""
    tcat.overwrite(_base(spark, 50), "a")
    v0 = tcat._read_manifest(strict=False)["version"]
    tcat.delete_where("a", [("k", "<", 10)])
    tcat.rename_table("a", "b")
    tcat.append(_base(spark, 20).withColumn("k", F.col("k") + 100), "b")
    tcat.rename_table("b", "c")
    tcat.delete_where("c", [("k", "=", 110)])
    v1 = tcat._read_manifest(strict=False)["version"]

    with pytest.raises(ValueError, match="follow_renames"):
        tcat.table_changes("c", v0, v1).count()

    feed = tcat.table_changes("c", v0, v1, follow_renames=True)
    got = sorted(
        (r["_change_type"], r["n"])
        for r in feed.groupBy("_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert got == [("delete", 11), ("insert", 20)]
    # replaying the feed over the v0 snapshot reconstructs the table
    net = (
        tcat.read_at("a", v0)
        .withColumn("_w", F.lit(1))
        .unionByName(
            feed.select(
                "k", "g",
                F.when(F.col("_change_type") == "insert", 1)
                .otherwise(-1)
                .alias("_w"),
            )
        )
        .groupBy("k", "g")
        .agg(F.sum("_w").alias("w"))
        .where(F.col("w") > 0)
    )
    assert sorted(
        (r["k"], r["g"]) for r in net.select("k", "g").collect()
    ) == sorted(
        (r["k"], r["g"]) for r in tcat.read("c").collect()
    )
    # windows entirely after the last rename never consult the lineage
    assert (
        tcat.table_changes("c", v1 - 1, v1, follow_renames=True).count()
        == tcat.table_changes("c", v1 - 1, v1).count()
    )


def test_followed_feed_refuses_across_a_broken_lineage(spark, tcat):
    """DROP after a rename removes the lineage marker; a followed
    window crossing that commit must refuse cleanly, never KeyError
    or silently bridge two identities (round-12 self-review #1)."""
    tcat.overwrite(_base(spark, 10), "a")
    v0 = tcat._read_manifest(strict=False)["version"]
    tcat.rename_table("a", "b")
    tcat.drop_table("b")
    tcat.overwrite(_base(spark, 3), "b")  # a NEW identity, same name
    v1 = tcat._read_manifest(strict=False)["version"]
    with pytest.raises(ValueError, match="lineage marker"):
        tcat.table_changes("b", v0, v1, follow_renames=True).count()


# -- consumers following the rename lineage (r13) ------------------------------


def test_pump_follows_rename(spark, tcat):
    """A follow_renames consumer survives ALTER TABLE ... RENAME TO:
    rename_table no longer refuses, the next pump crosses the rename
    commit, folds the post-rename changes, and carries the watermark
    onto the new name — by either the old or the new source name."""
    from gcp_datalake_pipeline_spark.streaming.cdf import (
        apply_changes_into,
        bootstrap_changes_target,
        pump_table_changes,
    )

    tcat.overwrite(_base(spark, 20), "src")
    v0 = tcat._read_manifest(strict=False)["version"]
    bootstrap_changes_target(tcat, "src", "rep", ["k"], num_buckets=4)
    pump_table_changes(
        tcat, "src", "cons", start_version=v0, follow_renames=True
    )
    apply = lambda feed: apply_changes_into(tcat, feed, "rep", ["k"])  # noqa: E731
    # a non-opted consumer on the same source still BLOCKS the rename
    pump_table_changes(tcat, "src", "strict", start_version=v0)
    with pytest.raises(ValueError, match="strict"):
        tcat.rename_table("src", "src2")
    # drop the strict consumer (metadata) and rename
    def drop(m):
        m["streams"].pop("strict")
    tcat._publish_meta(drop, "drop-strict")
    tcat.rename_table("src", "src2")
    tcat.append(
        spark.createDataFrame([(1000, 0)], "k long, g long"), "src2"
    )
    tcat.delete_where("src2", [("k", "=", 3)])
    # pump by the OLD name: resolves, crosses, applies
    out = pump_table_changes(tcat, "src", "cons", apply)
    assert out["source"] == "src2" and out["applied"] > 0
    got = {r["k"] for r in tcat.read("rep").select("k").collect()}
    assert 1000 in got and 3 not in got and 2 in got
    # watermark carried onto the new name
    wm = tcat.stream_watermark("cons")
    assert wm["source"] == "src2" and wm["follow_renames"] is True
    # a second rename: pump by the NEW name works too
    tcat.rename_table("src2", "src3")
    tcat.append(
        spark.createDataFrame([(2000, 0)], "k long, g long"), "src3"
    )
    out = pump_table_changes(tcat, "src3", "cons", apply)
    assert out["source"] == "src3" and out["applied"] > 0
    assert tcat.read("rep").where(F.col("k") == 2000).count() == 1
    # a WRONG name still refuses
    tcat.overwrite(_base(spark, 3), "unrelated")
    with pytest.raises(ValueError, match="registered on source"):
        pump_table_changes(tcat, "unrelated", "cons", apply)


def test_scd2_pump_follows_rename(spark, tcat):
    """The SCD2 consumer rides the same pump: history keeps growing
    across the source rename."""
    from gcp_datalake_pipeline_spark.streaming.cdf import (
        apply_changes_scd2,
        bootstrap_scd2_target,
        pump_table_changes,
    )

    tcat.overwrite(_base(spark, 5), "s")
    v0 = tcat._read_manifest(strict=False)["version"]
    bootstrap_scd2_target(tcat, "s", "hist", ["k"], num_buckets=4)
    pump_table_changes(
        tcat, "s", "h", start_version=v0, follow_renames=True
    )
    tcat.rename_table("s", "s2")
    tcat.update_where("s2", [("k", "=", 1)], {"g": "77"})
    out = pump_table_changes(
        tcat, "s2", "h",
        lambda feed: apply_changes_scd2(tcat, feed, "hist", ["k"]),
    )
    assert out["applied"] > 0
    rows = tcat.read("hist").where(F.col("k") == 1).collect()
    assert {r["g"] for r in rows} == {1, 77}
    assert sum(1 for r in rows if r["is_current"]) == 1
