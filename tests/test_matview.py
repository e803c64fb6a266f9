"""Incrementally maintained materialized views over the change feed.

Contract under test:

- INVARIANT: after ANY DML sequence on the source (append, delete,
  update, whole-group delete, compaction), refresh == full recompute;
- refresh cost is O(changes): the merge plan never reads the source's
  unchanged files (``inputFiles`` pin), and an untouched source is a
  zero-job, zero-commit no-op;
- the spec + watermark commit atomically WITH the view data (a crash
  can never double-apply a feed); they ride clones and restores;
- NULL group keys stay one group across refreshes (the null-safe merge);
- unmaintainable aggregates (MIN/MAX), shape violations, and name
  collisions refuse at create time with the shape in the message.
"""

import os

import pytest
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators.matview import (
    create_materialized_view,
    drop_materialized_view,
    parse_matview_select,
    refresh_materialized_view,
)
from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog


@pytest.fixture()
def tcat(spark, tmp_path):
    return TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))


def _fact(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("g"),
        (F.col("id") * 1.5).alias("amt"),
    )


def _view_rows(tcat, name="v"):
    df = tcat.read(name)
    if "_kb" in df.columns:  # the physical bucket-layout column
        df = df.drop("_kb")
    return sorted(map(tuple, df.collect()))


def _recompute(tcat, src="fact"):
    return sorted(
        map(
            tuple,
            tcat.read(src)
            .groupBy("g")
            .agg(F.sum("amt").alias("total"), F.count("*").alias("n"))
            .collect(),
        )
    )


def test_refresh_equals_full_recompute_under_dml(spark, tcat):
    tcat.overwrite(_fact(spark, 0, 100).repartition(4), "fact")
    out = create_materialized_view(
        tcat, "v", "fact", ["g"], {"total": "amt"}, "n"
    )
    assert out["groups"] == 4
    tcat.append(_fact(spark, 100, 130), "fact")
    assert tcat.delete_where("fact", [("k", "<", 8)]) == 8
    assert tcat.update_where("fact", [("k", "=", 64)], {"amt": "amt + 500"})
    out = refresh_materialized_view(tcat, "v")
    assert out["applied"] > 0
    assert _view_rows(tcat) == _recompute(tcat)
    # whole-group delete -> the group's row disappears at count zero
    tcat.delete_where("fact", [("g", "=", 2)])
    refresh_materialized_view(tcat, "v")
    assert _view_rows(tcat) == _recompute(tcat)
    assert len(_view_rows(tcat)) == 3
    # compaction (all files rewritten, no logical change) -> values hold
    assert tcat.compact("fact", min_dirs=1, cluster_by=["k"])
    refresh_materialized_view(tcat, "v")
    assert _view_rows(tcat) == _recompute(tcat)


def test_refresh_io_bounded_and_noop_is_free(spark, tcat):
    tcat.overwrite(_fact(spark, 0, 1000).repartition(6), "fact")
    create_materialized_view(tcat, "v", "fact", ["g"], {"total": "amt"}, "n")
    v_before = tcat.versions()[-1]["version"]
    # untouched source: no Spark job, no commit, watermark unchanged
    out = refresh_materialized_view(tcat, "v")
    assert out == {"view": "v", "as_of": out["as_of"], "applied": 0}
    assert tcat.versions()[-1]["version"] == v_before
    # an append's refresh must not read the source's carried files
    v1_inos = {i for i, _d, _f in tcat._version_file_inodes("fact", 1)}
    tcat.append(_fact(spark, 1000, 1010).coalesce(1), "fact")
    spec = tcat.view_spec("v")
    feed = tcat.table_changes("fact", spec["as_of"])
    read = {
        os.path.realpath(p.replace("file:", ""))
        for p in feed.inputFiles()
    }
    carried = {
        os.path.realpath(os.path.join(d, f))
        for i, d, f in tcat._version_file_inodes(
            "fact", tcat.versions()[-1]["version"]
        )
        if i in v1_inos
    }
    assert not (read & carried)
    refresh_materialized_view(tcat, "v")
    assert _view_rows(tcat) == _recompute(tcat)


def test_null_group_keys_stay_one_group(spark, tcat):
    rows = spark.createDataFrame(
        [(1, None, 10.0), (2, None, 20.0), (3, "a", 5.0)],
        "k long, g string, amt double",
    )
    tcat.overwrite(rows, "fact")
    create_materialized_view(tcat, "v", "fact", ["g"], {"total": "amt"}, "n")
    tcat.append(
        spark.createDataFrame(
            [(4, None, 30.0)], "k long, g string, amt double"
        ),
        "fact",
    )
    refresh_materialized_view(tcat, "v")
    got = {
        tuple(r) for r in tcat.read("v").drop("_kb").collect()
    }
    assert len(got) == 2  # the NULL group did not split
    assert (None, 60.0, 3) in got


def test_watermark_rides_clone_and_restore(spark, tcat, tmp_path):
    tcat.overwrite(_fact(spark, 0, 50), "fact")
    create_materialized_view(tcat, "v", "fact", ["g"], {"total": "amt"}, "n")
    v_created = tcat.versions()[-1]["version"]
    clone = tcat.clone_to(str(tmp_path / "branch"))
    assert clone.view_spec("v") == tcat.view_spec("v")
    # diverge the clone independently
    clone.append(_fact(spark, 50, 60), "fact")
    refresh_materialized_view(clone, "v")
    assert _view_rows(clone) == _recompute(clone)
    # whole-catalog restore brings back spec AND watermark of that time
    tcat.append(_fact(spark, 50, 70), "fact")
    refresh_materialized_view(tcat, "v")
    wm_after = tcat.view_spec("v")["as_of"]
    tcat.restore(v_created)
    assert tcat.view_spec("v")["as_of"] < wm_after
    # the restored watermark matches the restored data: refresh against
    # post-restore appends stays consistent
    tcat.append(_fact(spark, 70, 80), "fact")
    refresh_materialized_view(tcat, "v")
    assert _view_rows(tcat) == _recompute(tcat)


def test_drop_and_refusals(spark, tcat):
    tcat.overwrite(_fact(spark, 0, 10), "fact")
    create_materialized_view(tcat, "v", "fact", ["g"], {"total": "amt"}, "n")
    drop_materialized_view(tcat, "v")
    assert tcat.view_spec("v") is None and not tcat.exists("v")
    with pytest.raises(FileNotFoundError):
        refresh_materialized_view(tcat, "v")
    with pytest.raises(FileNotFoundError):
        drop_materialized_view(tcat, "v")
    # name collisions and bad specs refuse at create
    create_materialized_view(tcat, "v", "fact", ["g"], {"total": "amt"}, "n")
    with pytest.raises(ValueError, match="already exists"):
        create_materialized_view(
            tcat, "v", "fact", ["g"], {"total": "amt"}, "n"
        )
    with pytest.raises(ValueError, match="collision"):
        create_materialized_view(
            tcat, "v2", "fact", ["g"], {"g": "amt"}, "n"
        )
    with pytest.raises(ValueError, match="at least one"):
        create_materialized_view(tcat, "v3", "fact", [], {"t": "amt"}, "n")


def test_parse_matview_select():
    src, keys, sums, n, mins, maxs = parse_matview_select(
        "SELECT g, h, SUM(amt) AS total, SUM(qty) AS q, COUNT(*) AS n "
        "FROM fact GROUP BY g, h"
    )
    assert (src, keys, n) == ("fact", ["g", "h"], "n")
    assert sums == {"total": "amt", "q": "qty"}
    assert mins == {} and maxs == {}
    src, keys, sums, n, mins, maxs = parse_matview_select(
        "SELECT g, SUM(amt) AS total, MIN(amt) AS lo, MAX(qty) AS hi, "
        "COUNT(*) AS n FROM fact GROUP BY g"
    )
    assert mins == {"lo": "amt"} and maxs == {"hi": "qty"}
    for bad in (
        "SELECT g, AVG(amt) AS a, COUNT(*) AS n FROM fact GROUP BY g",
        "SELECT g, SUM(amt) AS t FROM fact GROUP BY g",  # no COUNT(*)
        "SELECT g, SUM(amt) AS t, COUNT(*) AS n FROM fact GROUP BY h",
        "SELECT g, SUM(amt+1) AS t, COUNT(*) AS n FROM fact GROUP BY g",
        "SELECT g, MIN(amt+1) AS lo, COUNT(*) AS n FROM fact GROUP BY g",
    ):
        with pytest.raises(ValueError):
            parse_matview_select(bad)


def test_sql_facade_matview_lifecycle(spark, tcat):
    from gcp_datalake_pipeline_spark.dml_sql import execute_dml

    tcat.overwrite(_fact(spark, 0, 40), "fact")
    out = execute_dml(
        tcat,
        "CREATE MATERIALIZED VIEW v AS SELECT g, SUM(amt) AS total, "
        "COUNT(*) AS n FROM fact GROUP BY g",
    )
    assert out["view"] == "v" and out["groups"] == 4
    execute_dml(tcat, "DELETE FROM fact WHERE k < 4")
    out = execute_dml(tcat, "REFRESH MATERIALIZED VIEW v")
    assert out["applied"] > 0
    assert _view_rows(tcat) == _recompute(tcat)
    assert execute_dml(tcat, "DROP MATERIALIZED VIEW v") == {
        "view": "v",
        "dropped": True,
    }
    # MIN/MAX views ride the SQL front door too, and converge under a
    # later delete (the bucket-scoped recompute path)
    execute_dml(
        tcat,
        "CREATE MATERIALIZED VIEW v AS SELECT g, MAX(amt) AS hi, "
        "COUNT(*) AS n FROM fact GROUP BY g",
    )
    execute_dml(tcat, "DELETE FROM fact WHERE amt > 50")
    assert execute_dml(tcat, "REFRESH MATERIALIZED VIEW v")["applied"] > 0
    got = sorted(
        map(tuple, tcat.read("v").select("g", "n", "hi").collect())
    )
    want = sorted(
        map(
            tuple,
            tcat.read("fact")
            .groupBy("g")
            .agg(F.count("*").alias("n"), F.max("amt").alias("hi"))
            .collect(),
        )
    )
    assert got == want


def test_direct_writes_to_matview_refused(spark, tcat):
    """Every content-mutating verb against a registered materialized
    view refuses loudly: a direct write would desync the stored
    partials and every later REFRESH would merge correct deltas into a
    corrupted base (r10 self-review #3). DROP TABLE refuses too (it
    would orphan the spec); DROP MATERIALIZED VIEW is the exit."""
    from gcp_datalake_pipeline_spark.dml_sql import execute_dml

    tcat.overwrite(_fact(spark, 0, 40), "fact")
    execute_dml(
        tcat,
        "CREATE MATERIALIZED VIEW v AS SELECT g, SUM(amt) AS total, "
        "COUNT(*) AS n FROM fact GROUP BY g",
    )
    for stmt in (
        "INSERT INTO v VALUES (9, 1.0, 1)",
        "INSERT OVERWRITE v SELECT g, total, n FROM parquet.`x`",
        "DELETE FROM v WHERE g = 1",
        "UPDATE v SET n = 0 WHERE g = 1",
        "MERGE INTO v USING fact ON g",
        "TRUNCATE TABLE v",
        "DROP TABLE v",
    ):
        with pytest.raises(ValueError, match="materialized view"):
            execute_dml(tcat, stmt)
    # the view is untouched and still refreshes to the recompute
    execute_dml(tcat, "DELETE FROM fact WHERE k < 4")
    execute_dml(tcat, "REFRESH MATERIALIZED VIEW v")
    assert _view_rows(tcat) == _recompute(tcat)
    # source tables are unaffected by the guard
    assert execute_dml(tcat, "DELETE FROM fact WHERE k = 5")["deleted"] == 1


def test_spark_refresh_statements_pass_through(spark, tcat):
    """Spark's own REFRESH TABLE / REFRESH FUNCTION are not ours: the
    facade returns None so the caller sends them to spark.sql (r10
    self-review #6 — the refusal tail must match only REFRESH
    MATERIALIZED)."""
    from gcp_datalake_pipeline_spark.dml_sql import execute_dml

    assert execute_dml(tcat, "REFRESH TABLE some_view") is None
    assert execute_dml(tcat, "REFRESH FUNCTION f") is None
    with pytest.raises(ValueError, match="unsupported DML shape"):
        execute_dml(tcat, "REFRESH MATERIALIZED VIEW")  # malformed: ours


def test_zero_delta_mark_is_expect_checked(spark, tcat):
    """The zero-delta watermark advance (compaction moved the source's
    dir list, no net rows) must conflict-check the view's as_of like
    every other watermark fold: a racing refresh that advanced (or
    dropped) the view concurrently would otherwise be silently
    regressed and the next refresh would double-apply its window."""
    from gcp_datalake_pipeline_spark.transactions import ConcurrentWriteError

    tcat.overwrite(_fact(spark, 0, 40).repartition(4), "fact")
    create_materialized_view(tcat, "v", "fact", ["g"], {"total": "amt"}, "n")
    # compaction: dir list moves, zero net row changes -> mark() path
    assert tcat.compact("fact", min_dirs=1)
    real = tcat._publish_meta
    fired = {"n": 0}

    def racing(mutate, load_id):
        if load_id.startswith("matview-mark-") and fired["n"] == 0:
            fired["n"] += 1
            v_now = tcat._read_manifest(strict=False)["version"]

            def bump(m):
                m["views"]["v"] = {**m["views"]["v"], "as_of": v_now}

            real(bump, "racing-refresh")
        real(mutate, load_id)

    tcat._publish_meta = racing
    try:
        with pytest.raises(ConcurrentWriteError, match="refreshed or dropped"):
            refresh_materialized_view(tcat, "v")
    finally:
        tcat._publish_meta = real
    # a clean retry from a fresh read converges (the racer had already
    # advanced past the compaction window)
    out = refresh_materialized_view(tcat, "v")
    assert out["applied"] == 0
    assert _view_rows(tcat) == _recompute(tcat)


# -- bucket-bounded refresh (r11): rewrites only affected groups' buckets ----


def _bucket_inodes(cat, table):
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


def _g_bucket(spark, gs, nb=8):
    return {
        r["g"]: r["b"]
        for r in spark.createDataFrame([(g,) for g in gs], "g long")
        .select("g", F.pmod(F.xxhash64("g"), F.lit(nb)).cast("int").alias("b"))
        .collect()
    }


def _wide_fact(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 32).alias("g"),
        (F.col("id") * 1.5).alias("amt"),
    )


def test_bucketed_view_refresh_rewrites_only_affected_buckets(spark, tcat):
    """THE 100 TB refresh contract: a one-group change window re-stages
    only the bucket holding that group; every other bucket's files are
    hardlink-identical across the refresh (inode pin)."""
    tcat.overwrite(_wide_fact(spark, 0, 640), "fact")
    create_materialized_view(
        tcat, "v", "fact", ["g"], {"total": "amt"}, "n", num_buckets=8
    )
    before = _bucket_inodes(tcat, "v")
    assert len(before) == 8  # 32 groups cover all 8 buckets

    tcat.update_where("fact", [("k", "=", 5)], {"amt": "999.0"})  # group 5
    out = refresh_materialized_view(tcat, "v")
    assert out["applied"] == 1  # one affected group's signed delta
    after = _bucket_inodes(tcat, "v")
    touched = f"_kb={_g_bucket(spark, [5])[5]}"
    for b in before:
        if b == touched:
            assert after[b] != before[b], "affected bucket must re-stage"
        else:
            assert after[b] == before[b], f"{b} was rewritten needlessly"
    assert _view_rows(tcat) == _recompute(tcat)


def test_bucketed_view_emptied_bucket_drops(spark, tcat):
    """Deleting every row of every group in one bucket must drop that
    bucket's partition — not hardlink its stale partials back in."""
    tcat.overwrite(_wide_fact(spark, 0, 640), "fact")
    create_materialized_view(
        tcat, "v", "fact", ["g"], {"total": "amt"}, "n", num_buckets=8
    )
    gb = _g_bucket(spark, list(range(32)))
    doomed = sorted(g for g, b in gb.items() if b == 3)
    assert doomed, "fixture must cover bucket 3"
    tcat.delete_where("fact", [("g", "in", doomed)])
    out = refresh_materialized_view(tcat, "v")
    assert out["applied"] == len(doomed)
    assert "_kb=3" not in _bucket_inodes(tcat, "v")
    assert _view_rows(tcat) == _recompute(tcat)
    # and the view still refreshes normally afterwards
    tcat.append(_wide_fact(spark, 640, 680), "fact")
    refresh_materialized_view(tcat, "v")
    assert _view_rows(tcat) == _recompute(tcat)


def test_unbucketed_view_opt_out(spark, tcat):
    """num_buckets=None keeps the simple whole-table layout (no _kb
    column) for tiny views; refresh still converges."""
    tcat.overwrite(_fact(spark, 0, 40), "fact")
    create_materialized_view(
        tcat, "v", "fact", ["g"], {"total": "amt"}, "n", num_buckets=None
    )
    assert "_kb" not in tcat.read("v").columns
    tcat.delete_where("fact", [("k", "<", 8)])
    refresh_materialized_view(tcat, "v")
    assert _view_rows(tcat) == _recompute(tcat)


def test_view_column_named_kb_refused(spark, tcat):
    tcat.overwrite(
        _fact(spark, 0, 8).withColumnRenamed("g", "_kb"), "fact2"
    )
    # a BUCKETED view grouped by the source's _kb would reuse the
    # layout column for two meanings — refused with the exit named
    with pytest.raises(ValueError, match="num_buckets=None"):
        create_materialized_view(
            tcat, "v2", "fact2", ["_kb"], {"total": "amt"}, "n"
        )
    # an _kb OUTPUT column is refused outright
    with pytest.raises(ValueError, match="reserved bucket-layout"):
        create_materialized_view(
            tcat, "v2", "fact2", ["amt"], {"_kb": "amt"}, "n",
            num_buckets=None,
        )
    # unbucketed, the per-source-bucket dashboard is legitimate
    create_materialized_view(
        tcat, "v2", "fact2", ["_kb"], {"total": "amt"}, "n",
        num_buckets=None,
    )
    got = {
        (r["_kb"], r["n"]) for r in tcat.read("v2").collect()
    }
    want = {
        (r["_kb"], r["n"])
        for r in tcat.read("fact2")
        .groupBy("_kb")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


# -- MIN/MAX under insert-only sources (r11) ----------------------------------


def test_insert_only_minmax_view_tracks_appends(spark, tcat):
    """Under pure appends MIN/MAX partials stay exact: refresh == full
    recompute including the extremes, and new-in-delta groups appear."""
    tcat.overwrite(_fact(spark, 0, 40), "fact")
    create_materialized_view(
        tcat, "v", "fact", ["g"], {"total": "amt"}, "n",
        mins={"lo": "amt"}, maxs={"hi": "amt"}, insert_only=True,
        num_buckets=8,
    )
    tcat.append(_fact(spark, 40, 100), "fact")
    # a brand-new group too
    tcat.append(
        spark.createDataFrame([(999, 7, -3.5)], "k long, g long, amt double"),
        "fact",
    )
    out = refresh_materialized_view(tcat, "v")
    assert out["applied"] > 0
    expect = sorted(
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
    assert _view_rows(tcat) == expect
    # idle catch-up refresh is a no-op
    assert refresh_materialized_view(tcat, "v")["applied"] == 0


def _minmax_recompute(tcat, src="fact"):
    return sorted(
        map(
            tuple,
            tcat.read(src)
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


def test_minmax_view_converges_under_deletes(spark, tcat):
    """A delete that retracts the current extreme triggers an exact
    recompute of ONLY the retracted groups' MIN/MAX (r11 verdict #2 —
    the insert-only refusal is retired): refresh == full recompute
    after extreme-retracting deletes, updates, and whole-group
    deletes, and the watermark advances normally."""
    tcat.overwrite(_fact(spark, 0, 40), "fact")
    create_materialized_view(
        tcat, "v", "fact", ["g"], {"total": "amt"}, "n",
        mins={"lo": "amt"}, maxs={"hi": "amt"}, num_buckets=8,
    )
    # retract group 3's max (k=39 holds amt=58.5, the group-3 extreme)
    tcat.delete_where("fact", [("k", "=", 39)])
    out = refresh_materialized_view(tcat, "v")
    assert out["applied"] > 0
    assert _view_rows(tcat) == _minmax_recompute(tcat)
    # an UPDATE arrives as delete+insert — both legs must fold
    tcat.update_where("fact", [("g", "=", 2)], {"amt": "amt - 100"})
    refresh_materialized_view(tcat, "v")
    assert _view_rows(tcat) == _minmax_recompute(tcat)
    # a whole group vanishing drops its row, extremes included
    tcat.delete_where("fact", [("g", "=", 1)])
    refresh_materialized_view(tcat, "v")
    assert _view_rows(tcat) == _minmax_recompute(tcat)
    assert not any(r[0] == 1 for r in _view_rows(tcat))
    # and a later pure append still takes the cheap partial path
    tcat.append(_fact(spark, 40, 60), "fact")
    out = refresh_materialized_view(tcat, "v")
    assert out["src_buckets_read"] is None  # no recompute leg ran
    assert _view_rows(tcat) == _minmax_recompute(tcat)


def test_minmax_recompute_reads_only_retracted_groups_buckets(spark, tcat):
    """THE 100 TB bound for the delete leg: with the SOURCE bucketed on
    the view keys, the extreme recompute partition-prunes to exactly
    the buckets holding the delete-touched groups (pinned via the
    refresh's reported src_buckets_read), and untouched VIEW buckets
    stay hardlink-identical across the refresh (inode pin)."""
    tcat.overwrite_bucketed(_wide_fact(spark, 0, 640), "fact", 8, ["g"])
    create_materialized_view(
        tcat, "v", "fact", ["g"], {"total": "amt"}, "n",
        mins={"lo": "amt"}, maxs={"hi": "amt"}, num_buckets=8,
    )
    before = _bucket_inodes(tcat, "v")
    assert len(before) == 8
    # delete group 5's current max row (k = 5 + 19*32 = 613)
    tcat.delete_where("fact", [("k", "=", 613)])
    out = refresh_materialized_view(tcat, "v")
    gb = _g_bucket(spark, [5])[5]
    assert out["src_buckets_read"] == [gb]
    after = _bucket_inodes(tcat, "v")
    for b in before:
        if b == f"_kb={gb}":
            assert after[b] != before[b], "affected bucket must re-stage"
        else:
            assert after[b] == before[b], f"{b} was rewritten needlessly"
    got = sorted(
        map(tuple, tcat.read("v").drop("_kb").collect())
    )
    want = sorted(
        map(
            tuple,
            tcat.read("fact")
            .drop("_kb")
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
    assert got == want


def test_minmax_create_and_collision_checks(spark, tcat):
    tcat.overwrite(_fact(spark, 0, 10), "fact")
    # mins/maxs no longer require insert_only (deletes are handled)
    create_materialized_view(
        tcat, "v", "fact", ["g"], {"total": "amt"}, "n",
        mins={"lo": "amt"},
    )
    drop_materialized_view(tcat, "v")
    with pytest.raises(ValueError, match="collision"):
        create_materialized_view(
            tcat, "v", "fact", ["g"], {"x": "amt"}, "n",
            mins={"x": "amt"},
        )


def test_refresh_folds_merge_on_read_source_dml(spark, tcat):
    """Composition: vector-mode DELETE/UPDATE on the source feed the
    refresh as signed partials exactly like copy-on-write DML —
    refresh == full recompute, and a group whose rows all vector-delete
    vanishes."""
    tcat.overwrite(_fact(spark, 0, 40), "fact")
    create_materialized_view(
        tcat, "v", "fact", ["g"], {"total": "amt"}, "n", num_buckets=4
    )
    tcat.delete_where("fact", [("g", "=", 1)], mode="dv")
    tcat.update_where("fact", [("g", "=", 2)], {"amt": "amt + 5"}, mode="dv")
    out = refresh_materialized_view(tcat, "v")
    assert out["applied"] > 0
    got = sorted(
        (r["g"], r["total"], r["n"])
        for r in tcat.read("v").drop("_kb").collect()
    )
    want = sorted(
        (r["g"], r["total"], r["n"])
        for r in tcat.read("fact")
        .groupBy("g")
        .agg(F.sum("amt").alias("total"), F.count("*").alias("n"))
        .collect()
    )
    assert got == want
    assert not any(g == 1 for g, _t, _n in got)  # group fully deleted


def test_matview_refresh_follows_rename(spark, tcat):
    """A follow_renames view survives its source's rename: the rename
    commits, the next refresh crosses it via the lineage, and the spec
    carries the new source name (r13 — previously the rename refused
    while any view sourced the table)."""
    import pytest
    from pyspark.sql import functions as F

    from gcp_datalake_pipeline_spark.operators.matview import (
        create_materialized_view,
        refresh_materialized_view,
    )

    src = spark.range(40).select(
        (F.col("id") % 4).alias("g"), F.col("id").alias("v")
    )
    tcat.overwrite(src, "src")
    create_materialized_view(
        tcat, "mv", "src", ["g"], {"total": "v"}, follow_renames=True
    )
    # a NON-opted view still blocks the rename
    create_materialized_view(
        tcat, "mv_strict", "src", ["g"], {"total2": "v"}
    )
    with pytest.raises(ValueError, match="mv_strict"):
        tcat.rename_table("src", "src2")
    from gcp_datalake_pipeline_spark.operators.matview import (
        drop_materialized_view,
    )

    drop_materialized_view(tcat, "mv_strict")
    tcat.rename_table("src", "src2")
    tcat.append(
        spark.createDataFrame([(0, 1000)], "g long, v long"), "src2"
    )
    tcat.delete_where("src2", [("v", "=", 1)])
    out = refresh_materialized_view(tcat, "mv")
    assert out["applied"] > 0
    spec = tcat.view_spec("mv")
    assert spec["source"] == "src2"
    got = {r["g"]: r["total"] for r in tcat.read("mv").collect()}
    # group 0: ids 0,4,...,36 sum=180, +1000 = 1180; group 1 lost v=1
    assert got[0] == 180 + 1000
    assert got[1] == sum(i for i in range(40) if i % 4 == 1) - 1
    # parity with a full recompute off the renamed source
    full = {
        r["g"]: r["total"]
        for r in tcat.read("src2")
        .groupBy("g")
        .agg(F.sum("v").alias("total"))
        .collect()
    }
    assert got == full
