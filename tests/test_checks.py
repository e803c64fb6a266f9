"""CHECK constraints: write-time enforcement on every staged path,
SQL-standard NULL semantics, existing-row validation, transactional
rollback, and lifecycle (list/drop, versioned metadata commits)."""

import pytest
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.transactions import (
    CheckViolation,
    TransactionalCatalog,
)


def _cat(spark, tmp_path):
    return TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))


def test_violating_append_rolls_back(spark, tmp_path):
    """A bad batch dies before the pointer swap: CheckViolation raised,
    table contents and manifest version unchanged, staged dir gone."""
    cat = _cat(spark, tmp_path)
    good = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    cat.append(good, "t")
    cat.add_check("t", "v_nonneg", "v >= 0")
    v_before = cat.versions()[-1]["version"]
    bad = spark.range(5).select(F.col("id"), (-F.col("id") - 1).alias("v"))
    with pytest.raises(CheckViolation, match="v_nonneg"):
        cat.append(bad, "t")
    assert cat.read("t").count() == 100
    assert cat.versions()[-1]["version"] == v_before
    # overwrite path is gated too
    with pytest.raises(CheckViolation, match="v_nonneg"):
        cat.overwrite(bad, "t")
    assert cat.read("t").count() == 100


def test_add_check_validates_existing_rows(spark, tmp_path):
    """The Delta contract: a constraint the current data violates is
    refused (and nothing is committed)."""
    cat = _cat(spark, tmp_path)
    cat.append(
        spark.range(10).select(F.col("id"), (F.col("id") - 5).alias("v")), "t"
    )
    with pytest.raises(CheckViolation, match="existing"):
        cat.add_check("t", "v_nonneg", "v >= 0")
    assert cat.checks("t") == {}


def test_null_passes_sql_standard(spark, tmp_path):
    """CHECK violates only on FALSE — a NULL expression result passes
    (SQL-standard CHECK semantics)."""
    cat = _cat(spark, tmp_path)
    cat.add_check("t", "v_big", "v > 10")
    df = spark.sql(
        "SELECT * FROM VALUES (1, 11.0), (2, CAST(NULL AS DOUBLE)) AS t(id, v)"
    )
    cat.append(df, "t")
    assert cat.read("t").count() == 2


def test_pre_registered_check_gates_first_write(spark, tmp_path):
    """Pipeline-definition shape: checks declared before the table
    exists enforce from the very first load."""
    cat = _cat(spark, tmp_path)
    cat.add_check("t", "positive", "v > 0")
    with pytest.raises(CheckViolation, match="positive"):
        cat.append(
            spark.range(3).select(F.col("id"), F.lit(0).alias("v")), "t"
        )
    assert not cat.exists("t")
    cat.append(spark.range(3).select(F.col("id"), F.lit(1).alias("v")), "t")
    assert cat.read("t").count() == 3


def test_violation_rolls_back_whole_transaction(spark, tmp_path):
    """Inside an explicit transaction a violating write aborts EVERY
    table the transaction touched — all-or-nothing holds."""
    cat = _cat(spark, tmp_path)
    cat.add_check("t", "v_nonneg", "v >= 0")
    ok = spark.range(4).select(F.col("id"), F.col("id").alias("v"))
    bad = spark.range(4).select(F.col("id"), (-F.col("id") - 1).alias("v"))
    with pytest.raises(CheckViolation):
        with cat.transaction("two-table-load"):
            cat.append(ok, "other")
            cat.append(bad, "t")
    assert not cat.exists("other") and not cat.exists("t")


def test_drop_check_and_lifecycle(spark, tmp_path):
    """drop_check lifts the gate; checks() lists; unknown drop raises;
    in-transaction mutation is refused; unparseable SQL fails fast."""
    cat = _cat(spark, tmp_path)
    cat.add_check("t", "v_nonneg", "v >= 0")
    assert cat.checks("t") == {"v_nonneg": "v >= 0"}
    bad = spark.range(2).select(F.col("id"), (-F.col("id") - 1).alias("v"))
    with pytest.raises(CheckViolation):
        cat.append(bad, "t")
    cat.drop_check("t", "v_nonneg")
    assert cat.checks("t") == {}
    cat.append(bad, "t")  # gate lifted
    assert cat.read("t").count() == 2
    with pytest.raises(KeyError):
        cat.drop_check("t", "v_nonneg")
    with pytest.raises(Exception):
        cat.add_check("t", "broken", "v >=")
    with cat.transaction("x"):
        with pytest.raises(RuntimeError, match="inside an open transaction"):
            cat.add_check("t", "n", "v >= 0")
        cat.append(bad, "t")  # keep the txn non-empty and committable


def test_checks_gate_bucketed_merge(spark, tmp_path):
    """The bucketed-merge staging path enforces checks on the touched
    partitions (before hardlinking untouched ones in)."""
    cat = _cat(spark, tmp_path)
    base = spark.range(50).select(F.col("id"), F.col("id").alias("v"))
    cat.merge_upsert_bucketed(base, "t", key_cols=["id"], num_buckets=8)
    cat.add_check("t", "v_nonneg", "v >= 0")
    upd = spark.range(5).select(F.col("id"), (-F.lit(1)).alias("v"))
    with pytest.raises(CheckViolation, match="v_nonneg"):
        cat.merge_upsert_bucketed(upd, "t", key_cols=["id"], num_buckets=8)
    assert cat.read("t").filter(F.col("v") < 0).count() == 0


def test_checks_ride_clones(spark, tmp_path):
    """A shallow clone keeps its quality gates: CHECK constraints ride
    the cloned manifest like schemas, so a branch rejects the same bad
    writes the source does."""
    cat = _cat(spark, tmp_path)
    cat.append(
        spark.range(10).select(F.col("id"), F.col("id").alias("v")), "t"
    )
    cat.add_check("t", "v_nonneg", "v >= 0")
    clone = cat.clone_to(str(tmp_path / "branch"))
    assert clone.checks("t") == {"v_nonneg": "v >= 0"}
    bad = spark.range(3).select(F.col("id"), (-F.col("id") - 1).alias("v"))
    with pytest.raises(CheckViolation, match="v_nonneg"):
        clone.append(bad, "t")
    # the source is untouched by the clone's rejected write
    assert cat.read("t").count() == 10


def test_catalog_restore_reverts_checks_with_the_data(spark, tmp_path):
    """Whole-catalog restore is COMPLETE state rollback: the checks map
    reverts alongside tables and schemas — a constraint added after
    the snapshot disappears with it (and vice versa), keeping the
    restored state self-consistent without a validation scan."""
    cat = _cat(spark, tmp_path)
    cat.append(
        spark.range(5).select(F.col("id"), (F.col("id") - 3).alias("v")),
        "t",
    )
    v_pre = cat.versions()[-1]["version"]
    cat.delete_where("t", [("v", "<", 0)])
    cat.add_check("t", "v_nonneg", "v >= 0")
    cat.restore(v_pre)
    assert cat.checks("t") == {}  # pre-check snapshot: gate reverted
    assert cat.read("t").count() == 5


# -- write-enforced UNIQUE / PRIMARY KEY (r12) --------------------------------


def test_unique_constraint_write_enforcement(spark, tmp_path):
    tcat = _cat(spark, tmp_path)
    import pytest
    from pyspark.sql import functions as F

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.transactions import CheckViolation

    tcat.overwrite(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), "t"
    )
    out = execute_dml(tcat, "ALTER TABLE t ADD CONSTRAINT pk UNIQUE (k)")
    assert out == {"table": "t", "added_unique": "pk", "columns": ["k"]}
    # appends with fresh keys land
    execute_dml(tcat, "INSERT INTO t VALUES (3, 'c')")
    # a colliding key refuses — and publishes NOTHING
    v = tcat._read_manifest(strict=False)["version"]
    with pytest.raises(CheckViolation, match="already exist"):
        execute_dml(tcat, "INSERT INTO t VALUES (2, 'dup')")
    assert tcat._read_manifest(strict=False)["version"] == v
    # an intra-batch duplicate refuses too
    with pytest.raises(CheckViolation, match="within the write"):
        execute_dml(tcat, "INSERT INTO t VALUES (9, 'x'), (9, 'y')")
    # overwrite replaces content: restating keys is legitimate
    tcat.overwrite(
        spark.createDataFrame([(1, "z"), (4, "w")], "k long, v string"), "t"
    )
    assert tcat.read("t").count() == 2
    # but an overwrite with internal duplicates still refuses
    with pytest.raises(CheckViolation, match="within the write"):
        tcat.overwrite(
            spark.createDataFrame([(5, "p"), (5, "q")], "k long, v string"),
            "t",
        )
    # UPDATE SET on the constrained column is CHECKED: a real collision
    # with a key the update does not rewrite refuses...
    with pytest.raises(CheckViolation, match="collide"):
        execute_dml(tcat, "UPDATE t SET k = 1 WHERE v = 'w'")
    # ...while a fresh key value goes through (and back)
    execute_dml(tcat, "UPDATE t SET k = 40 WHERE v = 'w'")
    execute_dml(tcat, "UPDATE t SET k = 4 WHERE v = 'w'")
    # ...while SET on other columns works (dv mode too: the in-place
    # images' keys retire via the vector, no false collision)
    execute_dml(tcat, "UPDATE t SET v = 'zz' WHERE k = 1")
    tcat.update_where("t", [("k", "=", 4)], {"v": "'ww'"}, mode="dv")
    got = {(r["k"], r["v"]) for r in tcat.read("t").collect()}
    assert got == {(1, "zz"), (4, "ww")}
    # adding the constraint over existing duplicates refuses
    tcat.overwrite(
        spark.createDataFrame([(1, "a"), (1, "b")], "k long, v string"), "d"
    )
    with pytest.raises(CheckViolation, match="duplicated"):
        tcat.add_unique_constraint("d", "pk", ["k"])
    # rename/drop of a covered column refuses; DROP CONSTRAINT frees it
    with pytest.raises(ValueError, match="UNIQUE constraint"):
        tcat.rename_column("t", "k", "k2")
    execute_dml(tcat, "ALTER TABLE t DROP CONSTRAINT pk")
    tcat.rename_column("t", "k", "k2")
    assert "k2" in tcat.read("t").columns


def test_unique_constraint_bucket_pruned_probe(spark, tmp_path):
    tcat = _cat(spark, tmp_path)
    """On a table bucketed on the unique columns, the existing-key
    probe partition-prunes to the staged keys' buckets (plan pin)."""
    from pyspark.sql import functions as F

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.storage import kb_col

    tcat.overwrite_bucketed(
        spark.range(200).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        "bt", 16, ["k"],
    )
    tcat.add_unique_constraint("bt", "pk", ["k"])
    # the INSERT path computes _kb itself; fresh keys land
    out = execute_dml(tcat, "INSERT INTO bt (k, v) VALUES (1000, 1), (2000, 2)")
    assert out["inserted"] == 2
    import pytest

    from gcp_datalake_pipeline_spark.transactions import CheckViolation

    with pytest.raises(CheckViolation, match="already exist"):
        execute_dml(tcat, "INSERT INTO bt (k, v) VALUES (7, 0)")
    # PRIMARY KEY is an accepted alias
    execute_dml(tcat, "ALTER TABLE bt DROP CONSTRAINT pk")
    out = execute_dml(
        tcat, "ALTER TABLE bt ADD CONSTRAINT pk PRIMARY KEY (k)"
    )
    assert out["added_unique"] == "pk"


# -- round-13 constraint-soundness regressions --------------------------------


def test_unique_null_key_cross_probe_null_safe(spark, tmp_path):
    """NULL keys group like values (the intra-stage groupBy contract):
    a second NULL-key append must collide with an existing NULL key —
    the probe joins with eqNullSafe, not a plain equi-join."""
    tcat = _cat(spark, tmp_path)
    tcat.overwrite(
        spark.createDataFrame([(1, "a"), (None, "n")], "k long, v string"),
        "t",
    )
    tcat.add_unique_constraint("t", "uk", ["k"])
    # fresh non-null key still lands
    tcat.append(spark.createDataFrame([(2, "b")], "k long, v string"), "t")
    with pytest.raises(CheckViolation, match="already exist"):
        tcat.append(
            spark.createDataFrame([(None, "n2")], "k long, v string"), "t"
        )
    # and the table still validates under restore_table's check replay
    v = tcat.versions()[-1]["version"]
    tcat.restore_table("t", v, validate_checks=True)


def test_bucketed_merge_unique_nonkey_cross_probe(spark, tmp_path):
    """A bucketed merge restates only the TOUCHED buckets; a UNIQUE
    constraint on a NON-bucket-key column must still probe the carried
    buckets — an upserted new key may not duplicate a value held by a
    row the merge never rewrote."""
    from gcp_datalake_pipeline_spark.storage import kb_col

    tcat = _cat(spark, tmp_path)
    base = spark.createDataFrame(
        [(k, k * 10) for k in range(10)], "k long, u long"
    )
    tcat.overwrite_bucketed(base, "bt", 16, ["k"])
    tcat.add_unique_constraint("bt", "uniq_u", ["u"])

    # pick a new key landing in a DIFFERENT bucket than k=5 (whose
    # u=50 we will try to duplicate), so bucket 5's files are carried
    # by hardlink, not restated
    def bucket_of(k):
        return tcat.spark.createDataFrame([(k,)], "k long").select(
            kb_col(["k"], 16).alias("b")
        ).first()["b"]

    vic = bucket_of(5)
    newk = next(k for k in range(1000, 1100) if bucket_of(k) != vic)

    src_dup = spark.createDataFrame([(newk, 50)], "k long, u long")
    with pytest.raises(CheckViolation, match="already exist"):
        tcat.merge_upsert_bucketed(
            src_dup, "bt", ["k"], 16, audit_cols=False
        )
    # table unchanged
    assert tcat.read("bt").count() == 10

    # a merge restating an EXISTING key's own value is legitimate
    # (its bucket is touched, hence excluded from the carried probe)
    tcat.merge_upsert_bucketed(
        spark.createDataFrame([(5, 50)], "k long, u long"),
        "bt", ["k"], 16, audit_cols=False,
    )
    # and a new key with a fresh unique value lands
    tcat.merge_upsert_bucketed(
        spark.createDataFrame([(newk, 999)], "k long, u long"),
        "bt", ["k"], 16, audit_cols=False,
    )
    assert tcat.read("bt").count() == 11
    # moving k=5's value while restating it stays fine; duplicating a
    # carried bucket's value via UPDATE-shaped merge refuses
    other = next(
        k for k in range(10) if bucket_of(k) != bucket_of(5) and k != 5
    )
    with pytest.raises(CheckViolation, match="already exist"):
        tcat.merge_upsert_bucketed(
            spark.createDataFrame([(5, other * 10)], "k long, u long"),
            "bt", ["k"], 16, audit_cols=False,
        )


def test_bucketed_merge_unique_on_key_skips_probe(spark, tmp_path):
    """UNIQUE over exactly the bucket keys: staged keys hash into the
    rewritten buckets by construction — a merge restating keys must
    NOT false-collide."""
    tcat = _cat(spark, tmp_path)
    base = spark.createDataFrame(
        [(k, k * 10) for k in range(10)], "k long, u long"
    )
    tcat.overwrite_bucketed(base, "bt", 16, ["k"])
    tcat.add_unique_constraint("bt", "pk", ["k"])
    tcat.merge_upsert_bucketed(
        spark.createDataFrame([(5, 555), (77, 770)], "k long, u long"),
        "bt", ["k"], 16, audit_cols=False,
    )
    got = {(r["k"], r["u"]) for r in tcat.read("bt").collect()}
    assert (5, 555) in got and (77, 770) in got and len(got) == 11


def test_replace_partitions_enforces_checks(spark, tmp_path):
    """replace_partitions is a public write path: row CHECKs and UNIQUE
    run on the staged adds; the UNIQUE cross probe covers SURVIVING
    partitions only (a moved row restates a dropped partition's row)."""
    tcat = _cat(spark, tmp_path)
    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "a"), (3, 30, "b")],
        "id long, v long, p string",
    )
    tcat.overwrite(df, "t", partition_cols=["p"])
    tcat.add_check("t", "v_nonneg", "v >= 0")
    tcat.add_unique_constraint("t", "uid", ["id"])
    ver = tcat.versions()[-1]["version"]

    # row CHECK enforced on the staged adds
    with pytest.raises(CheckViolation, match="v_nonneg"):
        tcat.replace_partitions(
            "t", "p", ["b"],
            spark.createDataFrame([(3, -1, "c")], "id long, v long, p string"),
        )
    assert tcat.versions()[-1]["version"] == ver

    # UNIQUE: a new id colliding with a SURVIVING partition refuses
    with pytest.raises(CheckViolation, match="already exist"):
        tcat.replace_partitions(
            "t", "p", ["b"],
            spark.createDataFrame([(1, 99, "c")], "id long, v long, p string"),
        )
    # ...but MOVING a row out of the dropped partition is legitimate
    tcat.replace_partitions(
        "t", "p", ["b"],
        spark.createDataFrame([(3, 30, "c")], "id long, v long, p string"),
    )
    got = {(r["id"], r["p"]) for r in tcat.read("t").collect()}
    assert got == {(1, "a"), (2, "a"), (3, "c")}


def test_checked_update_on_unique_columns(spark, tmp_path):
    """UPDATE SET on UNIQUE columns is checked, not blanket-refused
    (r12 verdict item 2): collisions with unrewritten keys refuse,
    post-SET duplicates among matched rows refuse, key swaps inside
    one statement pass (statement-level constraint check), and the DV
    path shares the probe."""
    from gcp_datalake_pipeline_spark.dml_sql import execute_dml

    tcat = _cat(spark, tmp_path)
    tcat.overwrite(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
        ),
        "t",
    )
    tcat.add_unique_constraint("t", "pk", ["k"])
    v = tcat._read_manifest(strict=False)["version"]
    # collision with an unrewritten key refuses, publishes nothing
    with pytest.raises(CheckViolation, match="collide"):
        execute_dml(tcat, "UPDATE t SET k = 2 WHERE v = 'a'")
    # two matched rows mapped to one post-SET key refuses
    with pytest.raises(CheckViolation, match="duplicated"):
        tcat.update_where(
            "t", [("k", "in", [1, 2])], {"k": "99"}
        )
    assert tcat._read_manifest(strict=False)["version"] == v
    # a key SWAP inside one statement passes (1<->2)
    tcat.update_where(
        "t", [("k", "in", [1, 2])], {"k": "CASE WHEN k = 1 THEN 2 ELSE 1 END"}
    )
    got = {(r["k"], r["v"]) for r in tcat.read("t").collect()}
    assert got == {(2, "a"), (1, "b"), (3, "c"), (4, "d")}
    # fresh value passes; shifting to a key being vacated passes
    execute_dml(tcat, "UPDATE t SET k = 30 WHERE v = 'c'")
    assert {r["k"] for r in tcat.read("t").collect()} == {1, 2, 30, 4}
    # the DV path shares the probe
    with pytest.raises(CheckViolation, match="collide"):
        tcat.update_where("t", [("v", "=", "d")], {"k": "1"}, mode="dv")
    tcat.update_where("t", [("v", "=", "d")], {"k": "44"}, mode="dv")
    assert {r["k"] for r in tcat.read("t").collect()} == {1, 2, 30, 44}


def _assert_kb_placement(tcat, table, key, n):
    """Every PHYSICAL row sits in the _kb dir its key hashes to. _kb is
    a hive partition column (never stored in the data files), so its
    read-back value IS the directory the row's file lives under."""
    bad = tcat.read(table).filter(
        F.col("_kb") != F.pmod(F.xxhash64(key), F.lit(n)).cast("int")
    )
    assert bad.count() == 0


def test_update_on_bucket_key_moves_rows(spark, tmp_path):
    """SET on a bucket-key column re-places the matched rows: they land
    in their NEW _kb partition in the same commit (rewrite and DV
    modes), so bucket-pruned paths keep finding them. SET on _kb itself
    refuses; EXPLAIN reports the re-placement instead of a plan the
    real run would reject."""
    from gcp_datalake_pipeline_spark.dml_sql import execute_dml

    tcat = _cat(spark, tmp_path)
    tcat.overwrite_bucketed(
        spark.range(20).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        "bt", 4, ["k"],
    )
    got = execute_dml(tcat, "UPDATE bt SET k = 300 WHERE k = 3")
    assert got["updated"] == 1
    assert {r["k"] for r in tcat.read("bt").collect()} == (
        set(range(20)) - {3}
    ) | {300}
    _assert_kb_placement(tcat, "bt", "k", 4)
    # a bucket-pruned MERGE on the moved key finds it (no duplicate)
    tcat.merge_upsert_bucketed(
        spark.createDataFrame([(300, -1)], "k long, v long"),
        "bt", ["k"], 4, audit_cols=False,
    )
    rows = tcat.read("bt").filter(F.col("k") == 300).collect()
    assert [(r["k"], r["v"]) for r in rows] == [(300, -1)]
    _assert_kb_placement(tcat, "bt", "k", 4)
    # DV mode: images re-derive placement; old position retires via
    # the vector in the same commit
    assert (
        tcat.update_where("bt", [("k", "=", 5)], {"k": "500"}, mode="dv")
        == 1
    )
    assert tcat.read("bt").filter(F.col("k") == 5).count() == 0
    assert tcat.read("bt").filter(F.col("k") == 500).count() == 1
    _assert_kb_placement(tcat, "bt", "k", 4)
    # EXPLAIN mirrors: reports the re-placement keys, refuses SET _kb
    plan = execute_dml(tcat, "EXPLAIN UPDATE bt SET k = 9 WHERE k = 300")
    assert plan["rebucket_keys"] == ["k"]
    with pytest.raises(ValueError, match="_kb"):
        execute_dml(tcat, "UPDATE bt SET _kb = 0 WHERE k = 1")
    with pytest.raises(ValueError, match="_kb"):
        execute_dml(tcat, "EXPLAIN UPDATE bt SET _kb = 0 WHERE k = 1")
    # non-key columns still update fine on bucketed tables
    assert execute_dml(tcat, "UPDATE bt SET v = 0 WHERE k = 4")["updated"] == 1


def test_checked_update_fk_restrict(spark, tmp_path):
    """UPDATE rewriting a referenced parent key AWAY is a removal —
    RESTRICT refuses while children reference it; unreferenced keys
    update freely."""
    from gcp_datalake_pipeline_spark.dml_sql import execute_dml

    tcat = _cat(spark, tmp_path)
    tcat.overwrite(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        "p",
    )
    tcat.add_unique_constraint("p", "pk", ["k"])
    tcat.overwrite(
        spark.createDataFrame([(10, 1)], "cid long, fk long"), "c"
    )
    tcat.add_fk_constraint("c", "cfk", ["fk"], "p", ["k"])
    with pytest.raises(CheckViolation, match="reference the removed"):
        execute_dml(tcat, "UPDATE p SET k = 5 WHERE k = 1")
    execute_dml(tcat, "UPDATE p SET k = 5 WHERE k = 2")
    assert {r["k"] for r in tcat.read("p").collect()} == {1, 5}


# -- round-14 small-write literal-probe internals ------------------------------


def test_unique_probe_nan_key_falls_back_and_still_refuses(spark, tmp_path):
    """A float-NaN key must still collide: Spark's joins/groupBy treat
    NaN as equal to NaN, but a literal == NaN predicate is false — so
    the small-write literal fast path must detect NaN keys and take the
    join path (transactions._literal_probe_safe)."""
    tcat = _cat(spark, tmp_path)
    tcat.overwrite(
        spark.createDataFrame(
            [(float("nan"), "a"), (1.0, "b")], "k double, v string"
        ),
        "t",
    )
    tcat.add_unique_constraint("t", "uk", ["k"])
    with pytest.raises(CheckViolation, match="already exist"):
        tcat.append(
            spark.createDataFrame([(float("nan"), "x")], "k double, v string"),
            "t",
        )
    # intra-write NaN duplicate refuses too (groupBy groups NaN)
    with pytest.raises(CheckViolation, match="duplicated within"):
        tcat.append(
            spark.createDataFrame(
                [(float("nan"), "x"), (float("nan"), "y")],
                "k double, v string",
            ),
            "t",
        )
    # a fresh non-NaN key still lands
    tcat.append(spark.createDataFrame([(2.0, "c")], "k double, v string"), "t")


def test_unique_probe_bulk_boundary_matches_small_path(spark, tmp_path):
    """Writes just over _SMALL_PROBE_KEYS distinct keys take the join
    path and must behave identically to the literal path: collision
    refuses, disjoint bulk lands."""
    from gcp_datalake_pipeline_spark.transactions import _SMALL_PROBE_KEYS

    n = _SMALL_PROBE_KEYS + 5
    tcat = _cat(spark, tmp_path)
    tcat.overwrite(
        spark.range(100).selectExpr("id AS k", "CAST(id AS STRING) AS v"),
        "t",
    )
    tcat.add_unique_constraint("t", "uk", ["k"])
    # bulk disjoint append lands
    tcat.append(
        spark.range(1000, 1000 + n).selectExpr(
            "id AS k", "CAST(id AS STRING) AS v"
        ),
        "t",
    )
    # bulk append with ONE colliding key refuses and publishes nothing
    ver = tcat._read_manifest(strict=False)["version"]
    with pytest.raises(CheckViolation, match="already exist"):
        tcat.append(
            spark.range(2000, 2000 + n - 1)
            .selectExpr("id AS k", "CAST(id AS STRING) AS v")
            .unionAll(
                spark.createDataFrame([(50, "dup")], "k long, v string")
            ),
            "t",
        )
    assert tcat._read_manifest(strict=False)["version"] == ver


def test_checked_update_key_swap_passes_small_path(spark, tmp_path):
    """SQL statement-level UNIQUE semantics: a swap (1->2, 2->1) inside
    one UPDATE must pass — the small literal path's new-minus-old
    predicate must reproduce the join path's retired-key exemption."""
    from gcp_datalake_pipeline_spark.dml_sql import execute_dml

    tcat = _cat(spark, tmp_path)
    tcat.overwrite(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string"),
        "t",
    )
    tcat.add_unique_constraint("t", "uk", ["k"])
    # swap via one statement: post-SET keys {3-k} collide only with
    # keys the update itself retires -> allowed
    out = execute_dml(tcat, "UPDATE t SET k = 3 - k WHERE k != 3")
    assert out["updated"] == 2
    assert {r["k"] for r in tcat.read("t").collect()} == {1, 2, 3}
    # while a collision with an UNrewritten key still refuses
    with pytest.raises(CheckViolation, match="collide"):
        tcat.update_where("t", [("k", "=", 1)], {"k": "3"})
