"""Write-enforced FOREIGN KEY constraints (round 13): child-side probe
on every write path, parent-side RESTRICT guards on every key-removing
path, DDL lifecycle (rename/drop/restore/SHOW CREATE), and the
read-your-writes behavior inside multi-table transactions.

Reference semantics generalized: the ETL pipelines' FK-miss -> reject
behavior (/root/reference/etl-gcs-cloudsql/src/services/conductor.ts:
90-98) and model.sql's REFERENCES clauses, declared via DDL."""

import pytest
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.dml_sql import execute_dml
from gcp_datalake_pipeline_spark.transactions import (
    CheckViolation,
    TransactionalCatalog,
)


def _cat(spark, tmp_path):
    return TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))


def _lake(spark, tmp_path):
    """parent(k UNIQUE) <- child(fk) with one NULL-fk child row."""
    cat = _cat(spark, tmp_path)
    cat.overwrite(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        ),
        "parent",
    )
    cat.add_unique_constraint("parent", "pk", ["k"])
    cat.overwrite(
        spark.createDataFrame(
            [(10, 1), (11, 2), (12, None)], "cid long, fk long"
        ),
        "child",
    )
    out = execute_dml(
        cat,
        "ALTER TABLE child ADD CONSTRAINT cfk "
        "FOREIGN KEY (fk) REFERENCES parent (k)",
    )
    assert out == {
        "table": "child",
        "added_fk": "cfk",
        "columns": ["fk"],
        "references": {"table": "parent", "columns": ["k"]},
    }
    return cat


def test_add_fk_requires_parent_unique_and_validates(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.overwrite(
        spark.createDataFrame([(1, "a")], "k long, v string"), "parent"
    )
    cat.overwrite(spark.createDataFrame([(10, 9)], "cid long, fk long"), "c")
    # no UNIQUE on the referenced columns -> refuse
    with pytest.raises(ValueError, match="UNIQUE/PRIMARY KEY"):
        cat.add_fk_constraint("c", "cfk", ["fk"], "parent", ["k"])
    cat.add_unique_constraint("parent", "pk", ["k"])
    # existing child rows violate -> refuse, nothing registered
    with pytest.raises(CheckViolation, match="no match"):
        cat.add_fk_constraint("c", "cfk", ["fk"], "parent", ["k"])
    assert cat.checks("c") == {}
    # missing parent table / column refuse loudly
    with pytest.raises(FileNotFoundError):
        cat.add_fk_constraint("c", "cfk", ["fk"], "ghost", ["k"])
    with pytest.raises(ValueError, match="not in 'parent'"):
        cat.add_fk_constraint("c", "cfk", ["fk"], "parent", ["zz"])


def test_child_insert_enforced(spark, tmp_path):
    cat = _lake(spark, tmp_path)
    # valid key and NULL key (MATCH SIMPLE) both land
    execute_dml(cat, "INSERT INTO child VALUES (13, 3)")
    execute_dml(cat, "INSERT INTO child VALUES (14, NULL)")
    v = cat._read_manifest(strict=False)["version"]
    with pytest.raises(CheckViolation, match="FOREIGN KEY 'cfk'"):
        execute_dml(cat, "INSERT INTO child VALUES (15, 99)")
    assert cat._read_manifest(strict=False)["version"] == v
    assert cat.read("child").count() == 5
    # overwrite of the child is enforced too
    with pytest.raises(CheckViolation, match="FOREIGN KEY"):
        cat.overwrite(
            spark.createDataFrame([(1, 77)], "cid long, fk long"), "child"
        )
    # UPDATE rewriting the fk column probes the parent
    with pytest.raises(CheckViolation, match="FOREIGN KEY"):
        execute_dml(cat, "UPDATE child SET fk = 42 WHERE cid = 10")
    execute_dml(cat, "UPDATE child SET fk = 2 WHERE cid = 10")
    assert (
        cat.read("child").where(F.col("cid") == 10).first()["fk"] == 2
    )


def test_parent_delete_restrict(spark, tmp_path):
    cat = _lake(spark, tmp_path)
    v = cat._read_manifest(strict=False)["version"]
    with pytest.raises(CheckViolation, match="reference the removed"):
        execute_dml(cat, "DELETE FROM parent WHERE k = 1")
    assert cat._read_manifest(strict=False)["version"] == v
    # the dv path hits the same guard
    with pytest.raises(CheckViolation, match="reference the removed"):
        cat.delete_where("parent", [("k", "=", 2)], mode="dv")
    # an unreferenced key deletes fine
    assert execute_dml(cat, "DELETE FROM parent WHERE k = 3")["deleted"] == 1
    # merge-delete funnels through the same RESTRICT
    with pytest.raises(CheckViolation, match="reference the removed"):
        execute_dml(
            cat,
            "MERGE INTO parent USING (SELECT 1 AS k) ON k = k "
            "WHEN MATCHED THEN DELETE",
        )
    # TRUNCATE / DROP of a referenced parent refuse
    with pytest.raises(CheckViolation, match="TRUNCATE"):
        cat.truncate("parent")
    with pytest.raises(ValueError, match="cannot DROP"):
        cat.drop_table("parent")
    # ...until the constraint is dropped
    execute_dml(cat, "ALTER TABLE child DROP CONSTRAINT cfk")
    cat.truncate("parent")
    assert cat.read("parent").count() == 0


def test_parent_overwrite_restrict(spark, tmp_path):
    cat = _lake(spark, tmp_path)
    # dropping referenced key 1 from the content refuses
    with pytest.raises(CheckViolation, match="OVERWRITE"):
        cat.overwrite(
            spark.createDataFrame([(2, "b")], "k long, v string"), "parent"
        )
    # dropping only the unreferenced key 3 passes
    cat.overwrite(
        spark.createDataFrame(
            [(1, "a2"), (2, "b2")], "k long, v string"
        ),
        "parent",
    )
    assert cat.read("parent").count() == 2


def test_fk_bucket_pruned_parent_probe(spark, tmp_path):
    """Parent bucketed on the referenced column: the child-side probe
    partition-prunes the parent scan to the staged keys' buckets."""
    cat = _cat(spark, tmp_path)
    parent = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    cat.overwrite_bucketed(parent, "p", 16, ["k"])
    cat.add_unique_constraint("p", "pk", ["k"])
    cat.overwrite(
        spark.createDataFrame([(1, 7)], "cid long, fk long"), "c"
    )
    cat.add_fk_constraint("c", "cfk", ["fk"], "p", ["k"])
    execute_dml(cat, "INSERT INTO c VALUES (2, 199)")
    with pytest.raises(CheckViolation, match="FOREIGN KEY"):
        execute_dml(cat, "INSERT INTO c VALUES (3, 777)")
    # bucketed merge-delete of a referenced parent key refuses; of an
    # unreferenced key proceeds (only touched buckets probed)
    with pytest.raises(CheckViolation, match="reference the removed"):
        execute_dml(
            cat,
            "MERGE INTO p USING (SELECT 7 AS k) ON k = k "
            "WHEN MATCHED THEN DELETE",
        )
    out = execute_dml(
        cat,
        "MERGE INTO p USING (SELECT 55 AS k) ON k = k "
        "WHEN MATCHED THEN DELETE",
    )
    assert out["merge_deleted"] == 1


def test_fk_rename_and_show_create(spark, tmp_path):
    cat = _lake(spark, tmp_path)
    # covered columns cannot be renamed/dropped on either side
    with pytest.raises(ValueError, match="FOREIGN KEY"):
        cat.rename_column("child", "fk", "fk2")
    # the parent's referenced column is UNIQUE-covered by prerequisite,
    # so its guard fires first — either constraint refusing is correct
    with pytest.raises(ValueError, match="constraint"):
        cat.rename_column("parent", "k", "k2")
    with pytest.raises(ValueError, match="constraint"):
        cat.drop_column("parent", "k")
    # a parent column referenced by an FK but NOT itself unique (extra
    # column scenario) still refuses via the FK leg: drop the unique
    # guard's precedence by checking the FK guard directly
    # the child's own fk column is covered only by the FK
    with pytest.raises(ValueError, match="FOREIGN KEY"):
        cat.drop_column("child", "fk")
    # renaming the parent TABLE carries the constraint's reference
    cat.rename_table("parent", "parent2")
    with pytest.raises(CheckViolation, match="parent2"):
        execute_dml(cat, "INSERT INTO child VALUES (15, 99)")
    execute_dml(cat, "INSERT INTO child VALUES (15, 3)")
    out = execute_dml(cat, "SHOW CREATE TABLE child")
    assert (
        "ADD CONSTRAINT cfk FOREIGN KEY (fk) REFERENCES parent2 (k)"
        in out["create"]
    )


def test_fk_restore_validates_both_sides(spark, tmp_path):
    cat = _lake(spark, tmp_path)
    # take a parent snapshot, add a key, reference it, then try to
    # restore the parent to before the key existed
    v_pre = cat.versions()[-1]["version"]
    execute_dml(cat, "INSERT INTO parent VALUES (4, 'd')")
    execute_dml(cat, "INSERT INTO child VALUES (13, 4)")
    with pytest.raises(CheckViolation, match="reference the removed"):
        cat.restore_table("parent", v_pre)
    # child-side: restore the child to a state that predates a parent
    # key removal -> the restored rows must validate against the
    # CURRENT parent
    v_child = cat.versions()[-1]["version"]
    execute_dml(cat, "DELETE FROM child WHERE cid = 13")
    execute_dml(cat, "DELETE FROM parent WHERE k = 4")
    with pytest.raises(CheckViolation, match="reintroduce"):
        cat.restore_table("child", v_child)
    cat.restore_table("child", v_child, validate_checks=False)


def test_fk_same_transaction_parent_then_child(spark, tmp_path):
    """Read-your-writes: a multi-table transaction staging the parent
    rows FIRST may reference them from the child in the same commit."""
    cat = _lake(spark, tmp_path)
    with cat.transaction("load-both"):
        cat.append(
            spark.createDataFrame([(9, "i")], "k long, v string"), "parent"
        )
        cat.append(
            spark.createDataFrame([(20, 9)], "cid long, fk long"), "child"
        )
    assert cat.read("child").where(F.col("fk") == 9).count() == 1
    # and a failing child write rolls back the whole load
    v = cat._read_manifest(strict=False)["version"]
    with pytest.raises(CheckViolation):
        with cat.transaction("load-bad"):
            cat.append(
                spark.createDataFrame([(8, "h")], "k long, v string"),
                "parent",
            )
            cat.append(
                spark.createDataFrame([(21, 404)], "cid long, fk long"),
                "child",
            )
    assert cat._read_manifest(strict=False)["version"] == v
    assert cat.read("parent").where(F.col("k") == 8).count() == 0


def test_fk_composite_and_null_components(spark, tmp_path):
    """Composite FK: a key with ANY null component passes (SQL MATCH
    SIMPLE); fully non-null keys must match."""
    cat = _cat(spark, tmp_path)
    cat.overwrite(
        spark.createDataFrame(
            [("m1", "b1", 1), ("m2", "b2", 2)], "mk string, bk string, x long"
        ),
        "dim",
    )
    cat.add_unique_constraint("dim", "pk", ["mk", "bk"])
    cat.overwrite(
        spark.createDataFrame(
            [(1, "m1", "b1")], "id long, fmk string, fbk string"
        ),
        "fact",
    )
    cat.add_fk_constraint(
        "fact", "ffk", ["fmk", "fbk"], "dim", ["mk", "bk"]
    )
    execute_dml(cat, "INSERT INTO fact VALUES (2, 'm2', 'b2')")
    execute_dml(cat, "INSERT INTO fact VALUES (3, 'm1', NULL)")
    with pytest.raises(CheckViolation, match="FOREIGN KEY"):
        execute_dml(cat, "INSERT INTO fact VALUES (4, 'm1', 'b2')")
    assert cat.read("fact").count() == 3


def _org(spark, tmp_path, name="lake_self"):
    """Self-referential FK: emp(id UNIQUE) <- emp(mgr)."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / name))
    cat.overwrite(
        spark.createDataFrame(
            [(1, None), (2, 1), (3, 2)], "id long, mgr long"
        ),
        "emp",
    )
    cat.add_unique_constraint("emp", "epk", ["id"])
    cat.add_fk_constraint("emp", "efk", ["mgr"], "emp", ["id"])
    return cat


def test_self_fk_intra_batch_append(spark, tmp_path):
    """A batch may carry a node AND the node it references — SQL checks
    the FK at end of statement, so the staged rows count as parents.
    A genuinely dangling reference still refuses."""
    cat = _org(spark, tmp_path)
    cat.append(
        spark.createDataFrame([(5, None), (6, 5)], "id long, mgr long"),
        "emp",
    )
    assert cat.read("emp").count() == 5
    with pytest.raises(CheckViolation, match="FOREIGN KEY"):
        cat.append(
            spark.createDataFrame([(7, 99)], "id long, mgr long"), "emp"
        )


def test_self_fk_overwrite_and_truncate(spark, tmp_path):
    """Content-replacing writes probe the staged rows against
    THEMSELVES: old keys die with the old content, so a self-consistent
    replacement passes even when it shares no keys with the old table;
    an internally dangling one refuses. TRUNCATE always passes a
    self-FK (the referencing rows are truncated too)."""
    cat = _org(spark, tmp_path)
    cat.overwrite(
        spark.createDataFrame(
            [(100, None), (101, 100)], "id long, mgr long"
        ),
        "emp",
    )
    assert {r["id"] for r in cat.read("emp").collect()} == {100, 101}
    with pytest.raises(CheckViolation, match="FOREIGN KEY"):
        cat.overwrite(
            spark.createDataFrame([(200, 999)], "id long, mgr long"),
            "emp",
        )
    execute_dml(cat, "TRUNCATE TABLE emp")
    assert cat.read("emp").count() == 0


def test_self_fk_delete_subtree_in_one_statement(spark, tmp_path):
    """Deleting a node and every row referencing it in ONE statement
    is consistent (the probe sees only the SURVIVORS); deleting just
    the referenced node refuses."""
    cat = _org(spark, tmp_path)
    with pytest.raises(CheckViolation, match="reference the removed"):
        execute_dml(cat, "DELETE FROM emp WHERE id = 2")
    execute_dml(cat, "DELETE FROM emp WHERE id = 2 OR id = 3")
    assert {r["id"] for r in cat.read("emp").collect()} == {1}


def test_self_fk_update_rewrites_subtree(spark, tmp_path):
    """An UPDATE that moves a referenced key AND rewrites its
    referencing rows in the same statement passes (post-state is
    consistent); moving the key alone refuses."""
    cat = _org(spark, tmp_path)
    with pytest.raises(CheckViolation, match="reference the removed"):
        execute_dml(cat, "UPDATE emp SET id = 20 WHERE id = 2")
    execute_dml(
        cat,
        "UPDATE emp SET id = id + 10, "
        "mgr = CASE WHEN mgr = 1 THEN 1 ELSE mgr + 10 END "
        "WHERE id >= 2",
    )
    got = {(r["id"], r["mgr"]) for r in cat.read("emp").collect()}
    assert got == {(1, None), (12, 1), (13, 12)}


def test_self_fk_restore(spark, tmp_path):
    """RESTORE validates the restored content against ITSELF for a
    self-FK: current referencing rows die with the restore, so a
    self-consistent earlier version always restores."""
    cat = _org(spark, tmp_path)
    v = cat.versions()[-1]["version"]
    cat.append(
        spark.createDataFrame([(4, 3)], "id long, mgr long"), "emp"
    )
    cat.restore_table("emp", v, validate_checks=True)
    assert cat.read("emp").count() == 3


def test_self_fk_drop_table(spark, tmp_path):
    """A table whose only FK child is itself drops cleanly."""
    cat = _org(spark, tmp_path)
    cat.drop_table("emp")
    assert not cat.exists("emp")


def test_fk_on_delete_cascade_chain(spark, tmp_path):
    """ON DELETE CASCADE: deleting a parent key deletes the referencing
    child rows — recursively through a grandchild CASCADE — while a
    grandchild RESTRICT refuses the whole chain before that level
    commits. Child-first commit order keeps every intermediate state
    constraint-consistent."""
    cat = _cat(spark, tmp_path)
    cat.overwrite(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        "p",
    )
    cat.add_unique_constraint("p", "ppk", ["k"])
    cat.overwrite(
        spark.createDataFrame([(10, 1), (11, 1), (12, 2)], "ck long, fk long"),
        "c",
    )
    cat.add_unique_constraint("c", "cpk", ["ck"])
    out = execute_dml(
        cat,
        "ALTER TABLE c ADD CONSTRAINT cfk FOREIGN KEY (fk) "
        "REFERENCES p (k) ON DELETE CASCADE",
    )
    assert out["on_delete"] == "cascade"
    cat.overwrite(
        spark.createDataFrame([(100, 10), (101, 12)], "gk long, gfk long"),
        "g",
    )
    cat.add_fk_constraint("g", "gfk_fk", ["gfk"], "c", ["ck"])  # RESTRICT
    # grandchild g references c(10) -> cascade from p would orphan it
    with pytest.raises(CheckViolation, match="reference the removed"):
        execute_dml(cat, "DELETE FROM p WHERE k = 1")
    # nothing committed at any level
    assert cat.read("c").count() == 3 and cat.read("p").count() == 2
    # retarget the grandchild rows, then the cascade goes through
    execute_dml(cat, "DELETE FROM g WHERE gk = 100")
    execute_dml(cat, "DELETE FROM p WHERE k = 1")
    assert {r["ck"] for r in cat.read("c").collect()} == {12}
    assert {r["k"] for r in cat.read("p").collect()} == {2}
    # SHOW CREATE round-trips the action
    shown = execute_dml(cat, "SHOW CREATE TABLE c")
    assert "ON DELETE CASCADE" in shown["create"]


def test_fk_on_delete_set_null(spark, tmp_path):
    """ON DELETE SET NULL: referencing rows survive with a NULLed FK
    (MATCH SIMPLE — a NULL reference is never an orphan)."""
    cat = _cat(spark, tmp_path)
    cat.overwrite(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        "p",
    )
    cat.add_unique_constraint("p", "ppk", ["k"])
    cat.overwrite(
        spark.createDataFrame([(10, 1), (11, 2)], "ck long, fk long"), "c"
    )
    execute_dml(
        cat,
        "ALTER TABLE c ADD CONSTRAINT cfk FOREIGN KEY (fk) "
        "REFERENCES p (k) ON DELETE SET NULL",
    )
    execute_dml(cat, "DELETE FROM p WHERE k = 1")
    got = {(r["ck"], r["fk"]) for r in cat.read("c").collect()}
    assert got == {(10, None), (11, 2)}


def test_fk_on_delete_validation(spark, tmp_path):
    """Non-restrict actions refuse composite FKs at DDL time; only
    DELETE honors the action — TRUNCATE still RESTRICTs."""
    cat = _cat(spark, tmp_path)
    cat.overwrite(
        spark.createDataFrame([(1, 2, "a")], "k1 long, k2 long, v string"),
        "p",
    )
    cat.add_unique_constraint("p", "ppk", ["k1", "k2"])
    cat.overwrite(
        spark.createDataFrame([(10, 1, 2)], "ck long, f1 long, f2 long"),
        "c",
    )
    with pytest.raises(ValueError, match="single-column"):
        execute_dml(
            cat,
            "ALTER TABLE c ADD CONSTRAINT cfk FOREIGN KEY (f1, f2) "
            "REFERENCES p (k1, k2) ON DELETE CASCADE",
        )
    # single-col cascade registered, but TRUNCATE parent still refuses
    cat.overwrite(
        spark.createDataFrame([(7, "x")], "k long, v string"), "p1"
    )
    cat.add_unique_constraint("p1", "p1pk", ["k"])
    cat.overwrite(spark.createDataFrame([(20, 7)], "ck long, fk long"), "c1")
    execute_dml(
        cat,
        "ALTER TABLE c1 ADD CONSTRAINT c1fk FOREIGN KEY (fk) "
        "REFERENCES p1 (k) ON DELETE CASCADE",
    )
    with pytest.raises(CheckViolation, match="TRUNCATE"):
        execute_dml(cat, "TRUNCATE TABLE p1")


def test_self_fk_on_delete_cascade_subtree(spark, tmp_path):
    """Self-referential CASCADE: deleting a root recursively deletes
    the whole subtree (each level one keyed, prunable child delete)."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake_sc"))
    cat.overwrite(
        spark.createDataFrame(
            [(1, None), (2, 1), (3, 2), (4, 2), (5, None)],
            "id long, mgr long",
        ),
        "emp",
    )
    cat.add_unique_constraint("emp", "epk", ["id"])
    cat.add_fk_constraint(
        "emp", "efk", ["mgr"], "emp", ["id"], on_delete="cascade"
    )
    execute_dml(cat, "DELETE FROM emp WHERE id = 1")
    assert {r["id"] for r in cat.read("emp").collect()} == {5}


def test_fk_on_delete_explain_reports_fanout(spark, tmp_path):
    """EXPLAIN DELETE on a parent with non-restrict children reports
    the fan-out (dry run must not under-state the blast radius)."""
    cat = _cat(spark, tmp_path)
    cat.overwrite(
        spark.createDataFrame([(1, "a")], "k long, v string"), "p"
    )
    cat.add_unique_constraint("p", "ppk", ["k"])
    cat.overwrite(spark.createDataFrame([(10, 1)], "ck long, fk long"), "c")
    cat.add_fk_constraint(
        "c", "cfk", ["fk"], "p", ["k"], on_delete="set null"
    )
    plan = execute_dml(cat, "EXPLAIN DELETE FROM p WHERE k = 1")
    assert plan["fk_delete_actions"] == [
        {"child": "c", "action": "set null"}
    ]


def test_fk_on_delete_cascade_is_atomic(spark, tmp_path):
    """A non-self cascade chain (parent + child + grandchild legs)
    commits in ONE manifest swap — all-or-nothing."""
    cat = _cat(spark, tmp_path)
    cat.overwrite(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        "p",
    )
    cat.add_unique_constraint("p", "ppk", ["k"])
    cat.overwrite(
        spark.createDataFrame([(10, 1), (12, 2)], "ck long, fk long"), "c"
    )
    cat.add_unique_constraint("c", "cpk", ["ck"])
    cat.add_fk_constraint("c", "cfk", ["fk"], "p", ["k"], on_delete="cascade")
    cat.overwrite(
        spark.createDataFrame([(100, 10)], "gk long, gfk long"), "g"
    )
    cat.add_fk_constraint(
        "g", "gfk_fk", ["gfk"], "c", ["ck"], on_delete="set null"
    )
    v0 = cat._read_manifest(strict=False)["version"]
    execute_dml(cat, "DELETE FROM p WHERE k = 1")
    assert cat._read_manifest(strict=False)["version"] == v0 + 1
    assert {r["k"] for r in cat.read("p").collect()} == {2}
    assert {r["ck"] for r in cat.read("c").collect()} == {12}
    assert [(r["gk"], r["gfk"]) for r in cat.read("g").collect()] == [
        (100, None)
    ]


def test_self_fk_cascade_self_loop_terminates(spark, tmp_path):
    """A row referencing ITSELF (or a mutual cycle) must not recurse
    the cascade forever: a repeated (child, keys) leg is skipped — an
    enclosing call already deletes those keys' referencers."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake_sl"))
    cat.overwrite(
        spark.createDataFrame(
            [(1, 1), (2, 1), (5, None)], "id long, mgr long"
        ),
        "emp",
    )
    cat.add_unique_constraint("emp", "epk", ["id"])
    cat.add_fk_constraint(
        "emp", "efk", ["mgr"], "emp", ["id"], on_delete="cascade"
    )
    execute_dml(cat, "DELETE FROM emp WHERE id = 1")
    assert {r["id"] for r in cat.read("emp").collect()} == {5}


def test_fk_cascade_preprobe_protects_unwrapped_chains(spark, tmp_path):
    """On an UNWRAPPED chain (dv-mode parent), each cascade leg
    commits — so a RESTRICT refusal must fire BEFORE the legs, or a
    statement that never succeeded permanently deletes child rows and
    every rerun refuses forever."""
    cat = _cat(spark, tmp_path)
    cat.overwrite(
        spark.createDataFrame([(1, "a")], "k long, v string"), "p"
    )
    cat.add_unique_constraint("p", "ppk", ["k"])
    execute_dml(
        cat,
        "ALTER TABLE p SET TBLPROPERTIES ('dml.mode' = 'merge-on-read')",
    )
    cat.overwrite(spark.createDataFrame([(10, 1)], "ck long, fk long"), "c1")
    cat.add_fk_constraint(
        "c1", "c1fk", ["fk"], "p", ["k"], on_delete="cascade"
    )
    cat.overwrite(spark.createDataFrame([(20, 1)], "ck long, fk long"), "c2")
    cat.add_fk_constraint("c2", "c2fk", ["fk"], "p", ["k"])  # RESTRICT
    with pytest.raises(CheckViolation, match="reference the removed"):
        execute_dml(cat, "DELETE FROM p WHERE k = 1")
    # NOTHING committed anywhere — the cascade child is intact
    assert cat.read("c1").count() == 1
    assert cat.read("p").count() == 1
    # retire the restrict reference; the dv-parent cascade then works
    execute_dml(cat, "DELETE FROM c2 WHERE ck = 20")
    execute_dml(cat, "DELETE FROM p WHERE k = 1")
    assert cat.read("c1").count() == 0 and cat.read("p").count() == 0


# -- ON UPDATE CASCADE / SET NULL (round 13, second wave) ---------------


def _upd_lake(spark, tmp_path, action="CASCADE"):
    """parent(k UNIQUE) <- child(fk, ON UPDATE <action>), one NULL fk."""
    cat = _cat(spark, tmp_path)
    cat.overwrite(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        ),
        "parent",
    )
    cat.add_unique_constraint("parent", "pk", ["k"])
    cat.overwrite(
        spark.createDataFrame(
            [(10, 1), (11, 1), (12, 2), (13, None)], "cid long, fk long"
        ),
        "child",
    )
    out = execute_dml(
        cat,
        "ALTER TABLE child ADD CONSTRAINT cfk FOREIGN KEY (fk) "
        f"REFERENCES parent (k) ON UPDATE {action}",
    )
    assert out["on_update"] == action.lower()
    return cat


def test_fk_on_update_cascade_basic(spark, tmp_path):
    cat = _upd_lake(spark, tmp_path)
    v = cat._read_manifest(strict=False)["version"]
    out = execute_dml(cat, "UPDATE parent SET k = k + 100 WHERE k <= 2")
    assert out["updated"] == 2
    # parent rewrite + both child legs publish as ONE version
    assert cat._read_manifest(strict=False)["version"] == v + 1
    assert sorted(r["k"] for r in cat.read("parent").collect()) == [
        3, 101, 102,
    ]
    # referencing rows followed their keys; NULL fk untouched
    assert sorted(
        (r["cid"], r["fk"]) for r in cat.read("child").collect()
    ) == [(10, 101), (11, 101), (12, 102), (13, None)]


def test_fk_on_update_set_null(spark, tmp_path):
    cat = _upd_lake(spark, tmp_path, action="SET NULL")
    execute_dml(cat, "UPDATE parent SET k = 500 WHERE k = 1")
    assert sorted(
        (r["cid"], r["fk"]) for r in cat.read("child").collect()
    ) == [(10, None), (11, None), (12, 2), (13, None)]


def test_fk_on_update_key_swap_one_statement(spark, tmp_path):
    """SQL's statement-level check: swapping two keys in one UPDATE is
    legal on the parent, and the cascade map must carry BOTH remaps
    (1->2 and 2->1) without collapsing them."""
    cat = _upd_lake(spark, tmp_path)
    execute_dml(
        cat,
        "UPDATE parent SET k = CASE k WHEN 1 THEN 2 ELSE 1 END "
        "WHERE k IN (1, 2)",
    )
    assert sorted(
        (r["cid"], r["fk"]) for r in cat.read("child").collect()
    ) == [(10, 2), (11, 2), (12, 1), (13, None)]


def test_fk_on_update_string_keys(spark, tmp_path):
    """CASE literals round-trip string keys (incl. quote escaping)."""
    cat = _cat(spark, tmp_path)
    cat.overwrite(
        spark.createDataFrame([("o'k", 1), ("b", 2)], "k string, x long"),
        "p",
    )
    cat.add_unique_constraint("p", "pk", ["k"])
    cat.overwrite(
        spark.createDataFrame([(1, "o'k"), (2, "b")], "id long, fk string"),
        "c",
    )
    cat.add_fk_constraint("c", "f", ["fk"], "p", ["k"], on_update="cascade")
    cat.update_where("p", [("x", "=", 1)], {"k": "'new''s'"})
    assert sorted(r["fk"] for r in cat.read("c").collect()) == [
        "b", "new's",
    ]


def test_fk_on_update_chain_and_atomic_rollback(spark, tmp_path):
    """p2 <- c2 (cascade) <- g (cascade on c2.fk, which is UNIQUE):
    the key change chains two levels. A RESTRICT grandchild refuses
    the WHOLE statement — no level publishes."""
    cat = _cat(spark, tmp_path)
    cat.overwrite(spark.createDataFrame([(1,), (2,)], "k long"), "p2")
    cat.add_unique_constraint("p2", "pk2", ["k"])
    cat.overwrite(
        spark.createDataFrame([(100, 1), (200, 2)], "id long, fk long"),
        "c2",
    )
    cat.add_unique_constraint("c2", "u_fk", ["fk"])
    cat.add_fk_constraint(
        "c2", "fc", ["fk"], "p2", ["k"], on_update="cascade"
    )
    cat.overwrite(
        spark.createDataFrame([(7, 1), (8, 2)], "gid long, gfk long"), "g"
    )
    cat.add_fk_constraint(
        "g", "fg", ["gfk"], "c2", ["fk"], on_update="cascade"
    )
    execute_dml(cat, "UPDATE p2 SET k = 50 WHERE k = 1")
    assert sorted(r["fk"] for r in cat.read("c2").collect()) == [2, 50]
    assert sorted(r["gfk"] for r in cat.read("g").collect()) == [2, 50]
    # a RESTRICT grandchild blocks the chain atomically
    cat.overwrite(spark.createDataFrame([(9, 2)], "hid long, hfk long"), "h")
    cat.add_fk_constraint("h", "fh", ["hfk"], "c2", ["fk"])
    v = cat._read_manifest(strict=False)["version"]
    with pytest.raises(CheckViolation, match="reference the removed"):
        execute_dml(cat, "UPDATE p2 SET k = 60 WHERE k = 2")
    assert cat._read_manifest(strict=False)["version"] == v
    assert sorted(r["k"] for r in cat.read("p2").collect()) == [2, 50]
    assert sorted(r["fk"] for r in cat.read("c2").collect()) == [2, 50]


def test_fk_on_update_validation(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.overwrite(
        spark.createDataFrame([(1, 1)], "a long, b long"), "p"
    )
    cat.add_unique_constraint("p", "pk", ["a", "b"])
    cat.overwrite(
        spark.createDataFrame([(1, 1, 1)], "id long, fa long, fb long"),
        "c",
    )
    with pytest.raises(ValueError, match="ON UPDATE 'purge'"):
        cat.add_fk_constraint(
            "c", "f", ["fa", "fb"], "p", ["a", "b"], on_update="purge"
        )
    # composite FKs take RESTRICT only
    with pytest.raises(ValueError, match="single-column"):
        cat.add_fk_constraint(
            "c", "f", ["fa", "fb"], "p", ["a", "b"], on_update="cascade"
        )
    # self-referential ON UPDATE actions refuse at registration
    cat.overwrite(
        spark.createDataFrame([(1, None)], "id long, mgr long"), "emp"
    )
    cat.add_unique_constraint("emp", "epk", ["id"])
    with pytest.raises(ValueError, match="self-referential ON UPDATE"):
        cat.add_fk_constraint(
            "emp", "ef", ["mgr"], "emp", ["id"], on_update="set null"
        )
    # duplicate clause refuses in DDL
    cat.overwrite(spark.createDataFrame([(1,)], "k long"), "pp")
    cat.add_unique_constraint("pp", "ppk", ["k"])
    cat.overwrite(spark.createDataFrame([(1, 1)], "id long, fk long"), "cc")
    with pytest.raises(ValueError, match="duplicate ON UPDATE"):
        execute_dml(
            cat,
            "ALTER TABLE cc ADD CONSTRAINT f FOREIGN KEY (fk) "
            "REFERENCES pp (k) ON UPDATE CASCADE ON UPDATE SET NULL",
        )
    # both clauses, either order, and SHOW CREATE round-trips them
    out = execute_dml(
        cat,
        "ALTER TABLE cc ADD CONSTRAINT f FOREIGN KEY (fk) "
        "REFERENCES pp (k) ON UPDATE SET NULL ON DELETE CASCADE",
    )
    assert out["on_delete"] == "cascade"
    assert out["on_update"] == "set null"
    ddl = execute_dml(cat, "SHOW CREATE TABLE cc")["create"]
    assert "ON DELETE CASCADE ON UPDATE SET NULL" in ddl


def test_fk_on_update_dv_mode_refuses(spark, tmp_path):
    """Deletion vectors publish outside the staged-dir protocol — the
    action legs cannot join them atomically. Real run AND EXPLAIN
    refuse identically; a SET not touching the referenced column
    stays allowed."""
    cat = _upd_lake(spark, tmp_path)
    execute_dml(
        cat,
        "ALTER TABLE parent SET TBLPROPERTIES "
        "('dml.mode' = 'merge-on-read')",
    )
    with pytest.raises(RuntimeError, match="merge-on-read UPDATE"):
        execute_dml(cat, "UPDATE parent SET k = 99 WHERE k = 1")
    with pytest.raises(RuntimeError, match="merge-on-read UPDATE"):
        execute_dml(cat, "EXPLAIN UPDATE parent SET k = 99 WHERE k = 1")
    out = execute_dml(cat, "UPDATE parent SET v = 'z' WHERE k = 1")
    assert out["updated"] == 1


def test_fk_on_update_explain_reports_legs(spark, tmp_path):
    cat = _upd_lake(spark, tmp_path)
    plan = execute_dml(cat, "EXPLAIN UPDATE parent SET k = 9 WHERE k = 1")
    assert plan["fk_update_actions"] == [
        {"child": "child", "action": "cascade", "column": "k"}
    ]
    # a SET not touching the referenced column reports no legs
    plan = execute_dml(cat, "EXPLAIN UPDATE parent SET v = 'x' WHERE k = 1")
    assert "fk_update_actions" not in plan


def test_fk_on_update_noop_set_fans_nothing(spark, tmp_path):
    """SET that leaves every key value unchanged plans an empty map —
    the child is never rewritten (its version stays put)."""
    cat = _upd_lake(spark, tmp_path)
    before = cat.table_versions("child") if hasattr(
        cat, "table_versions"
    ) else None
    cdirs = cat._data_dirs("child")
    execute_dml(cat, "UPDATE parent SET k = k WHERE k = 1")
    assert cat._data_dirs("child") == cdirs
    assert sorted(
        (r["cid"], r["fk"]) for r in cat.read("child").collect()
    ) == [(10, 1), (11, 1), (12, 2), (13, None)]


def test_fk_on_update_cap(spark, tmp_path, monkeypatch):
    cat = _upd_lake(spark, tmp_path)
    monkeypatch.setattr(
        type(cat), "_CASCADE_KEY_CAP", 1, raising=True
    )
    v = cat._read_manifest(strict=False)["version"]
    with pytest.raises(ValueError, match="ON UPDATE cascade"):
        execute_dml(cat, "UPDATE parent SET k = k + 100 WHERE k <= 2")
    assert cat._read_manifest(strict=False)["version"] == v


def test_fk_on_update_two_fks_same_child_merge(spark, tmp_path):
    """Two action FKs into the same child merge into ONE child
    statement (a DNF branch per FK column) — naively running two legs
    would trip the one-rewrite-per-transaction rule."""
    cat = _cat(spark, tmp_path)
    cat.overwrite(spark.createDataFrame([(1,), (2,)], "k long"), "p")
    cat.add_unique_constraint("p", "pk", ["k"])
    cat.overwrite(
        spark.createDataFrame(
            [(1, 1, 2), (2, 2, None)], "id long, f1 long, f2 long"
        ),
        "c",
    )
    cat.add_fk_constraint("c", "a", ["f1"], "p", ["k"], on_update="cascade")
    cat.add_fk_constraint(
        "c", "b", ["f2"], "p", ["k"], on_update="set null"
    )
    execute_dml(cat, "UPDATE p SET k = k + 10 WHERE k >= 1")
    assert sorted(
        (r["id"], r["f1"], r["f2"]) for r in cat.read("c").collect()
    ) == [(1, 11, None), (2, 12, None)]


def test_fk_on_update_restrict_sibling_blocks(spark, tmp_path):
    """One cascade child + one RESTRICT child: the restrict constraint
    wins — the statement refuses BEFORE any leg stages."""
    cat = _upd_lake(spark, tmp_path)
    cat.overwrite(
        spark.createDataFrame([(30, 1)], "rid long, fk long"), "strict"
    )
    cat.add_fk_constraint("strict", "sf", ["fk"], "parent", ["k"])
    v = cat._read_manifest(strict=False)["version"]
    with pytest.raises(CheckViolation, match="'strict'"):
        execute_dml(cat, "UPDATE parent SET k = 99 WHERE k = 1")
    assert cat._read_manifest(strict=False)["version"] == v
    assert sorted(r["fk"] for r in cat.read("child").collect() if r["fk"]
                  ) == [1, 1, 2]


def test_fk_on_update_inside_begin_block(spark, tmp_path):
    """A key-changing UPDATE inside BEGIN ... COMMIT stages its legs
    into the enclosing block; ROLLBACK discards parent AND children."""
    cat = _upd_lake(spark, tmp_path)
    execute_dml(
        cat,
        "BEGIN; UPDATE parent SET k = 201 WHERE k = 1; "
        "INSERT INTO child VALUES (14, 201); COMMIT",
    )
    assert sorted(
        r["fk"] for r in cat.read("child").collect() if r["fk"] is not None
    ) == [2, 201, 201, 201]
    execute_dml(
        cat, "BEGIN; UPDATE parent SET k = 300 WHERE k = 2; ROLLBACK"
    )
    assert sorted(r["k"] for r in cat.read("parent").collect()) == [
        2, 3, 201,
    ]
    assert sorted(
        r["fk"] for r in cat.read("child").collect() if r["fk"] is not None
    ) == [2, 201, 201, 201]


def test_fk_on_update_leg_moves_bucketed_child_rows(spark, tmp_path):
    """The cascade leg SETs the child's own bucket key — the
    update-on-bucket-key machinery must re-place the moved rows so
    every bucket-pruned path keeps finding them."""
    cat = _cat(spark, tmp_path)
    cat.overwrite(
        spark.createDataFrame([(i,) for i in range(1, 9)], "k long"), "p"
    )
    cat.add_unique_constraint("p", "pk", ["k"])
    execute_dml(
        cat,
        "CREATE TABLE c (id LONG, fk LONG) "
        "CLUSTERED BY (fk) INTO 4 BUCKETS",
    )
    execute_dml(
        cat,
        "INSERT INTO c SELECT id, fk FROM "
        "(VALUES (10, 3), (11, 5)) AS t(id, fk)",
    )
    cat.add_fk_constraint("c", "f", ["fk"], "p", ["k"], on_update="cascade")
    execute_dml(cat, "UPDATE p SET k = k + 100 WHERE k = 3")
    assert sorted(
        (r["id"], r["fk"]) for r in cat.read("c").collect()
    ) == [(10, 103), (11, 5)]
    # a bucket-pruned read finds the moved row at its NEW placement
    assert [
        (r["id"], r["fk"])
        for r in cat.read("c", predicates=[("fk", "=", 103)]).collect()
    ] == [(10, 103)]
    from gcp_datalake_pipeline_spark.storage import kb_col

    want = (
        spark.createDataFrame([(103,)], "fk long")
        .select(kb_col(["fk"], 4).alias("kb"))
        .first()["kb"]
    )
    got = {
        r["_kb"]
        for r in cat.read("c").where(F.col("fk") == 103).collect()
    }
    assert got == {want}


def test_fk_on_update_leg_on_merge_on_read_child(spark, tmp_path):
    """A dv-mode CHILD takes the leg copy-on-write (the PARENT's mode
    is what the atomicity refusal guards); existing deletion vectors
    on the child survive the leg rewrite."""
    cat = _cat(spark, tmp_path)
    cat.overwrite(spark.createDataFrame([(1,), (2,)], "k long"), "p")
    cat.add_unique_constraint("p", "pk", ["k"])
    cat.overwrite(
        spark.createDataFrame(
            [(10, 1), (11, 1), (12, 2)], "id long, fk long"
        ),
        "c",
    )
    execute_dml(
        cat, "ALTER TABLE c SET TBLPROPERTIES ('dml.mode' = 'merge-on-read')"
    )
    execute_dml(cat, "DELETE FROM c WHERE id = 11")  # leaves a DV
    cat.add_fk_constraint("c", "f", ["fk"], "p", ["k"], on_update="cascade")
    execute_dml(cat, "UPDATE p SET k = 7 WHERE k = 1")
    assert sorted(
        (r["id"], r["fk"]) for r in cat.read("c").collect()
    ) == [(10, 7), (12, 2)]
