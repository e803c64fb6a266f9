"""CREATE / TRUNCATE / DROP — the lifecycle bookends of the DML front
door, all manifest-pointer commits.

Contract under test:

- CREATE publishes a typed empty table (zero data dirs; reads, counts,
  appends, and the INSERT facade all work against it);
- TRUNCATE empties the pointer list, keeps schema/checks/layout, touches
  no data file, and stays time-travelable until vacuum;
- DROP removes the manifest entries (and the un-versioned bucket
  sidecar) while retained snapshots keep the data restorable;
- the SQL facade routes all three with IF [NOT] EXISTS variants, and
  CREATE VIEW still falls through to spark.sql.
"""

import os

import pytest
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.dml_sql import execute_dml
from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog


@pytest.fixture()
def tcat(spark, tmp_path):
    return TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))


def test_create_table_publishes_typed_empty_relation(spark, tcat):
    tcat.create_table("t", "id BIGINT, name STRING, v DOUBLE")
    assert tcat.exists("t")
    df = tcat.read("t")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["id", "name", "v"]
    assert tcat.count_rows("t") == 0
    assert tcat.min_max("t", "v") == (None, None)
    # a later append types against the declared schema
    tcat.append(
        spark.createDataFrame([(1, "a", 1.5)], "id long, name string, v double"),
        "t",
    )
    assert tcat.count_rows("t") == 1
    with pytest.raises(FileExistsError):
        tcat.create_table("t", "id BIGINT")


def test_create_then_insert_facade(spark, tcat):
    out = execute_dml(
        tcat, "CREATE TABLE t (id BIGINT, name STRING, v DOUBLE)"
    )
    assert out == {"table": "t", "created": True}
    out = execute_dml(
        tcat, "INSERT INTO t VALUES (1, 'a', 1.5), (2, 'b', NULL)"
    )
    assert out == {"table": "t", "inserted": 2}
    assert tcat.count_rows("t") == 2
    # IF NOT EXISTS is a reported no-op
    out = execute_dml(tcat, "CREATE TABLE IF NOT EXISTS t (id BIGINT)")
    assert out == {"table": "t", "created": False}
    assert len(tcat.read("t").columns) == 3  # untouched
    with pytest.raises(ValueError, match="bad CREATE TABLE"):
        execute_dml(tcat, "CREATE TABLE u (id WIBBLE)")
    # CREATE VIEW is NOT table DDL: falls through to spark.sql (None)
    assert execute_dml(tcat, "CREATE VIEW v AS SELECT 1") is None


def test_truncate_keeps_schema_checks_layout(spark, tcat):
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 61).alias("x"), (F.col("id") % 7).alias("w")
    )
    tcat.add_check("t", "x_nonneg", "x >= 0")
    tcat.append(df.coalesce(2), "t")
    tcat.compact("t", target_file_bytes=8 * 1024, zorder_by=["x"])
    pre_files = {
        os.path.join(d, f)
        for d in tcat._data_dirs("t")
        for f in tcat._dir_parquet_files(d)
    }
    n = tcat.truncate("t")
    assert n == 2000
    assert tcat.exists("t") and tcat.count_rows("t") == 0
    assert tcat.read("t").columns == ["id", "x", "w"]
    assert tcat.checks("t") == {"x_nonneg": "x >= 0"}
    assert tcat.layout("t") == {"kind": "zorder", "cols": ["x"], "bits": 8}
    # no data file was touched; the old snapshot still reads
    assert all(os.path.exists(p) for p in pre_files)
    v = tcat.versions()[-1]["version"]
    assert tcat.read_at("t", v - 1).count() == 2000
    # checks still enforce on the refilled table
    from gcp_datalake_pipeline_spark.transactions import CheckViolation

    with pytest.raises(CheckViolation):
        tcat.append(
            spark.createDataFrame([(1, -5, 0)], "id long, x long, w long"),
            "t",
        )
    tcat.append(df.coalesce(1), "t")
    assert tcat.count_rows("t") == 2000


def test_drop_table_and_restore_resurrects(spark, tcat):
    df = spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("k"))
    tcat.append(df, "t")
    tcat.add_check("t", "k_ok", "k >= 0")
    v_before = tcat.versions()[-1]["version"]
    tcat.drop_table("t")
    assert not tcat.exists("t")
    assert tcat.checks("t") == {} and tcat.layout("t") is None
    with pytest.raises(FileNotFoundError):
        tcat.read("t")
    with pytest.raises(FileNotFoundError):
        tcat.drop_table("t")
    # retained snapshots keep the data: both restore paths resurrect
    assert tcat.read_at("t", v_before).count() == 100
    tcat.restore_table("t", v_before)
    assert tcat.count_rows("t") == 100
    # whole-catalog restore of the dropped state drops it again (and
    # brings the checks map back with it)
    tcat.restore(v_before)
    assert tcat.exists("t") and tcat.checks("t") == {"k_ok": "k >= 0"}


def test_drop_removes_bucket_sidecar(spark, tcat):
    df = spark.range(50).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("s")
    )
    tcat.merge_upsert_bucketed(df, "b", key_cols=["doc_id"], num_buckets=4)
    assert os.path.exists(tcat._bucket_meta_path("b"))
    tcat.drop_table("b")
    assert not os.path.exists(tcat._bucket_meta_path("b"))


def test_truncate_drop_facade_routing(spark, tcat):
    tcat.append(spark.createDataFrame([(1,), (2,)], "id long"), "t")
    out = execute_dml(tcat, "TRUNCATE TABLE t")
    assert out == {"table": "t", "truncated": 2}
    out = execute_dml(tcat, "DROP TABLE t")
    assert out == {"table": "t", "dropped": True}
    out = execute_dml(tcat, "DROP TABLE IF EXISTS t")
    assert out == {"table": "t", "dropped": False}
    with pytest.raises(FileNotFoundError):
        execute_dml(tcat, "DROP TABLE t")
    with pytest.raises(ValueError, match="unsupported DML shape"):
        execute_dml(tcat, "TRUNCATE t")  # strict: TABLE keyword required
    # DROP VIEW is not table DDL -> spark.sql's problem (None)
    assert execute_dml(tcat, "DROP VIEW IF EXISTS someview") is None


def test_vacuum_reclaims_dropped_and_truncated_data(spark, tcat):
    tcat.append(spark.createDataFrame([(1,)], "id long"), "a")
    tcat.append(spark.createDataFrame([(2,)], "id long"), "b")
    tcat.truncate("a")
    tcat.drop_table("b")
    removed = tcat.vacuum(retain_versions=1, min_age_seconds=0.0)
    data_dirs = [r for r in removed if r.startswith("_loads")]
    assert len(data_dirs) == 2  # both tables' only dirs reclaimed
    assert tcat.exists("a") and not tcat.exists("b")
    assert tcat.read("a").count() == 0


def test_alter_table_add_column_is_metadata_only(spark, tcat):
    """ADD COLUMN is a pure schema commit: existing files untouched,
    reads project NULL, later appends fill it, and the façade routes
    the statement."""
    tcat.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"), "t")
    pre_files = {
        os.path.join(d, f): os.stat(os.path.join(d, f)).st_mtime_ns
        for d in tcat._data_dirs("t")
        for f in tcat._dir_parquet_files(d)
    }
    out = execute_dml(tcat, "ALTER TABLE t ADD COLUMN score DOUBLE")
    assert out == {"table": "t", "added_column": "score"}
    # zero data I/O: same files, same mtimes
    post_files = {
        os.path.join(d, f): os.stat(os.path.join(d, f)).st_mtime_ns
        for d in tcat._data_dirs("t")
        for f in tcat._dir_parquet_files(d)
    }
    assert post_files == pre_files
    df = tcat.read("t")
    assert df.columns == ["id", "s", "score"]
    assert df.filter(F.col("score").isNull()).count() == 2
    # later appends carry the column
    tcat.append(
        spark.createDataFrame([(3, "c", 9.5)], "id long, s string, score double"),
        "t",
    )
    assert tcat.read("t").filter(F.col("score") == 9.5).count() == 1
    # refusals
    with pytest.raises(ValueError, match="already exists"):
        execute_dml(tcat, "ALTER TABLE t ADD COLUMN score DOUBLE")
    with pytest.raises(ValueError, match="bad ADD COLUMN type"):
        execute_dml(tcat, "ALTER TABLE t ADD COLUMN x WIBBLE")
    with pytest.raises(ValueError, match="unsupported DML shape"):
        execute_dml(tcat, "ALTER TABLE t SET LOCATION '/elsewhere'")
    # RENAME TO graduated from refusal to support in r11
    assert execute_dml(tcat, "ALTER TABLE t RENAME TO u") == {
        "table": "t", "renamed_to": "u",
    }
    assert tcat.read("u").filter(F.col("score") == 9.5).count() == 1


def test_alter_table_constraint_lifecycle(spark, tcat):
    from gcp_datalake_pipeline_spark.transactions import CheckViolation

    tcat.append(spark.createDataFrame([(1, 5.0)], "id long, v double"), "t")
    out = execute_dml(
        tcat, "ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v > 0)"
    )
    assert out == {"table": "t", "added_check": "v_pos"}
    assert tcat.checks("t") == {"v_pos": "v > 0"}
    with pytest.raises(CheckViolation):
        tcat.append(spark.createDataFrame([(2, -1.0)], "id long, v double"), "t")
    out = execute_dml(tcat, "ALTER TABLE t DROP CONSTRAINT v_pos")
    assert out == {"table": "t", "dropped_check": "v_pos"}
    assert tcat.checks("t") == {}


def test_optimize_and_vacuum_facade(spark, tcat):
    """OPTIMIZE [ZORDER BY] and VACUUM as SQL statements — the Delta
    maintenance verbs routed to compact()/vacuum()."""
    df = spark.range(3000).select(
        F.col("id"), (F.col("id") % 61).alias("x"), ((F.col("id") * 7) % 53).alias("y")
    )
    for i in range(3):
        tcat.append(df.where(F.col("id") % 3 == i).coalesce(1), "t")
    assert len(tcat._data_dirs("t")) == 3
    out = execute_dml(tcat, "OPTIMIZE t ZORDER BY (x, y)")
    assert out == {"table": "t", "optimized": True}
    assert len(tcat._data_dirs("t")) == 1
    assert tcat.layout("t") == {"kind": "zorder", "cols": ["x", "y"], "bits": 8}
    # already compact + recorded layout: reported no-op
    assert execute_dml(tcat, "OPTIMIZE t") == {"table": "t", "optimized": False}
    # cluster-by variant records its own spec
    out = execute_dml(tcat, "OPTIMIZE t CLUSTER BY (x)")
    assert out == {"table": "t", "optimized": True}
    assert tcat.layout("t") == {"kind": "cluster", "cols": ["x"]}
    # vacuum: the superseded pre-optimize dirs reclaim past retention
    out = execute_dml(tcat, "VACUUM RETAIN 1 VERSIONS")
    # the default min-age window protects the fresh data dirs; only the
    # beyond-retention version manifests fold
    assert out["vacuumed_dirs"] == 0 and out["vacuumed_versions"] >= 3
    removed = tcat.vacuum(retain_versions=1, min_age_seconds=0.0)
    assert len([r for r in removed if r.startswith("_loads")]) >= 3
    assert tcat.read("t").count() == 3000
    with pytest.raises(ValueError, match="unsupported DML shape"):
        execute_dml(tcat, "OPTIMIZE")  # no table


# -- ALTER COLUMN TYPE: metadata-only widening (r12) --------------------------


def _widen_fixture(spark, tcat):
    from pyspark.sql import functions as F

    df = spark.range(10).select(
        F.col("id").cast("int").alias("a"),
        F.col("id").cast("float").alias("f"),
        (F.col("id") % 3).cast("smallint").alias("s"),
        F.col("id").cast("decimal(10,2)").alias("d"),
    )
    tcat.overwrite(df, "t")
    return df


def test_widen_column_is_metadata_only_and_values_survive(spark, tcat):
    import os

    from pyspark.sql import functions as F

    _widen_fixture(spark, tcat)
    pre = {
        os.stat(os.path.join(d, f)).st_ino
        for d in tcat._data_dirs("t")
        for f in tcat._dir_parquet_files(d)
    }
    tcat.widen_column("t", "a", "bigint")
    tcat.widen_column("t", "f", "double")
    tcat.widen_column("t", "s", "int")
    tcat.widen_column("t", "d", "decimal(16,2)")
    post = {
        os.stat(os.path.join(d, f)).st_ino
        for d in tcat._data_dirs("t")
        for f in tcat._dir_parquet_files(d)
    }
    assert post == pre, "widening moved data — must be metadata-only"
    got = tcat.read("t")
    types = dict(got.dtypes)
    assert types == {
        "a": "bigint", "f": "double", "s": "int", "d": "decimal(16,2)",
    }
    assert got.agg(F.sum("a")).first()[0] == 45
    assert got.where(F.col("d") == 4.00).count() == 1
    # appends after the widening land under the wide schema
    tcat.append(
        spark.createDataFrame(
            [(2**40, 1.5, 7, None)],
            "a bigint, f double, s int, d decimal(16,2)",
        ),
        "t",
    )
    assert tcat.read("t").agg(F.max("a")).first()[0] == 2**40
    # old snapshots keep their old types (time travel unaffected)
    assert dict(tcat.read_at("t", 1).dtypes)["a"] == "int"


def test_widen_column_refusals(spark, tcat):
    import pytest
    from pyspark.sql import functions as F

    _widen_fixture(spark, tcat)
    for bad in [("a", "int"), ("a", "smallint"), ("f", "float"),
                ("a", "string"), ("d", "decimal(10,1)"),
                ("a", "decimal(9,0)")]:
        with pytest.raises(ValueError, match="not a widening"):
            tcat.widen_column("t", *bad)
    with pytest.raises(ValueError, match="no column"):
        tcat.widen_column("t", "ghost", "bigint")
    # bucket keys refuse: xxhash64 placement is type-dependent
    tcat.overwrite_bucketed(
        spark.range(8).select(F.col("id").cast("int").alias("k")),
        "bk", 4, ["k"],
    )
    with pytest.raises(ValueError, match="bucket key"):
        tcat.widen_column("bk", "k", "bigint")
    # bloom-indexed columns refuse: bitmaps hold old-type hashes
    tcat.overwrite(
        spark.range(8).select(F.col("id").cast("int").alias("x")), "bl"
    )
    tcat.set_bloom_index("bl", ["x"])
    with pytest.raises(ValueError, match="bloom"):
        tcat.widen_column("bl", "x", "bigint")


def test_widen_column_sql_front_door_and_rename_interop(spark, tcat):
    from pyspark.sql import functions as F

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml

    _widen_fixture(spark, tcat)
    out = execute_dml(tcat, "ALTER TABLE t ALTER COLUMN a TYPE BIGINT")
    assert out == {"table": "t", "widened_column": "a", "type": "BIGINT"}
    # widening follows a RENAME COLUMN through the mapping (the stored
    # schema keys physical names)
    execute_dml(tcat, "ALTER TABLE t RENAME COLUMN f TO f2")
    out = execute_dml(
        tcat, "ALTER TABLE t ALTER COLUMN f2 SET DATA TYPE DOUBLE"
    )
    assert out["widened_column"] == "f2"
    types = dict(tcat.read("t").dtypes)
    assert types["a"] == "bigint" and types["f2"] == "double"
    assert tcat.read("t").agg(F.sum("f2")).first()[0] == 45.0


# -- GENERATED ALWAYS AS IDENTITY (r12) ---------------------------------------


def test_identity_column_lifecycle(spark, tcat):
    import pytest
    from pyspark.sql import functions as F

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml

    out = execute_dml(
        tcat,
        "CREATE TABLE ev (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        "name STRING, amt DOUBLE)",
    )
    assert out == {"table": "ev", "created": True, "identity": "id"}
    assert tcat.identity_spec("ev") == {"col": "id", "next": 1}
    out = execute_dml(
        tcat, "INSERT INTO ev (name, amt) VALUES ('a', 1.0), ('b', 2.0)"
    )
    assert out["inserted"] == 2 and out["identity_range"] == [1, 2]
    # default target list omits the identity column
    out = execute_dml(tcat, "INSERT INTO ev VALUES ('c', 3.0)")
    assert out["identity_range"] == [3, 3]
    got = sorted(map(tuple, tcat.read("ev").collect()))
    assert got == [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]
    # GENERATED ALWAYS: supplying the column refuses
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        execute_dml(tcat, "INSERT INTO ev (id, name, amt) VALUES (9, 'x', 0.0)")
    # ids never reuse: delete everything, insert again
    execute_dml(tcat, "DELETE FROM ev WHERE amt < 10.0")
    out = execute_dml(tcat, "INSERT INTO ev (name, amt) VALUES ('d', 4.0)")
    assert out["identity_range"] == [4, 4]
    # INSERT OVERWRITE replaces content but the mark only grows
    out = execute_dml(tcat, "INSERT OVERWRITE ev (name, amt) VALUES ('e', 5.0)")
    assert out["identity_range"] == [5, 5]
    assert [tuple(r) for r in tcat.read("ev").collect()] == [(5, "e", 5.0)]
    assert tcat.identity_spec("ev")["next"] == 6
    # direct append without the column refuses nothing today — but the
    # SQL surface is the contract; the spec survives rename and clears
    # on drop
    tcat.rename_table("ev", "ev2")
    assert tcat.identity_spec("ev2") == {"col": "id", "next": 6}
    assert tcat.identity_spec("ev") is None
    out = execute_dml(tcat, "INSERT INTO ev2 (name, amt) VALUES ('f', 6.0)")
    assert out["identity_range"] == [6, 6]
    tcat.drop_table("ev2")
    assert tcat.identity_spec("ev2") is None


def test_identity_concurrent_mint_conflicts(spark, tcat):
    """Two writers reading the same high-water mark: the second commit
    must raise ConcurrentWriteError, never mint overlapping ids."""
    import pytest

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.transactions import (
        ConcurrentWriteError,
        TransactionalCatalog,
    )

    execute_dml(
        tcat,
        "CREATE TABLE ev (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        "name STRING)",
    )
    execute_dml(tcat, "INSERT INTO ev (name) VALUES ('a')")
    # a second handle to the same lake, racing on the same mark
    other = TransactionalCatalog(spark=spark, root=tcat.root)
    df = spark.createDataFrame([("x",)], "name string")
    with tcat.transaction("race-1") as t1:
        t1.append(
            spark.createDataFrame([(2, "b")], "id long, name string"), "ev"
        )
        t1._intents["ev"]["identity"] = {
            "col": "id", "next": 3, "expect_next": 2,
        }
    # t1 advanced the mark to 3; a stale writer expecting 2 must fail
    with pytest.raises(ConcurrentWriteError, match="identity"):
        with other.transaction("race-2") as t2:
            t2.append(
                spark.createDataFrame([(2, "dup")], "id long, name string"),
                "ev",
            )
            t2._intents["ev"]["identity"] = {
                "col": "id", "next": 3, "expect_next": 2,
            }
    assert df.count() == 1  # keep the frame referenced


def test_identity_create_refusals(spark, tcat):
    import pytest

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml

    with pytest.raises(ValueError, match="BIGINT"):
        tcat.create_table(
            "bad", "id INT, name STRING", identity_col="id"
        )
    with pytest.raises(ValueError, match="not in the schema"):
        tcat.create_table(
            "bad", "name STRING", identity_col="ghost"
        )
    # the SQL clause parses only on BIGINT (anything else fails DDL)
    out = execute_dml(
        tcat,
        "CREATE TABLE ok (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        "v DOUBLE)",
    )
    assert out["identity"] == "id"


def test_generated_expression_columns(spark, tcat):
    """GENERATED ALWAYS AS (expr): the engine computes the column on
    every INSERT from the row's other values; supplying it refuses;
    it composes with IDENTITY in one table."""
    import pytest

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml

    out = execute_dml(
        tcat,
        "CREATE TABLE g (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        "amt DOUBLE, tax DOUBLE GENERATED ALWAYS AS (round(amt * 0.19, 2)), "
        "yr INT GENERATED ALWAYS AS (year(ts)), ts TIMESTAMP)",
    )
    assert out["identity"] == "id" and out["generated"] == ["tax", "yr"]
    assert tcat.generated_spec("g") == {
        "tax": "round(amt * 0.19, 2)", "yr": "year(ts)",
    }
    out = execute_dml(
        tcat,
        "INSERT INTO g (amt, ts) VALUES "
        "(100.0, TIMESTAMP '2024-03-01 00:00:00'), "
        "(10.0, TIMESTAMP '2025-07-01 00:00:00')",
    )
    assert out["inserted"] == 2 and out["identity_range"] == [1, 2]
    got = sorted(map(tuple, tcat.read("g").collect()))
    assert [(r[0], r[1], r[2], r[3]) for r in got] == [
        (1, 10.0, 1.9, 2025), (2, 100.0, 19.0, 2024),
    ]
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        execute_dml(
            tcat,
            "INSERT INTO g (amt, tax, ts) VALUES "
            "(1.0, 0.0, TIMESTAMP '2024-01-01 00:00:00')",
        )
    # spec clears on drop; a computed-only table needs no identity
    execute_dml(tcat, "DROP TABLE g")
    assert tcat.generated_spec("g") is None
    execute_dml(
        tcat,
        "CREATE TABLE g2 (a BIGINT, b BIGINT "
        "GENERATED ALWAYS AS (a * 2 + 1))",
    )
    execute_dml(tcat, "INSERT INTO g2 (a) VALUES (5), (7)")
    assert sorted(map(tuple, tcat.read("g2").collect())) == [
        (5, 11), (7, 15),
    ]
    # an unparseable expression refuses at CREATE
    with pytest.raises(Exception):
        tcat.create_table(
            "bad", "a BIGINT, b BIGINT", generated={"b": "a +* 2"}
        )


def test_explain_insert_mirrors_computed_columns(spark, tcat):
    """EXPLAIN INSERT on identity/computed tables applies the same
    default-exclusion and explicit-supply refusal as the real run
    (round-12 self-review #2), and widening the identity column
    refuses."""
    import pytest

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml

    execute_dml(
        tcat,
        "CREATE TABLE x (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        "a BIGINT, b BIGINT GENERATED ALWAYS AS (a + 1))",
    )
    out = execute_dml(tcat, "EXPLAIN INSERT INTO x VALUES (5)")
    assert out["explain"] == "INSERT" and out["rows"] == 1
    assert not out["would_refuse"]
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        execute_dml(tcat, "EXPLAIN INSERT INTO x (id, a) VALUES (1, 5)")
    # the dry run committed nothing and minted nothing
    assert tcat.identity_spec("x")["next"] == 1
    with pytest.raises(ValueError, match="IDENTITY"):
        tcat.widen_column("x", "id", "decimal(38,0)")


# -- ALTER COLUMN TYPE ... REBUILD (r13) ---------------------------------------


def test_widen_rebuild_bucket_key(spark, tcat):
    """REBUILD on a bucket key: ONE commit rewrites the table with the
    column cast and _kb recomputed under the new type — values
    identical, placement consistent (bucket-pruned paths keep finding
    every row), plain widening still refuses."""
    import pytest
    from pyspark.sql import functions as F

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.storage import kb_col

    tcat.overwrite_bucketed(
        spark.range(50).select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") * 2).alias("v"),
        ),
        "bk", 8, ["k"],
    )
    with pytest.raises(ValueError, match="REBUILD"):
        execute_dml(tcat, "ALTER TABLE bk ALTER COLUMN k TYPE BIGINT")
    pre = {(r["k"], r["v"]) for r in tcat.read("bk").collect()}
    v_pre = tcat._read_manifest(strict=False)["version"]
    out = execute_dml(
        tcat, "ALTER TABLE bk ALTER COLUMN k TYPE BIGINT REBUILD"
    )
    assert out["rebuilt"] is True
    # exactly ONE commit — no window with stale placement
    assert tcat._read_manifest(strict=False)["version"] == v_pre + 1
    got = tcat.read("bk")
    assert dict(got.dtypes)["k"] == "bigint"
    assert {(r["k"], r["v"]) for r in got.collect()} == pre
    # placement is consistent under the NEW type: every row's _kb
    # equals the long-hash bucket
    bad = got.where(
        F.col("_kb") != kb_col(["k"], 8)
    ).count()
    assert bad == 0
    # and a bucket-pruned merge (which hashes long values) updates the
    # row it targets — would MISS under stale placement
    tcat.merge_upsert_bucketed(
        spark.createDataFrame([(3, 999)], "k long, v long"),
        "bk", ["k"], 8, audit_cols=False,
    )
    assert tcat.read("bk").where(F.col("k") == 3).first()["v"] == 999
    assert tcat.read("bk").count() == 50


def test_widen_rebuild_bloom_column(spark, tcat):
    """REBUILD on a bloom-indexed column: drop -> metadata widen ->
    re-index under the new type; config survives, point probes stay
    correct."""
    import pytest
    from pyspark.sql import functions as F

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml

    tcat.overwrite(
        spark.range(100).select(
            F.col("id").cast("int").alias("x"),
            (F.col("id") % 7).alias("g"),
        ).repartition(4),
        "bl",
    )
    tcat.set_bloom_index("bl", ["x"], bits_per_row=12)
    with pytest.raises(ValueError, match="REBUILD"):
        execute_dml(tcat, "ALTER TABLE bl ALTER COLUMN x TYPE BIGINT")
    execute_dml(
        tcat, "ALTER TABLE bl ALTER COLUMN x SET DATA TYPE BIGINT REBUILD"
    )
    cfg = tcat.bloom_index("bl")
    assert cfg is not None and "x" in cfg["columns"]
    assert cfg["bits_per_row"] == 12
    assert dict(tcat.read("bl").dtypes)["x"] == "bigint"
    # bloom-accelerated point reads stay exact under the new type
    assert tcat.read("bl", predicates=[("x", "=", 42)]).count() == 1
    assert tcat.read("bl", predicates=[("x", "=", 424242)]).count() == 0


def test_widen_rebuild_consumers_resume_after(spark, tcat):
    """A feed window CROSSING the rebuild refuses (type-change
    contract), and a consumer re-registered at the rebuild commit
    resumes cleanly."""
    import pytest
    from pyspark.sql import functions as F

    tcat.overwrite_bucketed(
        spark.range(10).select(
            F.col("id").cast("int").alias("k"), F.col("id").alias("v")
        ),
        "bk", 4, ["k"],
    )
    v0 = tcat._read_manifest(strict=False)["version"]
    tcat.widen_column("bk", "k", "bigint", rebuild=True)
    v1 = tcat._read_manifest(strict=False)["version"]
    with pytest.raises(Exception):
        tcat.table_changes("bk", v0, v1).collect()
    # a post-rebuild window works
    tcat.merge_upsert_bucketed(
        spark.createDataFrame([(100, 100)], "k long, v long"),
        "bk", ["k"], 4, audit_cols=False,
    )
    v2 = tcat._read_manifest(strict=False)["version"]
    chg = tcat.table_changes("bk", v1, v2)
    assert chg.where(F.col("k") == 100).count() >= 1
