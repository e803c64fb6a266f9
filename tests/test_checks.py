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
