"""Z-order clustering: multi-column file skipping through compact(),
value invariance, type guards, and time travel across the rewrite."""

import pytest
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog
from gcp_datalake_pipeline_spark.zorder import zvalue_column


def _two_col_lake(spark, root, rows=20000):
    """Four orderkey-striped appends of two mutually-independent uniform
    columns — every file starts min/max-wide on both a and b."""
    cat = TransactionalCatalog(spark=spark, root=root)
    df = spark.range(rows).select(
        F.col("id"),
        (F.col("id") % 1000).alias("a"),
        ((F.col("id") * 7919) % 1000).alias("b"),
    )
    for i in range(4):
        cat.append(df.where(F.col("id") % 4 == i).coalesce(1), "t")
    return cat, df


def test_zorder_prunes_on_every_listed_column(spark, tmp_path):
    """After compact(zorder_by=[a, b]) a selective predicate on a ALONE
    and on b ALONE each skips files — the property single-column
    clustering cannot deliver — and the combined predicate skips more.
    Values are identical to the pre-clustered table."""
    cat, df = _two_col_lake(spark, str(tmp_path / "lake"))
    pre = sorted(tuple(r) for r in cat.read("t").collect())
    k0, t0 = cat.pruned_files("t", [("a", "<=", 50)])
    assert len(k0) == t0  # striped appends: nothing skippable yet

    assert cat.compact("t", target_file_bytes=8_000, zorder_by=["a", "b"])
    ka, ta = cat.pruned_files("t", [("a", "<=", 50)])
    kb, tb = cat.pruned_files("t", [("b", "<=", 50)])
    kab, _ = cat.pruned_files("t", [("a", "<=", 50), ("b", "<=", 50)])
    assert ta == tb and ta >= 8  # the rewrite actually split files
    assert len(ka) < ta and len(kb) < tb, (len(ka), len(kb), ta)
    assert len(kab) <= min(len(ka), len(kb))

    post = sorted(tuple(r) for r in cat.read("t").collect())
    assert post == pre
    got = sorted(
        tuple(r)
        for r in cat.read(
            "t", predicates=[("a", "<=", 50), ("b", "<=", 50)]
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in df.where((F.col("a") <= 50) & (F.col("b") <= 50)).collect()
    )
    assert got == want and got


def test_zorder_rewrite_is_time_travelable(spark, tmp_path):
    """The clustered rewrite publishes as a new snapshot: the
    pre-cluster version stays readable via read_at."""
    cat, _df = _two_col_lake(spark, str(tmp_path / "lake"), rows=2000)
    v_before = cat.versions()[-1]["version"]
    n_before = cat.read("t").count()
    cat.compact("t", target_file_bytes=4_000, zorder_by=["a", "b"])
    assert cat.read("t").count() == n_before
    assert cat.read_at("t", v_before).count() == n_before


def test_zorder_type_guards(spark, tmp_path):
    """Non-orderable types (arrays, binary) are rejected; cluster_by
    and zorder_by are mutually exclusive; empty column list is
    rejected."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    df = spark.range(100).select(
        F.col("id"), F.array(F.col("id")).alias("a")
    )
    cat.append(df, "t")
    with pytest.raises(ValueError, match="unsupported type"):
        cat.compact("t", zorder_by=["a"])
    with pytest.raises(ValueError, match="mutually exclusive"):
        cat.compact("t", cluster_by=["id"], zorder_by=["id"])
    with pytest.raises(ValueError, match="at least one column"):
        zvalue_column(df, [])


def test_zorder_string_column_prunes(spark, tmp_path):
    """String columns z-order via sampled lexicographic boundaries:
    equality AND range predicates on the string dimension skip files,
    the numeric co-dimension still prunes, values are unchanged."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    df = spark.range(20000).select(
        F.col("id"),
        F.concat(
            F.lit("dom-"),
            F.lpad(((F.col("id") * 7919) % 500).cast("string"), 4, "0"),
            F.lit(".com"),
        ).alias("domain"),
        (F.col("id") % 1000).alias("size"),
    )
    for i in range(4):
        cat.append(df.where(F.col("id") % 4 == i).coalesce(1), "t")
    pre = sorted(tuple(r) for r in cat.read("t").collect())
    assert cat.compact(
        "t", target_file_bytes=10_000, zorder_by=["domain", "size"]
    )
    kd, td = cat.pruned_files("t", [("domain", "=", "dom-0042.com")])
    kr, _ = cat.pruned_files("t", [("domain", "<=", "dom-0100.com")])
    ks, ts = cat.pruned_files("t", [("size", "<=", 50)])
    assert td >= 8
    assert len(kd) < td and len(kr) < td and len(ks) < ts
    assert sorted(tuple(r) for r in cat.read("t").collect()) == pre
    got = sorted(
        tuple(r)
        for r in cat.read(
            "t", predicates=[("domain", "=", "dom-0042.com")]
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in df.where(F.col("domain") == "dom-0042.com").collect()
    )
    assert got == want and got


def test_zvalue_handles_nulls_and_timestamps(spark, tmp_path):
    """NULLs land in bucket 0 (sort first, never error); timestamp and
    date columns bucket by epoch ordering. The z-value is
    deterministic for a given frame."""
    df = spark.sql(
        """
        SELECT * FROM VALUES
          (CAST(NULL AS DOUBLE), TIMESTAMP '1995-06-01 00:00:00'),
          (1.0,                  TIMESTAMP '1992-01-01 00:00:00'),
          (100.0,                TIMESTAMP '1998-12-31 00:00:00'),
          (50.0,                 CAST(NULL AS TIMESTAMP))
        AS t(x, ts)
        """
    )
    rows = df.select(
        "x", zvalue_column(df, ["x", "ts"], bits=4).alias("z")
    ).collect()
    by_x = {r["x"]: r["z"] for r in rows}
    assert all(r["z"] is not None for r in rows)
    # the all-min row (NULL x, min-adjacent ts) sorts below the max row
    assert by_x[1.0] < by_x[100.0]


def test_zorder_single_column_matches_range_cluster_semantics(
    spark, tmp_path
):
    """zorder_by on ONE column prunes like cluster_by: sanity that the
    bit interleave degenerates to a plain range layout."""
    cat, _df = _two_col_lake(spark, str(tmp_path / "lake"), rows=8000)
    cat.compact("t", target_file_bytes=6_000, zorder_by=["a"])
    kept, total = cat.pruned_files("t", [("a", "<=", 50)])
    assert total >= 4 and len(kept) <= -(-total // 2), (len(kept), total)


def test_zorder_bit_budget_guard(spark, tmp_path):
    """Review fix: bits * ncols beyond the 63-bit signed budget is
    refused (overflow would corrupt the clustering silently)."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    df = spark.range(10).select(
        F.col("id").alias("a"), F.col("id").alias("b"),
        F.col("id").alias("c"), F.col("id").alias("d"),
    )
    cat.append(df, "t")
    with pytest.raises(ValueError, match="63"):
        cat.compact("t", zorder_by=["a", "b", "c", "d"], zorder_bits=16)
