"""Data-quality operators: profiling statistics and constraint
violations on data with known defects."""

from gcp_datalake_pipeline_spark.operators.quality import (
    Check,
    profile_table,
    validate_constraints,
)


def test_profile_table_stats(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, 7.5), (3, "a", None), (4, "b", 7.5)],
        "id long, cat string, x double",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["id"]["n_rows"] == 4
    assert prof["id"]["n_nulls"] == 0 and prof["id"]["n_distinct"] == 4
    assert (prof["id"]["min_value"], prof["id"]["max_value"]) == ("1", "4")
    assert prof["cat"]["n_nulls"] == 1 and prof["cat"]["n_distinct"] == 2
    assert prof["x"]["n_nulls"] == 1 and prof["x"]["n_distinct"] == 2
    assert prof["x"]["max_value"] == "7.5"


def test_validate_constraints_counts_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 10, 5.0),
            (1, 11, -2.0),   # dup id, negative x
            (2, None, 3.0),  # null fk
            (3, 99, 150.0),  # fk miss, x over hi
        ],
        "id long, ref_id long, x double",
    )
    ref = spark.createDataFrame([(10,), (11,)], "k long")
    out = {
        r["check"]: r["n_violations"]
        for r in validate_constraints(
            df,
            [
                Check("ref_not_null", "not_null", col="ref_id"),
                Check("id_unique", "unique", cols=("id",)),
                Check("x_range", "in_range", col="x", lo=0.0, hi=100.0),
                Check("ref_fk", "fk", col="ref_id", ref=ref, ref_col="k"),
            ],
        ).collect()
    }
    assert out == {
        "ref_not_null": 1,
        "id_unique": 2,   # both rows of the duplicated key count
        "x_range": 2,     # one below lo, one above hi
        "ref_fk": 1,      # 99 unmatched (NULL fk not double-counted)
    }


def test_validate_constraints_all_green_and_unknown_kind(spark):
    import pytest

    df = spark.createDataFrame([(1, 5.0)], "id long, x double")
    out = validate_constraints(
        df,
        [
            Check("id_unique", "unique", cols=("id",)),
            Check("x_range", "in_range", col="x", lo=0.0),
        ],
    ).collect()
    assert all(r["n_violations"] == 0 for r in out)
    with pytest.raises(ValueError, match="unknown check kind"):
        validate_constraints(df, [Check("zz", "regex", col="x")])


def test_profile_table_approx_mode(spark):
    """approx=True swaps exact distincts for HyperLogLog: same report
    schema, every non-distinct statistic identical, distincts within the
    HLL tolerance (exact on tiny inputs), and the plan carries NO Expand
    node (the wide-table scale mode)."""
    df = spark.createDataFrame(
        [(i, f"c{i % 7}", float(i % 13)) for i in range(1000)],
        "id long, cat string, x double",
    )
    exact = {r["column"]: r for r in profile_table(df).collect()}
    approx = {r["column"]: r for r in profile_table(df, approx=True).collect()}
    for c in ("id", "cat", "x"):
        assert approx[c]["n_rows"] == exact[c]["n_rows"]
        assert approx[c]["n_nulls"] == exact[c]["n_nulls"]
        assert approx[c]["min_value"] == exact[c]["min_value"]
        assert approx[c]["max_value"] == exact[c]["max_value"]
        assert (
            abs(approx[c]["n_distinct"] - exact[c]["n_distinct"])
            <= 0.1 * exact[c]["n_distinct"] + 1
        )
    from pyspark.sql import functions as F

    approx_agg = df.agg(F.approx_count_distinct("id"), F.approx_count_distinct("cat"))
    assert "Expand" not in approx_agg._jdf.queryExecution().executedPlan().toString()
    exact_agg = df.agg(F.count_distinct("id"), F.count_distinct("cat"))
    assert "Expand" in exact_agg._jdf.queryExecution().executedPlan().toString()


def test_fk_broadcast_flag_parity(spark):
    """broadcast=None (AQE-sized) and broadcast=True (forced hint) give
    identical violation counts — the flag is a plan choice, never a
    semantic one."""
    df = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None)], "id long, ref_id long"
    )
    ref = spark.createDataFrame([(10,), (11,)], "k long")
    for flag in (None, True):
        out = {
            r["check"]: r["n_violations"]
            for r in validate_constraints(
                df,
                [
                    Check(
                        "fk", "fk", col="ref_id", ref=ref, ref_col="k",
                        broadcast=flag,
                    )
                ],
            ).collect()
        }
        assert out == {"fk": 1}, flag


def test_constraint_suite_is_one_spark_action(spark):
    """The whole check suite (row-local + unique + fk) must collect as
    ONE action: a large suite may not cost one job per check."""
    df = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, -2.0)], "id long, ref_id long, x double"
    )
    ref = spark.createDataFrame([(10,), (11,)], "k long")
    checks = [
        Check("nn", "not_null", col="ref_id"),
        Check("uq", "unique", cols=("id",)),
        Check("rg", "in_range", col="x", lo=0.0),
        Check("fk", "fk", col="ref_id", ref=ref, ref_col="k"),
    ]
    calls = {"n": 0}
    orig = type(df).collect

    def counting_collect(self):
        calls["n"] += 1
        return orig(self)

    type(df).collect = counting_collect
    try:
        out = {
            r["check"]: r["n_violations"]
            for r in validate_constraints(df, checks).collect()
        }
    finally:
        type(df).collect = orig
    assert out == {"nn": 0, "uq": 2, "rg": 1, "fk": 0}
    # one collect inside validate_constraints + the one in this test
    assert calls["n"] == 2


def test_in_set_and_matches_checks(spark):
    df = spark.createDataFrame(
        [("A", "12.345-6"), ("B", "nope"), ("Z", None), (None, "1-2")],
        "status string, rut string",
    )
    out = {
        r["check"]: r["n_violations"]
        for r in validate_constraints(
            df,
            [
                Check("status_set", "in_set", col="status", values=("A", "B")),
                Check(
                    "rut_format", "matches", col="rut",
                    pattern=r"[0-9.]+-[0-9kK]",
                ),
            ],
        ).collect()
    }
    # 'Z' violates the set (NULL ignored); 'nope' violates the regex
    # (NULL ignored; partial matches don't pass the anchored pattern)
    assert out == {"status_set": 1, "rut_format": 1}


def test_validate_constraints_empty_suite(spark):
    """An empty checks list is a valid (empty) report, not an error."""
    df = spark.createDataFrame([(1,)], "id long")
    assert validate_constraints(df, []).collect() == []


def test_duplicate_check_names_rejected(spark):
    """Two checks sharing a name would collapse to one report value for
    both rows (the report is keyed by name) — a hard error up front."""
    import pytest

    df = spark.createDataFrame([(1, "a")], "id long, s string")
    with pytest.raises(ValueError, match="duplicate check names"):
        validate_constraints(
            df,
            [
                Check("x", "not_null", col="id"),
                Check("x", "unique", cols=("id",)),
            ],
        )


def test_corr_matrix_exact_known_values(spark):
    """corr = +1 for a linear pair, -1 for an anti-linear pair, and rows
    with a NULL in any profiled column drop listwise."""
    from gcp_datalake_pipeline_spark.operators.quality import corr_matrix

    df = spark.createDataFrame(
        [
            (1.0, 2.0, -1.0),
            (2.0, 4.0, -2.0),
            (3.0, 6.0, -3.0),
            (4.0, 8.0, -4.0),
            (None, 9.0, -5.0),  # excluded listwise
        ],
        "a double, b double, c double",
    )
    out = {
        (r["col_x"], r["col_y"]): r for r in corr_matrix(df, ["a", "b", "c"]).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out[("a", "b")]["corr"] == 1.0
    assert out[("a", "c")]["corr"] == -1.0
    assert out[("b", "c")]["corr"] == -1.0


def test_corr_matrix_overflow_refuses_with_the_bound(spark):
    """DECIMAL(38,12) product sums overflow at Σ|x·y| ≥ 1e26; Spark
    nulls the overflowed SUM (non-ANSI), which corr_matrix must turn
    into a loud refusal naming the bound and the pre-scale exit —
    never a silent NULL correlation (VERDICT r11 watch-item)."""
    import pytest

    from gcp_datalake_pipeline_spark.operators.quality import corr_matrix

    big = spark.range(200).selectExpr(
        "CAST(1e12 AS DOUBLE) AS a", "CAST(1e12 AS DOUBLE) AS b"
    )
    with pytest.raises(ValueError, match="1e26"):
        corr_matrix(big, ["a", "b"])
    # pre-scaling is the documented exit and succeeds
    scaled = big.selectExpr("a / 1e6 AS a", "b / 1e6 AS b")
    out = corr_matrix(scaled, ["a", "b"]).collect()
    assert len(out) == 1 and out[0]["n_rows"] == 200


def test_exact_quantiles_positional_definition(spark):
    """value at 1-based position max(1, ceil(q*n)) over sorted non-null
    values — pinned on a known sequence, plus NULL exclusion, q bounds
    validation, and the empty-input shape."""
    import pytest

    from gcp_datalake_pipeline_spark.operators.quality import exact_quantiles

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 11)] + [(None,)], "x double"
    )
    got = {
        r["q"]: r["value"]
        for r in exact_quantiles(df, "x", [0.0, 0.25, 0.5, 0.75, 1.0]).collect()
    }
    # n=10: ceil(0*10)->1(->max 1), ceil(2.5)=3, ceil(5)=5, ceil(7.5)=8, 10
    assert got == {0.0: 1.0, 0.25: 3.0, 0.5: 5.0, 0.75: 8.0, 1.0: 10.0}
    with pytest.raises(ValueError, match=r"outside \[0, 1\]"):
        exact_quantiles(df, "x", [1.5])
    empty = spark.createDataFrame([], "x double")
    assert exact_quantiles(empty, "x", [0.5]).collect() == []


def test_exact_quantiles_match_duckdb_on_heavy_ties(spark):
    """Duplicate-heavy input (the histogram path's interesting case):
    selection over counts must agree with the oracle's row_number
    definition value-for-value."""
    import duckdb

    from gcp_datalake_pipeline_spark.operators.quality import (
        exact_quantiles,
        exact_quantiles_oracle_sql,
    )

    rows = [(float(i % 7),) for i in range(500)] + [(99.0,)]
    df = spark.createDataFrame(rows, "x double")
    qs = [0.1, 0.5, 0.9, 0.999]
    got = [
        (r["q"], r["value"]) for r in exact_quantiles(df, "x", qs).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    want = con.execute(
        exact_quantiles_oracle_sql("t", "x", qs)
    ).fetchall()
    assert got == [(float(q), float(v)) for q, v in want]
