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
