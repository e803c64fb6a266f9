"""Correctness-gate rehearsal: every oracled query must match DuckDB at
sf0.001 (the driver runs the same compare at sf0.01)."""

import pytest

from gcp_datalake_pipeline_spark.plans import QUERIES
from gcp_datalake_pipeline_spark.plans.compare import (
    compare_query,
    duckdb_connection,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", [n for n, q in QUERIES.items() if q.oracle])
def test_query_matches_oracle(spark, con, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_DIR)
    result = compare_query(spark, con, name, df, q.oracle)
    assert result.ok, result.detail


@pytest.mark.parametrize("name", [n for n, q in QUERIES.items() if not q.oracle])
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name].fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_oracle_result_types_are_driver_safe(con):
    """Static audit (VERDICT r11 #1c): no oracle may emit HUGEINT /
    UHUGEINT / DECIMAL output columns. DuckDB types SUM-over-integer as
    HUGEINT, and HUGEINT canonicalizes to float64 through pandas
    (1094879185 → 1094879185.0) — which poisons the driver's value hash
    while rows/schema still match (the r11 textrank_keywords red row).
    Binding via ``con.sql(...).types`` resolves output types without
    executing, so this audits the WHOLE registry statically."""
    banned = ("HUGEINT", "UHUGEINT", "DECIMAL")
    offenders = {}
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue
        types = [str(t) for t in con.sql(q.oracle).types]
        hits = [t for t in types if any(b in t for b in banned)]
        if hits:
            offenders[name] = hits
    assert not offenders, (
        f"oracles emitting driver-hostile types (cast to BIGINT/DOUBLE "
        f"in the final SELECT): {offenders}"
    )


# The four r11 HUGEINT emitters, fixed with explicit BIGINT casts; pin
# them green under the driver-parity pandas canonicalization path too
# (fetchall() yields Python ints and masked the widening).
_PANDAS_CANON_PINS = [
    "textrank_keywords",
    "dq_profile_orders",
    "dq_orders_constraints",
    "etl_orc_roundtrip",
]


@pytest.mark.parametrize("name", _PANDAS_CANON_PINS)
def test_fixed_hugeint_oracles_match_under_pandas_canon(spark, con, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_DIR)
    result = compare_query(spark, con, name, df, q.oracle, pandas_canon=True)
    assert result.ok, result.detail


def test_entry_contract(spark):
    """The driver's smoke check: entry(spark) returns rows with a schema."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("entry_mod", "__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25
